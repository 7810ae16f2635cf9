"""Differential tests: compiled validator vs the oracle (which is itself
fuzz-verified against the real JS reference)."""

import random

import pytest

from yaschva_ray import SchemaError, UNDEFINED, load_json, validate
from yaschva_ray.compiled import compile_validator

from test_oracle_validate import EXAMPLE1

SIMPLE = ["string", "boolean", "number", "integer", "null", "?", "any"]


def rand_schema(rng, depth=0):
    opts = ["simple", "union", "array", "enum", "obj", "map", "number", "string", "meta"]
    if depth > 2:
        opts = ["simple", "enum", "number", "string"]
    kind = rng.choice(opts)
    if kind == "simple":
        return rng.choice(SIMPLE)
    if kind == "union":
        return [rand_schema(rng, depth + 1) for _ in range(rng.randint(1, 3))]
    if kind == "array":
        node = {"$array": rand_schema(rng, depth + 1)}
        if rng.random() < 0.4:
            node["minLength"] = rng.randint(0, 2)
        if rng.random() < 0.4:
            node["maxLength"] = rng.randint(2, 5)
        return node
    if kind == "enum":
        return {"$enum": rng.sample(["a", "b", "c", "dd"], rng.randint(1, 3))}
    if kind == "obj":
        return {f"k{i}": rand_schema(rng, depth + 1) for i in range(rng.randint(0, 3))}
    if kind == "map":
        node = {"$map": rand_schema(rng, depth + 1)}
        if rng.random() < 0.3:
            node["regex"] = "^ab[a-z]"
        return node
    if kind == "number":
        return {"$number": {"min": rng.choice([0, 1, -5]), "max": rng.choice([10, 100.5])}}
    if kind == "string":
        r = rng.random()
        if r < 0.5:
            return {"$string": {"minLength": rng.randint(0, 3), "maxLength": rng.randint(0, 8)}}
        return {"$string": {"regex": rng.choice(["^ab", "hello \\w+", "\\d{2,4}"])}}
    if kind == "meta":
        return {"$type": rand_schema(rng, depth + 1)}


def rand_value(rng, depth=0):
    opts = ["str", "int", "float", "bool", "null", "undef", "list", "dict"]
    if depth > 2:
        opts = ["str", "int", "float", "bool", "null"]
    kind = rng.choice(opts)
    if kind == "str":
        return rng.choice(["", "a", "ab", "abc", "abz", "hello world", "12345", "42"])
    if kind == "int":
        return rng.choice([0, 1, -5, 44, 123, 12332323423445323])
    if kind == "float":
        return rng.choice([0.5, 123.4, -2.5, 100.5, 3.0])
    if kind == "bool":
        return rng.random() < 0.5
    if kind == "null":
        return None
    if kind == "undef":
        return UNDEFINED
    if kind == "list":
        return [rand_value(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    if kind == "dict":
        keys = rng.sample(["k0", "k1", "k2", "abx", "x"], rng.randint(0, 4))
        return {k: rand_value(rng, depth + 1) for k in keys}


def test_compiled_matches_oracle_fuzz():
    rng = random.Random(55)
    n_checked = 0
    for _ in range(1500):
        schema = rand_schema(rng)
        value = rand_value(rng)
        try:
            expected = validate(schema, value)
        except SchemaError as e:
            with pytest.raises(SchemaError):
                compile_validator(schema)(value)
            continue
        got = compile_validator(schema)(value)
        assert got == expected, (schema, value, got, expected)
        n_checked += 1
    assert n_checked > 1000


def test_compiled_known_cases():
    example = load_json(EXAMPLE1)
    fn = compile_validator(example)
    assert fn({})  == validate(example, {})
    cases = [
        ({"$types": {"$t": {"v": "string", "l": ["?", "$t"]}}, "root": "$t"},
         {"root": {"v": "a", "l": {"v": "b"}}}),
        ({"$and": [{"a": "string"}, {"b": "number"}]}, {"a": "x"}),
        ({"$and": [{"a": "string"}, "string"]}, {"a": "x"}),
        ({"myNumber": "number", "\\$esc": "string"}, {"myNumber": 1, "$esc": 2}),
        ({"$map": ["number"], "regex": "^ab[a-z]"}, {"x": 3}),
        ({}, []),  # array-as-object
        ({"a": ["string", "bigFlout"]}, {"a": "fine"}),  # lazy branch error never reached
    ]
    for schema, value in cases:
        assert compile_validator(schema)(value) == validate(schema, value)


def test_compiled_lazy_schema_errors():
    # bad branch IS reached → raises like the interpreter
    fn = compile_validator({"a": ["number", "bigFlout"]})
    assert fn({"a": 5})["result"] == "pass"
    with pytest.raises(SchemaError, match='Unknown validator:"bigFlout"'):
        fn({"a": "not a number"})
    # empty union raises when validated
    fn2 = compile_validator({"myValue": []})
    with pytest.raises(SchemaError):
        fn2({"myValue": 2})


def test_compiled_speed():
    import time

    from yaschva_ray.oracle import validate_internal

    example = load_json(EXAMPLE1)
    doc = {
        "myString": "x", "myOptionalString": "y",
        "myObject": {"myNumberInsideAnObject": 1, "myDetailedNumberInsideAnObject": 7.5},
        "myArrayOfNumbers": [1.0, 2.0, 3.0], "myEnum": "enum1",
        "myKeyValuePairs": {"a": "b"}, "myMultiType": 5, "myNumberRange": 5,
        "myNull": None, "myRegex": "work",
        "myAddress": {"name": "n", "street": "s", "city": "c", "country": "x"},
    }
    fn = compile_validator(example)
    n = 2000
    t0 = time.time()
    for _ in range(n):
        validate_internal(dict(example), doc, {})
    t_oracle = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        fn(doc)
    t_compiled = time.time() - t0
    assert fn(doc) == validate(example, doc)
    assert t_compiled < t_oracle  # compiled must actually be faster

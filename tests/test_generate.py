"""Port of the reference generator spec (/root/reference/src/generate.spec.ts)."""

import json
import random

import pytest

from yaschva_ray import UNDEFINED, load_json, validate
from yaschva_ray.generate import GenerationError, generate, random_number

from test_oracle_validate import EXAMPLE1


def json_roundtrip(v):
    """JSON.parse(JSON.stringify(g)) — drops undefined dict members."""
    def clean(o):
        if isinstance(o, dict):
            return {k: clean(x) for k, x in o.items() if x is not UNDEFINED}
        if isinstance(o, list):
            return [None if x is UNDEFINED else clean(x) for x in o]
        return o
    return json.loads(json.dumps(clean(v)))


def test_random_number():
    # generate.spec.ts:12-21
    rng = random.Random(1)
    for _ in range(32):
        r = random_number(rng, False, 0, 100)
        assert isinstance(r, float)
        i = random_number(rng, True, -10, 99)
        assert isinstance(i, int)
        assert -10 <= i <= 99


def test_simple_types():
    # generate.spec.ts:22-48
    schema = {
        "string": "string",
        "number": "number",
        "any": "any",
        "null": "null",
        "optional": "?",
        "boolean": "boolean",
        "integer": "integer",
    }
    rng = random.Random(42)
    any_undefined = 0
    for _ in range(32):
        result = generate(schema, rng=rng)
        assert isinstance(result["string"], str)
        assert isinstance(result["number"], (int, float)) and not isinstance(result["number"], bool)
        assert isinstance(result["boolean"], bool)
        assert result["null"] is None
        assert "optional" not in result
        if "any" not in result:
            any_undefined += 1
        assert validate(schema, result)["result"] == "pass"
    # 'any' sometimes generates undefined, sometimes not
    assert 0 < any_undefined < 32


def test_multiple_types():
    # generate.spec.ts:50-60
    schema = {"stringOrNumber": ["string", "number"], "optionalString": ["?", "string"]}
    rng = random.Random(7)
    for _ in range(16):
        result = generate(schema, rng=rng)
        assert isinstance(result["stringOrNumber"], (str, int, float))
        assert validate(schema, result)["result"] == "pass"


def test_arrays():
    # generate.spec.ts:62-80
    schema = {
        "stringOrNumber": {"$array": ["string", "number"]},
        "objArray": {"$array": {"hello": "string", "world": "number"}},
    }
    result = generate(schema, rng=random.Random(3))
    assert isinstance(result["stringOrNumber"], list)
    for x in result["objArray"]:
        assert isinstance(x["hello"], str)
        assert isinstance(x["world"], (int, float))
    assert validate(schema, result)["result"] == "pass"


def test_enum():
    # generate.spec.ts:82-90
    enums = ["lolly", "pop", "chewingGum", "doughnut"]
    schema = {"enum": {"$enum": enums}}
    result = generate(schema, rng=random.Random(5))
    assert result["enum"] in enums
    assert validate(schema, result)["result"] == "pass"


def test_object_meta():
    # generate.spec.ts:92-104
    schema = {"meta": {"name": "object with name", "$type": {"here": "string"}}}
    result = generate(schema, rng=random.Random(5))
    assert isinstance(result["meta"]["here"], str)
    assert validate(schema, result)["result"] == "pass"


def test_map():
    # generate.spec.ts:106-118
    schema = {"map": {"$map": "number"}}
    result = generate(schema, rng=random.Random(5))
    values = list(result["map"].values())
    assert 1 <= len(values) <= 33
    assert all(isinstance(x, (int, float)) for x in values)
    assert validate(schema, result)["result"] == "pass"


def test_map_regex_keys():
    # generate.spec.ts:120-125
    schema = {"$map": ["number"], "regex": "^ab[a-z]"}
    generated = generate(schema, {"mapMin": 5}, rng=random.Random(11))
    assert len(generated.keys()) > 1
    assert validate(schema, generated)["result"] == "pass"


def test_bound_number():
    # generate.spec.ts:127-132
    result = generate({"$number": {"min": 33, "max": 45}}, rng=random.Random(1))
    assert 33 <= result <= 45


def test_unbound_number():
    # generate.spec.ts:134-138
    result = generate({"$number": {}}, rng=random.Random(1))
    assert isinstance(result, (int, float))


def test_extended_simple_type():
    # generate.spec.ts:140-143
    assert isinstance(generate({"$type": "string"}, rng=random.Random(1)), str)


def test_extended_string():
    # generate.spec.ts:145-155
    rng = random.Random(1)
    result = generate({"$string": {"minLength": 77}}, rng=rng)
    assert isinstance(result, str) and len(result) >= 77
    result2 = generate({"$string": {"maxLength": 33}}, rng=rng)
    assert isinstance(result2, str) and len(result2) <= 33
    assert len(generate({"$string": {}}, rng=rng)) == 6


def test_throws_on_unknown_type():
    # generate.spec.ts:157-171
    with pytest.raises(Exception):
        generate({"$stringss": {"minLength": 77}}, rng=random.Random(1))
    with pytest.raises(Exception):
        generate({"something": "magicRune"}, rng=random.Random(1))


def test_example_roundtrip():
    # generate.spec.ts:173-183
    a = load_json(EXAMPLE1)
    for seed in range(8):
        g = generate(a, rng=random.Random(seed))
        assert validate(a, g)["result"] == "pass"
        assert validate(a, json_roundtrip(g))["result"] == "pass"


def test_regex_string():
    # generate.spec.ts:185-189
    result = generate({"$string": {"regex": "\\b(\\w*work\\w*)\\b"}}, rng=random.Random(2))
    assert isinstance(result, str)
    assert "work" in result


def test_uuid_regex():
    # generate.spec.ts:191-197
    regex = "[a-f0-9]{8}-[a-f0-9]{4}-4[a-f0-9]{3}-[89aAbB][a-f0-9]{3}-[a-f0-9]{12}"
    rng = random.Random(4)
    schema = {"id": {"$string": {"regex": regex}}}
    for _ in range(60):
        result = generate(schema, rng=rng)
        assert isinstance(result["id"], str)
        assert validate(schema, result)["result"] == "pass"


def test_optional_member_omitted():
    # generate.spec.ts:199-211
    rng = random.Random(9)
    undefined_generated = 0
    for _ in range(240):
        result = generate({"value": ["string", "?"]}, rng=rng)
        if "value" in result:
            assert isinstance(result["value"], str)
        else:
            assert len(result) == 0
            undefined_generated += 1
    assert undefined_generated > 0


def test_escaped_dollar():
    # generate.spec.ts:213-217
    generated = generate({"myNumber": "number", "\\$escapedDollar": "string"}, rng=random.Random(1))
    assert "myNumber" in generated
    assert "$escapedDollar" in generated


def test_array_of_undefined():
    # generate.spec.ts:219-225
    schema = {"$array": "?"}
    generated = generate(schema, rng=random.Random(1))
    assert validate(schema, generated)["result"] == "pass"
    assert validate(schema, json_roundtrip(generated))["result"] == "pass"


def test_prefer_undefined():
    # generate.spec.ts:227-240
    schema = {"root": "string", "aNumber": ["number"], "mayBeUndefined": ["string", "?"]}
    generated = generate(schema, {"prefer": "undefined"}, rng=random.Random(1))
    assert isinstance(generated["root"], str)
    assert isinstance(generated["aNumber"], (int, float))
    assert "mayBeUndefined" not in generated
    assert validate(schema, generated)["result"] == "pass"


def test_prefer_defined():
    # generate.spec.ts:242-255
    schema = {"root": "string", "aNumber": ["number"], "mayBeUndefined": ["string", "?"]}
    generated = generate(schema, {"prefer": "defined"}, rng=random.Random(1))
    assert isinstance(generated["mayBeUndefined"], str)
    assert validate(schema, generated)["result"] == "pass"


def test_depth_limit_recursive():
    # generate.spec.ts:257-276
    schema = {
        "$types": {"$tree": {"value": "string", "left": ["?", "$tree"], "right": ["?", "$tree"]}},
        "root": "$tree",
    }
    layers3 = generate(schema, {"prefer": "defined", "maxDepthSoft": 3}, rng=random.Random(2))
    assert "left" in layers3["root"]["left"]
    assert "left" not in layers3["root"]["left"]["left"]

    layers4 = generate(schema, {"prefer": "defined", "maxDepthSoft": 4}, rng=random.Random(2))
    assert "left" in layers4["root"]["left"]["left"]
    assert "left" not in layers4["root"]["left"]["left"]["left"]

    assert validate(schema, layers3)["result"] == "pass"
    assert validate(schema, json_roundtrip(layers3))["result"] == "pass"


def test_depth_limit_nested_arrays():
    # generate.spec.ts:278-290
    schema = {
        "$types": {"$tree": {"value": "string", "nodes": {"$array": "$tree"}}},
        "$type": "$tree",
    }
    generated = generate(schema, {"arrayMin": 1, "maxDepthSoft": 3}, rng=random.Random(3))
    assert len(generated["nodes"]) > 0
    for x in generated["nodes"]:
        for y in x["nodes"]:
            assert y["nodes"] == []
    assert validate(schema, generated)["result"] == "pass"


def test_depth_limit_nested_maps():
    # generate.spec.ts:292-304
    schema = {
        "$types": {"$tree": {"value": "string", "nodes": {"$map": "$tree"}}},
        "$type": "$tree",
    }
    layers3 = generate(schema, {"mapMin": 1, "maxDepthSoft": 3}, rng=random.Random(3))
    assert len(layers3["nodes"]) > 0
    for x in layers3["nodes"].values():
        assert len(x["nodes"]) == 0
    assert validate(schema, layers3)["result"] == "pass"


def test_circular_type_throws():
    # generate.spec.ts:306-312
    schema = {
        "$types": {"$tree": {"value": "string", "left": "$tree", "right": "$tree"}},
        "root": "$tree",
    }
    with pytest.raises(GenerationError):
        generate(schema, rng=random.Random(1))


def test_and_generation():
    # generate.spec.ts:314-330
    schema = {
        "$types": {
            "$myObject": {"value": "string"},
            "$otherObject": {"num": "number"},
            "$myMetaObject": {"$type": {"value2": "string"}},
        },
        "$and": [{"valueA": "string"}, "$myObject", "$myMetaObject", {"$type": "$otherObject"}],
    }
    generated = generate(schema, rng=random.Random(1))
    assert isinstance(generated["value"], str)
    assert isinstance(generated["valueA"], str)
    assert isinstance(generated["value2"], str)
    assert isinstance(generated["num"], (int, float))
    assert validate(schema, generated)["result"] == "pass"


def test_invalid_and_throws():
    # generate.spec.ts:332-335
    with pytest.raises(GenerationError):
        generate({"$and": [{"valueA": "string"}, "myObject"]}, rng=random.Random(1))


def test_array_size_bounds():
    # generate.spec.ts:337-343
    schema = {"$array": "string", "minLength": 2, "maxLength": 6}
    rng = random.Random(8)
    for _ in range(32):
        assert validate(schema, generate(schema, rng=rng))["result"] == "pass"


def test_map_size_bounds():
    # generate.spec.ts:345-351
    schema = {"$map": "string", "minLength": 2, "maxLength": 6}
    rng = random.Random(8)
    for _ in range(32):
        assert validate(schema, generate(schema, rng=rng))["result"] == "pass"


def test_seeded_determinism():
    # engine addition: same seed → identical output (fixtures depend on it)
    schema = load_json(EXAMPLE1)
    assert generate(schema, seed=42) == generate(schema, seed=42)


def test_lookahead_groups_generate_nothing():
    # negative lookahead must not emit the forbidden text (round-1 ADVICE):
    # generated strings must satisfy the unanchored JS .test() round-trip
    from yaschva_ray.jsregex import compile_js
    from yaschva_ray.randregex import rand_from_regex

    pat = r"^(?!foo)[a-z]{3}-\d+$"
    rx = compile_js(pat)
    for seed in range(50):
        s = rand_from_regex(pat, random.Random(seed))
        assert "foo" not in s[:3] or rx.search(s), s
        assert rx.search(s) is not None, s
    # positive lookahead: containment semantics — generating nothing keeps
    # the rest of the pattern matchable
    s2 = rand_from_regex(r"(?=x)x[0-9]", random.Random(1))
    assert compile_js(r"x[0-9]").search(s2)

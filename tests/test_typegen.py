"""Port of the reference type-emitter spec (/root/reference/src/type.spec.ts)
plus tests for the Arrow-schema emitter."""

import pyarrow as pa
import pytest

from yaschva_ray.typegen import TypeGenError, schema_to_arrow, validation_to_type


def test_simple_types():
    # type.spec.ts:5-13
    assert validation_to_type("?") == "undefined"
    assert validation_to_type("null") == "null"
    assert validation_to_type("any") == "any"
    assert validation_to_type("boolean") == "boolean"
    assert validation_to_type("number") == "number"
    assert validation_to_type("integer") == "number"
    assert validation_to_type("string") == "string"


def test_union_types():
    # type.spec.ts:15-20
    assert validation_to_type(["?", "boolean"]) == "undefined | boolean"
    assert validation_to_type(["any", "number"]) == "any | number"
    assert validation_to_type(["integer", "boolean", "string", "?"]) == "number | boolean | string | undefined"


def test_object_of_simple_types():
    # type.spec.ts:22-39
    schema = {
        "string": "string",
        "number": "number",
        "any": "any",
        "optional": "?",
        "boolean": "boolean",
        "integer": "integer",
    }
    assert validation_to_type(schema) == (
        "{ string: string; number: number; any: any;"
        " optional?: undefined; boolean: boolean; integer: number }"
    )
    assert validation_to_type(
        {"name": "object with name", "$type": {"str": "string", "num": "number"}}
    ) == "{ str: string; num: number }"


def test_arrays():
    # type.spec.ts:40-48
    schema = {
        "stringOrNumber": {"$array": ["string", "number"]},
        "objArray": {"$array": {"hello": "string", "world": "number"}},
    }
    assert validation_to_type(schema) == (
        "{ stringOrNumber: (string | number)[];"
        " objArray: { hello: string; world: number }[] }"
    )


def test_enum():
    # type.spec.ts:50-58
    assert validation_to_type({"$enum": ["lorem", "ipsum", "santa", "domine"]}) == '"lorem" | "ipsum" | "santa" | "domine"'
    assert validation_to_type({"$array": {"$enum": ["lorem", "ipsum", "santa", "domine"]}}) == '("lorem" | "ipsum" | "santa" | "domine")[]'


def test_all_optional_union_undefined():
    # type.spec.ts:60-67
    schema = {"prop1": ["?", "string"], "prop2": ["?", "number"]}
    assert validation_to_type(schema) == "{ prop1?: undefined | string; prop2?: undefined | number } | undefined"


def test_constraints_dropped():
    # type.spec.ts:69-75
    assert validation_to_type({"$string": {"minLength": 4, "maxLength": 16}}) == "string"
    assert validation_to_type({"$number": {"min": 3, "max": 9}}) == "number"


def test_map_types():
    # type.spec.ts:77-84
    assert validation_to_type({"$map": "number"}) == "{ [key: string] : number}"
    assert validation_to_type({"$map": ["number", "string"]}) == "{ [key: string] : number | string}"
    assert validation_to_type({"$map": ["number", {"$array": ["string", "?"]}]}) == "{ [key: string] : number | (string | undefined)[]}"


def test_custom_type():
    # type.spec.ts:86-96
    schema = {
        "$types": {"$person": {"name": "string", "height": "number"}},
        "string": "string",
        "person": "$person",
        "number": "number",
    }
    assert validation_to_type(schema) == "{ string: string; person: { name: string; height: number }; number: number }"


def test_throws_on_unknown():
    # type.spec.ts:98-112
    with pytest.raises(TypeGenError):
        validation_to_type({"$stringss": {"minLength": 77}})
    with pytest.raises(TypeGenError):
        validation_to_type({"something": "magicRune"})


def test_escaped_dollar():
    # type.spec.ts:113-116
    assert validation_to_type({"myNumber": "number", "\\$escapedDollar": "string"}) == "{ myNumber: number; $escapedDollar: string }"


def test_root_meta():
    # type.spec.ts:118-121
    assert validation_to_type({"$type": {"$array": "string"}}) == "string[]"


def test_and():
    # type.spec.ts:133-149
    schema = {
        "$types": {
            "$myObject": {"value": "string"},
            "$otherObject": {"num": "number"},
            "$myMetaObject": {"$type": {"value2": "string"}},
        },
        "$and": [{"valueA": "string"}, "$myObject", "$myMetaObject", {"$type": "$otherObject"}],
    }
    assert validation_to_type(schema) == "{ valueA: string; value: string; value2: string; num: number }"
    with pytest.raises(TypeGenError):
        validation_to_type({"$and": [{"valueA": "string"}, "myObject"]})


# --- Arrow schema emitter -------------------------------------------------


def test_schema_to_arrow_flagship():
    # FIXTURES.md F0 schema → input_hint Arrow shape
    schema = {
        "$types": {"$span": {
            "kind": {"$enum": ["text", "image", "audio", "video"]},
            "text": ["?", {"$string": {"minLength": 1, "maxLength": 65536}}],
            "media_ref": ["?", {"$string": {"regex": "^media://[a-z0-9/._-]+$"}}],
            "offset": {"$number": {"min": 0, "max": 9007199254740991}},
        }},
        "doc_id": {"$string": {"minLength": 1, "regex": "^doc-[0-9a-f]{12}$"}},
        "spans": {"$array": "$span", "minLength": 1, "maxLength": 4096},
    }
    arrow = schema_to_arrow(schema)
    assert arrow.field("doc_id").type == pa.string()
    spans = arrow.field("spans").type
    assert pa.types.is_list(spans)
    st = spans.value_type
    assert st.field("kind").type == pa.string()
    assert st.field("text").type == pa.string()
    assert st.field("media_ref").type == pa.string()
    assert st.field("offset").type == pa.float64()


def test_schema_to_arrow_fallbacks():
    arrow = schema_to_arrow({
        "$types": {"$t": {"v": "string", "next": ["?", "$t"]}},
        "multi": ["string", "number"],
        "rec": "$t",
        "anything": "any",
        "m": {"$map": "integer"},
    })
    assert arrow.field("multi").type == pa.string()  # json fallback
    assert arrow.field("multi").metadata[b"encoding"] == b"json"
    assert pa.types.is_struct(arrow.field("rec").type)  # one level, then json
    assert arrow.field("anything").metadata[b"encoding"] == b"json"
    assert pa.types.is_map(arrow.field("m").type)


def test_arrow_to_validation_nested_roundtrip():
    """Inference handles nested list/struct/map and $-keys; the inferred
    schema validates a conforming row via the oracle."""
    import pyarrow as pa

    from yaschva_ray.oracle import validate
    from yaschva_ray.typegen import arrow_to_validation

    schema = pa.schema([
        ("doc_id", pa.int64()),
        ("$meta", pa.string()),
        ("spans", pa.list_(pa.struct([("kind", pa.string()),
                                      ("offset", pa.int32())]))),
        ("tags", pa.map_(pa.string(), pa.int64())),
        ("score", pa.float64()),
        ("ok", pa.bool_()),
        ("ts", pa.timestamp("us")),
    ])
    v = arrow_to_validation(schema, nullable_cols={"score"})
    assert v["doc_id"] == "integer"
    assert v["\\$meta"] == "string"          # $-escape preserved
    assert v["score"] == ["number", "null"]
    assert v["spans"] == {"$array": {"kind": ["string", "null", "?"],
                                     "offset": ["integer", "null", "?"]}}
    assert v["tags"] == {"$map": "integer"}
    assert v["ts"] == "string"
    row = {"doc_id": 1, "$meta": "m", "score": None, "ok": True,
           "ts": "2024-01-01T00:00:00",
           "spans": [{"kind": "text", "offset": 0}],
           "tags": {"a": 1}}
    assert validate(v, row)["result"] == "pass"

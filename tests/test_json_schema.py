"""JSON-schema -> GBNF conversion, validated by actually constraining text
with the generated grammar (reference: common/json-schema-to-grammar.cpp +
tests/test-json-schema-to-grammar.cpp)."""

import json

import pytest

from prima_tpu.grammar import GrammarMatcher, parse_gbnf
from prima_tpu.grammar.json_schema import json_schema_to_gbnf


def _matches(schema: dict, text: str) -> bool:
    g = parse_gbnf(json_schema_to_gbnf(schema))
    m = GrammarMatcher(g)
    return m.advance_text(text.encode()) and m.is_complete()


def test_object_required_and_optional():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"},
                       "tag": {"type": "string"}},
        "required": ["name", "age"],
    }
    assert _matches(schema, '{"name": "bob", "age": 7}')
    assert _matches(schema, '{"name": "bob", "age": 7, "tag": "x"}')
    assert not _matches(schema, '{"age": 7}')
    assert not _matches(schema, '{"name": "bob", "age": "x"}')


def test_enum_and_const():
    assert _matches({"enum": ["red", "green", 3]}, '"red"')
    assert _matches({"enum": ["red", "green", 3]}, "3")
    assert not _matches({"enum": ["red", "green"]}, '"blue"')
    assert _matches({"const": 42}, "42")
    assert not _matches({"const": 42}, "43")


def test_array_items_and_bounds():
    schema = {"type": "array", "items": {"type": "integer"}}
    assert _matches(schema, "[]")
    assert _matches(schema, "[1, 2, 3]")
    assert not _matches(schema, '[1, "a"]')
    bounded = {"type": "array", "items": {"type": "integer"}, "minItems": 2, "maxItems": 3}
    assert not _matches(bounded, "[1]")
    assert _matches(bounded, "[1, 2]")
    assert _matches(bounded, "[1, 2, 3]")
    assert not _matches(bounded, "[1, 2, 3, 4]")


def test_oneof_and_types_list():
    schema = {"oneOf": [{"type": "integer"}, {"type": "boolean"}]}
    assert _matches(schema, "5")
    assert _matches(schema, "true")
    assert not _matches(schema, '"s"')
    schema2 = {"type": ["string", "null"]}
    assert _matches(schema2, '"x"')
    assert _matches(schema2, "null")
    assert not _matches(schema2, "1")


def test_refs_and_nesting():
    schema = {
        "$defs": {"pt": {"type": "object",
                         "properties": {"x": {"type": "number"}, "y": {"type": "number"}},
                         "required": ["x", "y"]}},
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/pt"}, "b": {"$ref": "#/$defs/pt"}},
        "required": ["a", "b"],
    }
    assert _matches(schema, '{"a": {"x": 1, "y": 2}, "b": {"x": -1.5, "y": 0}}')
    assert not _matches(schema, '{"a": {"x": 1}, "b": {"x": 1, "y": 2}}')


def test_free_value():
    assert _matches({}, '{"anything": [1, "two", null, {"deep": true}]}')
    assert _matches({}, "3.14")


def test_string_pattern():
    """pattern support (json-schema-to-grammar.cpp _visit_pattern)."""
    assert _matches({"type": "string", "pattern": "^[a-z]{2,4}$"}, '"abc"')
    assert not _matches({"type": "string", "pattern": "^[a-z]{2,4}$"}, '"a"')
    assert not _matches({"type": "string", "pattern": "^[a-z]{2,4}$"}, '"abcde"')
    assert _matches({"type": "string", "pattern": "^\\d+-\\d+$"}, '"12-34"')
    assert not _matches({"type": "string", "pattern": "^\\d+-\\d+$"}, '"12-"')
    assert _matches({"type": "string", "pattern": "^(foo|bar)$"}, '"bar"')
    assert not _matches({"type": "string", "pattern": "^(foo|bar)$"}, '"baz"')
    # unanchored: may match anywhere in the string
    assert _matches({"type": "string", "pattern": "ab"}, '"xxabyy"')
    assert not _matches({"type": "string", "pattern": "ab"}, '"xxayy"')


def test_string_length_bounds():
    s = {"type": "string", "minLength": 2, "maxLength": 3}
    assert _matches(s, '"ab"')
    assert not _matches(s, '"a"')
    assert not _matches(s, '"abcd"')
    assert _matches({"type": "string", "minLength": 1}, '"x"')
    assert not _matches({"type": "string", "minLength": 1}, '""')


def test_pattern_class_escapes():
    """\\d/\\w/\\s inside [...] must expand to ranges, not literal letters."""
    assert _matches({"type": "string", "pattern": "^[\\d]+$"}, '"123"')
    assert not _matches({"type": "string", "pattern": "^[\\d]+$"}, '"ddd"')
    assert _matches({"type": "string", "pattern": "^[\\w-]+$"}, '"a_b-9"')
    with pytest.raises(ValueError):
        json_schema_to_gbnf({"type": "string", "pattern": "^[\\D]+$"})


def test_all_optional_object_any_subset():
    """Any subset of optional properties (in declaration order) is valid."""
    s = {"type": "object", "properties": {
        "a": {"type": "integer"}, "b": {"type": "integer"},
        "c": {"type": "integer"}}}
    assert _matches(s, '{"b": 1}')
    assert _matches(s, '{"c": 2}')
    assert _matches(s, '{"a": 1, "c": 2}')
    assert _matches(s, '{}')


def test_max_items_zero_and_ref_namespace():
    assert _matches({"type": "array", "maxItems": 0}, "[]")
    assert not _matches({"type": "array", "maxItems": 0}, "[1]")
    s = {"$defs": {"string": {"type": "integer"}}, "type": "object",
         "properties": {"a": {"$ref": "#/$defs/string"},
                        "b": {"type": "string"}},
         "required": ["a", "b"]}
    assert _matches(s, '{"a": 3, "b": "x"}')
    assert not _matches(s, '{"a": "x", "b": "x"}')


def test_pydantic_models_to_grammar():
    pydantic = pytest.importorskip("pydantic")

    class Point(pydantic.BaseModel):
        """A 2-D point."""
        x: float
        y: float
        label: str = "origin"

    class Flag(pydantic.BaseModel):
        on: bool

    from prima_tpu.tools.pydantic_to_grammar import gbnf_for_models

    grammar, docs = gbnf_for_models([Point])
    g = parse_gbnf(grammar)
    m = GrammarMatcher(g)
    assert m.advance_text(b'{"x": 1.5, "y": -2, "label": "a"}')
    assert m.is_complete()
    m = GrammarMatcher(g)
    assert not (m.advance_text(b'{"x": true, "y": 2}') and m.is_complete())
    assert "Point" in docs and "label" in docs and "optional" in docs

    # multi-model alternation: either model's JSON is accepted
    grammar2, _ = gbnf_for_models([Point, Flag])
    g2 = parse_gbnf(grammar2)
    for ok_text in (b'{"x": 0, "y": 0}', b'{"on": false}'):
        m = GrammarMatcher(g2)
        assert m.advance_text(ok_text) and m.is_complete()

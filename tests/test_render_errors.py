"""Error-path rendering parity with the reference's wrapped errors.

The reference emits ``outer: inner`` chains (type frame per value,
Go-quoted key per object member, [i] per array element — validate.go:74,
500, 107/346); its README pins the canonical example (README.md:41-42).
Our engine's native artifact is violation rows; spec/render.py maps a
row + its document back to the exact reference string.
"""

from __future__ import annotations

from jsonschema_spark.spec.compile import compile_spec
from jsonschema_spark.spec.evaluate import validate_value
from jsonschema_spark.spec.model import parse_json
from jsonschema_spark.spec.render import render_reference_error


def _render_first(schema_text: str, doc_text: str) -> str:
    compiled = compile_spec(schema_text)
    doc = parse_json(doc_text)
    violations = validate_value(compiled, doc)
    assert violations, "expected a failing document"
    return render_reference_error(doc, violations[0])


def test_readme_example_exact():
    """The reference README's pinned output (README.md:41-42):
    object: "number": string: type is not allowed"""
    schema = """{
      "$schema": "http://json-schema.org/draft-04/schema#",
      "title": "Product",
      "type": "object",
      "properties": {
        "number":      { "type": "number" },
        "street_name": { "type": "string" },
        "street_type": { "type": "string",
                         "enum": ["Street", "Avenue", "Boulevard"] }
      }
    }"""
    out = _render_first(schema, '{"number": "1600"}')
    assert out == 'object: "number": string: type is not allowed'


def test_nested_array_and_object_frames():
    schema = """{
      "type": "object",
      "properties": {
        "a": {"type": "object", "properties": {
          "b": {"type": "array", "items": {"type": "integer"}}}}
      }
    }"""
    out = _render_first(schema, '{"a": {"b": [1, "x"]}}')
    assert out == (
        'object: "a": object: "b": array: [1]: string: type is not allowed'
    )


def test_required_renders_at_object_frame():
    """validate.go:514 literal: required property %q is missing, wrapped
    by the object's type frame only."""
    out = _render_first(
        '{"type": "object", "required": ["name"]}', '{"other": 1}'
    )
    assert out == 'object: required property "name" is missing'


def test_root_scalar_type_gate():
    out = _render_first('{"type": "object"}', "123")
    assert out == "number: type is not allowed"


def test_bounds_render_rational_like_big_rat():
    """validate.go:240 formats both sides as big.Rat (num/denom)."""
    out = _render_first('{"minimum": 3}', "2")
    assert out == "number: value 2/1 is smaller than 3/1"


def test_length_literals():
    out = _render_first('{"maxLength": 2}', '"abc"')
    assert out == "string: length is bigger than 2"
    out = _render_first('{"minItems": 2}', "[1]")
    assert out == "array: length is smaller than 2"


def test_unique_items_literal():
    """validate.go:366: items %d and %d are equal."""
    out = _render_first('{"uniqueItems": true}', "[1, 2, 1]")
    assert out == "array: items 0 and 2 are equal"


def test_additional_properties_member_frame():
    """validate.go:490 wrapped by the member key (validate.go:500)."""
    out = _render_first(
        '{"properties": {"a": {}}, "additionalProperties": false}',
        '{"a": 1, "zz": 2}',
    )
    assert out == 'object: "zz": additional properties are not allowed'


def test_combinator_keyword_frame_replaces_type_frame():
    """Combinators run before the type dispatch and wrap with their own
    keyword (validate.go:29-54), not the value's type name."""
    out = _render_first('{"not": {"type": "integer"}}', "5")
    assert out == "not: must not match"
    out = _render_first(
        '{"oneOf": [{"type": "integer"}, {"minimum": 0}]}', "5"
    )
    assert out == "oneOf: must match exactly once"
    out = _render_first('{"anyOf": [{"type": "string"}]}', "5")
    assert out == "anyOf: must match at least once"


def test_render_never_raises_on_suite_corpus():
    """No-crash property over the official draft-4 suite: every failing
    case's every violation renders to a non-empty string whose first
    frame is either the document's type name or a combinator keyword.
    (Exact-text parity is pinned per-keyword above; this pins total
    coverage of the rendering dispatch over real schema diversity.)"""
    import os

    from jsonschema_spark.spec.compile import compile_spec, file_map_resolver

    suite_dir = "/root/reference/_testdata/suite/draft4"
    remotes = "/root/reference/_testdata/remotes"
    if not os.path.isdir(suite_dir):
        return
    resolver = file_map_resolver({"http://localhost:1234/": remotes})
    n_rendered = 0
    for fname in sorted(os.listdir(suite_dir)):
        if not fname.endswith(".json") or fname == "format.json":
            continue
        with open(os.path.join(suite_dir, fname), "rb") as fh:
            groups = parse_json(fh.read())
        for group in groups:
            compiled = compile_spec(group["schema"], resolver=resolver)
            for case in group["tests"]:
                if case["valid"]:
                    continue
                doc = case["data"]
                for v in validate_value(compiled, doc):
                    out = render_reference_error(doc, v)
                    assert out and isinstance(out, str)
                    first = out.split(":", 1)[0]
                    assert first in {
                        "object", "array", "string", "number", "bool",
                        "null", "enum", "anyOf", "oneOf", "not",
                        "invalid json",
                    }, f"{fname}: unexpected first frame {first!r} in {out!r}"
                    n_rendered += 1
    assert n_rendered > 250, n_rendered

"""Hypothesis metamorphic properties for the spec evaluator.

The official suite pins POINT cases; the seeded fuzzers pin
Spark-vs-evaluator agreement. This layer pins the evaluator's own
ALGEBRA on arbitrary generated JSON values and schemas — invariants the
reference's semantics imply for every input (validate.go:100-161
combinator composition):

- ``not`` is an involution at the verdict level
- single-child ``allOf``/``anyOf``/``oneOf`` are identity wrappers
- a singleton ``enum`` accepts exactly structural equality
- every value satisfies its own JSON type; integral numbers also
  satisfy ``integer`` (value-not-lexeme, validate.go:220-229)

Pure Python — no Spark session.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from jsonschema_spark.spec.compile import compile_spec
from jsonschema_spark.spec.evaluate import is_valid
from jsonschema_spark.spec.model import json_equal, json_type

# JSON values: no NaN/inf (not JSON), bounded depth/size for speed
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
json_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=6), children, max_size=4),
    ),
    max_leaves=10,
)

# schemas: a pool of small keyword dicts the compiler accepts
_schemas = st.one_of(
    st.just({"type": "integer"}),
    st.just({"type": ["string", "null"]}),
    st.just({"type": "object"}),
    st.just({"minimum": 0}),
    st.just({"maximum": 3, "exclusiveMaximum": True}),
    st.just({"multipleOf": 2}),
    st.just({"minLength": 1}),
    st.just({"maxLength": 3}),
    st.just({"pattern": "^a"}),
    st.just({"minItems": 1}),
    st.just({"uniqueItems": True}),
    st.just({"items": {"type": "integer"}}),
    st.just({"required": ["a"]}),
    st.just({"properties": {"a": {"minimum": 2}}}),
    st.just({"enum": [1, "a", [1, 2], {"k": 1}]}),
    st.just({"not": {"type": "number"}}),
    st.just({"anyOf": [{"type": "string"}, {"minimum": 5}]}),
)

_SETTINGS = dict(max_examples=150, deadline=None)


@settings(**_SETTINGS)
@given(schema=_schemas, value=json_values)
def test_not_negates_verdict(schema, value):
    plain = is_valid(compile_spec(schema), value)
    negated = is_valid(compile_spec({"not": schema}), value)
    assert negated == (not plain)


@settings(**_SETTINGS)
@given(schema=_schemas, value=json_values)
def test_double_not_is_identity(schema, value):
    plain = is_valid(compile_spec(schema), value)
    wrapped = is_valid(compile_spec({"not": {"not": schema}}), value)
    assert wrapped == plain


@settings(**_SETTINGS)
@given(schema=_schemas, value=json_values)
def test_single_child_combinators_are_identity(schema, value):
    plain = is_valid(compile_spec(schema), value)
    for kw in ("allOf", "anyOf", "oneOf"):
        assert is_valid(compile_spec({kw: [schema]}), value) == plain


@settings(**_SETTINGS)
@given(a=json_values, b=json_values)
def test_singleton_enum_is_structural_equality(a, b):
    accepted = is_valid(compile_spec({"enum": [a]}), b)
    assert accepted == json_equal(a, b)


@settings(**_SETTINGS)
@given(value=json_values)
def test_value_satisfies_own_type(value):
    t = json_type(value)
    assert is_valid(compile_spec({"type": t}), value)
    if t == "number" and isinstance(value, (int, float)):
        integral = isinstance(value, int) or float(value).is_integer()
        assert is_valid(compile_spec({"type": "integer"}), value) == integral


@settings(**_SETTINGS)
@given(schema=_schemas, value=json_values)
def test_oneof_with_disjoint_pair(schema, value):
    """oneOf [S, not S] is a tautology: exactly one branch always
    matches, whatever S and the value are."""
    assert is_valid(
        compile_spec({"oneOf": [schema, {"not": schema}]}), value
    )

"""Value model + compiled check-tree node for the constraint engine.

Design notes (Spark-first, not a port):

- Numbers are exact rationals (``fractions.Fraction``), so numeric bound,
  ``multipleOf`` and structural-equality semantics are value-based with
  arbitrary precision — the same observable contract as the reference's
  ``big.Rat`` comparisons (reference: /root/reference/schema.go:119-124,
  /root/reference/internal/jsonequal/equal.go:39-79) but achieved with the
  Python stdlib, not a translation of that code.
- ``integer`` is a *value* property, not a lexeme property: ``1.0`` and
  ``1e2`` are integers (reference contract: /root/reference/validate.go:220-229).
- String length counts Unicode code points — Python ``len(str)`` already
  does (reference contract: /root/reference/validate.go:194).
- Structural equality is deep, key-order-insensitive for objects,
  order-sensitive for arrays, value-based for numbers, and type-strict
  (``true != 1``) (reference contract:
  /root/reference/internal/jsonequal/equal.go:176-222).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from fractions import Fraction
from typing import Any, Optional, Union

# --- JSON type lattice -------------------------------------------------------

TYPE_NULL = "null"
TYPE_BOOLEAN = "boolean"
TYPE_STRING = "string"
TYPE_NUMBER = "number"
TYPE_INTEGER = "integer"
TYPE_ARRAY = "array"
TYPE_OBJECT = "object"

ALL_TYPES = frozenset(
    {TYPE_NULL, TYPE_BOOLEAN, TYPE_STRING, TYPE_NUMBER, TYPE_INTEGER, TYPE_ARRAY, TYPE_OBJECT}
)

NumberLike = Union[int, Fraction]


def parse_json(text: Union[str, bytes]) -> Any:
    """Parse JSON with exact-rational numbers.

    Floats become ``Fraction`` (exact decimal value, any magnitude — e.g.
    ``1e1000`` round-trips exactly); ints stay ``int``. Raises ``ValueError``
    on malformed input.
    """
    return json.loads(text, parse_float=Fraction)


def is_json_integer(value: Any) -> bool:
    """True iff the value is a JSON number with an integral value."""
    if isinstance(value, bool):
        return False
    if isinstance(value, int):
        return True
    if isinstance(value, Fraction):
        return value.denominator == 1
    if isinstance(value, float):
        return value.is_integer()
    return False


def is_json_number(value: Any) -> bool:
    return not isinstance(value, bool) and isinstance(value, (int, float, Fraction))


def json_type(value: Any) -> str:
    """Primary JSON type name of a parsed value (``integer`` folds into
    ``number``; integer-ness is decided separately by :func:`is_json_integer`)."""
    if value is None:
        return TYPE_NULL
    if isinstance(value, bool):
        return TYPE_BOOLEAN
    if is_json_number(value):
        return TYPE_NUMBER
    if isinstance(value, str):
        return TYPE_STRING
    if isinstance(value, list):
        return TYPE_ARRAY
    if isinstance(value, dict):
        return TYPE_OBJECT
    raise TypeError(f"not a JSON value: {type(value)!r}")


def as_fraction(value: Any) -> Fraction:
    if isinstance(value, bool) or not isinstance(value, (int, float, Fraction)):
        raise TypeError(f"not a JSON number: {value!r}")
    return Fraction(value)


def json_equal(a: Any, b: Any) -> bool:
    """Structural JSON equality (type-strict, number-by-value)."""
    ta, tb = json_type(a), json_type(b)
    if ta != tb:
        return False
    if ta == TYPE_NUMBER:
        return as_fraction(a) == as_fraction(b)
    if ta == TYPE_ARRAY:
        return len(a) == len(b) and all(json_equal(x, y) for x, y in zip(a, b))
    if ta == TYPE_OBJECT:
        if len(a) != len(b) or a.keys() != b.keys():
            return False
        return all(json_equal(v, b[k]) for k, v in a.items())
    return a == b


def json_contains(items: list, value: Any) -> bool:
    return any(json_equal(value, item) for item in items)


# --- Compiled check tree -----------------------------------------------------


@dataclass
class CompiledSchema:
    """One node of the executable check tree.

    The compiler (spec/compile.py) guarantees every field is normalized:
    regexes pre-compiled, numeric bounds exact ``Fraction``, enum variants
    parsed values, child schemas compiled. Evaluation (spec/evaluate.py) and
    Column-lowering (compiler/columns.py) both consume this one IR.
    """

    # empty set = any type (matches everything)
    types: frozenset = frozenset()
    # True in types-set means plain "number" was requested (integer included);
    # integer_only tracks whether "integer" (and not "number") was requested.
    integer_only: bool = False

    enum: Optional[list] = None

    all_of: list = field(default_factory=list)
    any_of: list = field(default_factory=list)
    one_of: list = field(default_factory=list)
    not_: Optional["CompiledSchema"] = None

    minimum: Optional[Fraction] = None
    exclusive_minimum: bool = False
    maximum: Optional[Fraction] = None
    exclusive_maximum: bool = False
    multiple_of: Optional[Fraction] = None

    min_length: Optional[int] = None
    max_length: Optional[int] = None
    pattern: Optional[re.Pattern] = None

    min_items: Optional[int] = None
    max_items: Optional[int] = None
    unique_items: bool = False
    # None | CompiledSchema (single form) | list[CompiledSchema] (tuple form)
    items: Any = None
    # None/True = accept extras; False = reject; CompiledSchema = validate
    additional_items: Any = None

    properties: dict = field(default_factory=dict)
    pattern_properties: list = field(default_factory=list)  # [(re.Pattern, CompiledSchema)]
    # None/True = accept; False = reject; CompiledSchema = validate
    additional_properties: Any = None
    required: tuple = ()
    # key -> tuple[str,...] (dependentRequired) or CompiledSchema (dependentSchemas)
    dependencies: dict = field(default_factory=dict)
    min_properties: Optional[int] = None
    max_properties: Optional[int] = None

    # $ref indirection: filled after resolution (may create cycles).
    ref: Optional["CompiledSchema"] = None

    # provenance for error paths / plan naming
    source_uri: str = ""

    def has_number_checks(self) -> bool:
        return (
            self.minimum is not None
            or self.maximum is not None
            or self.multiple_of is not None
        )

    def has_string_checks(self) -> bool:
        return (
            self.min_length is not None
            or self.max_length is not None
            or self.pattern is not None
        )

    def has_array_checks(self) -> bool:
        return (
            self.min_items is not None
            or self.max_items is not None
            or self.unique_items
            or self.items is not None
            or self.additional_items is not None
        )

    def has_object_checks(self) -> bool:
        return bool(
            self.properties
            or self.pattern_properties
            or self.additional_properties is not None
            or self.required
            or self.dependencies
            or self.min_properties is not None
            or self.max_properties is not None
        )

    def has_combinators(self) -> bool:
        return bool(
            self.enum is not None
            or self.all_of
            or self.any_of
            or self.one_of
            or self.not_ is not None
        )

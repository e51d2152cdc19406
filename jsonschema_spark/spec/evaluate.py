"""Reference evaluator for a CompiledSchema over parsed JSON values.

This is the engine's *semantic ground truth*: it defines the exact
accept/reject contract (same observable verdicts as the reference validator,
/root/reference/validate.go:23-77) and is executed on Spark only inside
Arrow-batched pandas-UDF kernels for free-form JSON columns — never per-row
Python on the typed-column hot path (that path lowers to native Columns in
compiler/columns.py).

Unlike the reference's fail-fast walk (its own TODO at
/root/reference/validate.go:18 wants collection), we collect *all* violations
with JSON-Pointer-style paths, which is what the violation-row sink needs.
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Any, Iterator, Optional, Union

from jsonschema_spark.spec.model import (
    CompiledSchema,
    as_fraction,
    is_json_integer,
    is_json_number,
    json_contains,
    json_equal,
    json_type,
    parse_json,
)


@dataclass(frozen=True)
class Violation:
    path: str  # JSON-Pointer-ish location inside the instance ("" = root)
    keyword: str
    message: str


def _deref(schema: CompiledSchema) -> Optional[CompiledSchema]:
    """Follow $ref indirection; a degenerate pure-ref cycle has no reachable
    constraints and therefore accepts everything (returns None)."""
    seen = set()
    while schema.ref is not None:
        if id(schema) in seen:
            return None
        seen.add(id(schema))
        schema = schema.ref
    return schema


def iter_violations(
    schema: CompiledSchema, value: Any, path: str = ""
) -> Iterator[Violation]:
    schema_or_none = _deref(schema)
    if schema_or_none is None:
        return
    schema = schema_or_none

    # combinators run against the raw value first (validate.go:29-54 ordering;
    # conjunctive with everything else)
    if schema.enum is not None and not json_contains(schema.enum, value):
        yield Violation(path, "enum", "value not in enum")
    for child in schema.all_of:
        yield from iter_violations(child, value, path)
    if schema.any_of and not any(is_valid(child, value) for child in schema.any_of):
        yield Violation(path, "anyOf", "value matches no anyOf variant")
    if schema.one_of:
        matches = sum(1 for child in schema.one_of if is_valid(child, value))
        if matches != 1:
            yield Violation(
                path, "oneOf", f"value must match exactly one variant, matched {matches}"
            )
    if schema.not_ is not None and is_valid(schema.not_, value):
        yield Violation(path, "not", "value matches the forbidden schema")

    vtype = json_type(value)

    if schema.types:
        ok = vtype in schema.types
        if not ok and vtype == "number":
            ok = "integer" in schema.types and is_json_integer(value)
        if not ok:
            yield Violation(path, "type", f"type {vtype} is not allowed")
            return  # type-specific keyword groups are meaningless now
    if schema.integer_only and vtype == "number" and not is_json_integer(value):
        return  # already reported above; guard (unreachable when types set)

    if vtype == "number":
        yield from _check_number(schema, value, path)
    elif vtype == "string":
        yield from _check_string(schema, value, path)
    elif vtype == "array":
        yield from _check_array(schema, value, path)
    elif vtype == "object":
        yield from _check_object(schema, value, path)


def _check_number(schema: CompiledSchema, value: Any, path: str) -> Iterator[Violation]:
    if not schema.has_number_checks():
        return
    num = as_fraction(value)
    if schema.minimum is not None:
        if num < schema.minimum or (schema.exclusive_minimum and num == schema.minimum):
            op = ">" if schema.exclusive_minimum else ">="
            yield Violation(path, "minimum", f"value must be {op} {schema.minimum}")
    if schema.maximum is not None:
        if num > schema.maximum or (schema.exclusive_maximum and num == schema.maximum):
            op = "<" if schema.exclusive_maximum else "<="
            yield Violation(path, "maximum", f"value must be {op} {schema.maximum}")
    if schema.multiple_of is not None and (num / schema.multiple_of).denominator != 1:
        yield Violation(path, "multipleOf", f"value must be a multiple of {schema.multiple_of}")


def _check_string(schema: CompiledSchema, value: str, path: str) -> Iterator[Violation]:
    if not schema.has_string_checks():
        return
    n = len(value)  # Unicode code points, matching the reference's RuneCount
    if schema.min_length is not None and n < schema.min_length:
        yield Violation(path, "minLength", f"length {n} < {schema.min_length}")
    if schema.max_length is not None and n > schema.max_length:
        yield Violation(path, "maxLength", f"length {n} > {schema.max_length}")
    if schema.pattern is not None and schema.pattern.search(value) is None:
        yield Violation(path, "pattern", f"value does not match {schema.pattern.pattern!r}")


def _check_array(schema: CompiledSchema, value: list, path: str) -> Iterator[Violation]:
    if not schema.has_array_checks():
        return
    n = len(value)
    if schema.min_items is not None and n < schema.min_items:
        yield Violation(path, "minItems", f"{n} items < {schema.min_items}")
    if schema.max_items is not None and n > schema.max_items:
        yield Violation(path, "maxItems", f"{n} items > {schema.max_items}")
    if schema.unique_items:
        for i in range(n):
            for j in range(i + 1, n):
                if json_equal(value[i], value[j]):
                    yield Violation(
                        path, "uniqueItems", f"items [{i}] and [{j}] are equal"
                    )
                    break
            else:
                continue
            break
    if isinstance(schema.items, CompiledSchema):
        for i, element in enumerate(value):
            yield from iter_violations(schema.items, element, f"{path}/{i}")
    elif isinstance(schema.items, list):
        for i, element in enumerate(value):
            if i < len(schema.items):
                yield from iter_violations(schema.items[i], element, f"{path}/{i}")
            elif schema.additional_items is False:
                yield Violation(
                    path, "additionalItems", f"extra item [{i}] is not allowed"
                )
            elif isinstance(schema.additional_items, CompiledSchema):
                yield from iter_violations(schema.additional_items, element, f"{path}/{i}")


def _check_object(schema: CompiledSchema, value: dict, path: str) -> Iterator[Violation]:
    if not schema.has_object_checks():
        return
    n = len(value)
    if schema.min_properties is not None and n < schema.min_properties:
        yield Violation(path, "minProperties", f"{n} members < {schema.min_properties}")
    if schema.max_properties is not None and n > schema.max_properties:
        yield Violation(path, "maxProperties", f"{n} members > {schema.max_properties}")

    required = set(schema.required)
    dependent_schemas = []
    for key, dep in schema.dependencies.items():
        if key in value:
            if isinstance(dep, tuple):
                required.update(dep)
            else:
                dependent_schemas.append((key, dep))
    for key in required:
        if key not in value:
            yield Violation(path, "required", f"required member {key!r} is missing")
    for key, dep in dependent_schemas:
        for v in iter_violations(dep, value, path):
            yield Violation(v.path, "dependencies", f"dependency on {key!r}: {v.message}")

    for key, member in value.items():
        member_path = f"{path}/{key}"
        matched = False
        prop = schema.properties.get(key)
        if prop is not None:
            matched = True
            yield from iter_violations(prop, member, member_path)
        for regex, child in schema.pattern_properties:
            if regex.search(key) is not None:
                matched = True
                yield from iter_violations(child, member, member_path)
        if not matched:
            if schema.additional_properties is False:
                yield Violation(
                    path, "additionalProperties", f"member {key!r} is not allowed"
                )
            elif isinstance(schema.additional_properties, CompiledSchema):
                yield from iter_violations(
                    schema.additional_properties, member, member_path
                )


def validate_value(schema: CompiledSchema, value: Any) -> list[Violation]:
    """All violations of a parsed JSON value (empty list = accept)."""
    return list(iter_violations(schema, value))


def is_valid(schema: CompiledSchema, value: Any) -> bool:
    return next(iter_violations(schema, value), None) is None


def validate_json(schema: CompiledSchema, text: Union[str, bytes]) -> list[Violation]:
    """Validate raw JSON text; malformed input is itself a violation
    (reference contract: /root/reference/validate.go:25-34)."""
    try:
        value = parse_json(text)
    except ValueError:
        return [Violation("", "json", "invalid json")]
    return validate_value(schema, value)

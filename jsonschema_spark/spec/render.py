"""Render engine violations in the reference validator's wrapped-error
format.

The reference reports one fail-fast error per document as a chain of
``outer: inner`` wraps (github.com/go-faster/errors style): each value
level contributes its jx token-type name (validate.go:74), each object
member descent contributes the Go-quoted key (validate.go:500), each
array element descent contributes ``[i]`` (validate.go:107,346), and
the leaf carries the keyword's message literal (e.g. ``type is not
allowed``, validate.go:165).  The README pins the canonical example
(README.md:41-42)::

    object: "number": string: type is not allowed

Our engine's contract is violation ROWS ``(id, check, path, message)``
— the right shape for a table-scale engine (and what the reference's
own TODO at validate.go:18 asks for) — so this module is the bridge:
:func:`render_reference_error` maps one violation row plus its document
back to the reference's human-readable string, for error reports, CLI
output, and the parity test that pins the README example.

Scope: exact literals for every keyword the reference renders from a
concrete check (type/enum/bounds/length/items/properties/required/
pattern/uniqueItems/additionalItems/additionalProperties/combinators);
``allOf`` children render as direct failures (the reference inserts an
``allOf:`` wrap; we flatten allOf at compile time, so that frame is
absent by design — documented divergence, verdict-preserving).
"""

from __future__ import annotations

import ast
import json
import re
from fractions import Fraction
from typing import Any

from jsonschema_spark.spec.evaluate import Violation
from jsonschema_spark.spec.model import as_fraction, json_type
from jsonschema_spark.spec.pointer import split_pointer

# json_type() speaks draft-4 ("boolean"); the reference's wrap speaks jx
# token names ("bool") — README-pinned for object/string.
_JX_NAME = {"boolean": "bool"}


def _jx_type(value: Any) -> str:
    name = json_type(value)
    return _JX_NAME.get(name, name)


def _rat(value: Any) -> str:
    """big.Rat's String() always renders ``num/denom`` (e.g. ``3/1``)."""
    fr = as_fraction(value) if not isinstance(value, Fraction) else value
    return f"{fr.numerator}/{fr.denominator}"


def _rat_text(text: str) -> str:
    """Our messages embed bounds as Fraction str ('3' or '5/2'); re-render
    them the big.Rat way."""
    return _rat(Fraction(text))


def _q(key: str) -> str:
    """Go %q of a string (enough for JSON object keys)."""
    out = key.replace("\\", "\\\\").replace('"', '\\"')
    return f'"{out}"'


def _compact_json(value: Any) -> str:
    """Compact JSON text of a parsed value (numbers best-effort — exact
    rationals fall back to str; only used inside enum's %q rendering)."""
    try:
        return json.dumps(value, separators=(",", ":"), default=str)
    except (TypeError, ValueError):
        return str(value)


def _first_quoted(message: str) -> str:
    """Extract the first Python-repr-quoted token from our message.
    repr() picks double quotes when the key itself contains a single
    quote (found by the suite-wide render property test), so match
    either literal form and literal_eval to unescape."""
    m = re.search(r"('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")", message)
    if m is None:
        raise ValueError(f"no quoted token in {message!r}")
    return ast.literal_eval(m.group(1))


def _leaf(v: Violation, value: Any) -> tuple[str, bool]:
    """(leaf text, wants_type_frame): the reference literal for the
    failing keyword, and whether the failing VALUE's type-name frame
    precedes it (type-group keywords do; combinators run before the
    type dispatch and wrap with the keyword name instead,
    validate.go:29-54 vs :57-74)."""
    kw, msg = v.keyword, v.message
    if kw == "json":
        return "invalid json", False
    if kw == "type":
        return "type is not allowed", True
    if kw == "enum":
        # reference: errors.Errorf("%q is not present in enum", data) —
        # Go %q of the raw JSON bytes — wrapped "enum" (validate.go:97,40)
        return f"enum: {_q(_compact_json(value))} is not present in enum", False
    if kw == "anyOf":
        return "anyOf: must match at least once", False
    if kw == "oneOf":
        matched = msg.rsplit("matched ", 1)[-1]
        if matched == "0":
            return "oneOf: must match at least once", False
        return "oneOf: must match exactly once", False
    if kw == "not":
        return "not: must not match", False
    if kw == "minimum":
        bound = msg.rsplit(" ", 1)[-1]
        return f"value {_rat(value)} is smaller than {_rat_text(bound)}", True
    if kw == "maximum":
        bound = msg.rsplit(" ", 1)[-1]
        return f"value {_rat(value)} is bigger than {_rat_text(bound)}", True
    if kw == "multipleOf":
        bound = msg.rsplit(" ", 1)[-1]
        return f"{_rat(value)} is not multiple of {_rat_text(bound)}", True
    if kw in ("minLength", "minItems", "minProperties"):
        bound = msg.rsplit(" ", 1)[-1]
        return f"length is smaller than {bound}", True
    if kw in ("maxLength", "maxItems", "maxProperties"):
        bound = msg.rsplit(" ", 1)[-1]
        return f"length is bigger than {bound}", True
    if kw == "pattern":
        m = re.search(r"value does not match (.*)\Z", msg)
        pat = m.group(1) if m else ""
        try:
            pat = ast.literal_eval(pat)
        except (ValueError, SyntaxError):
            pass
        return f"does not match pattern {pat}", True
    if kw == "uniqueItems":
        m = re.search(r"items \[(\d+)\] and \[(\d+)\] are equal", msg)
        return f"items {m.group(1)} and {m.group(2)} are equal", True
    if kw == "required":
        key = _first_quoted(msg)
        return f"required property {_q(key)} is missing", True
    if kw == "additionalProperties":
        key = _first_quoted(msg)
        return f"{_q(key)}: additional properties are not allowed", True
    if kw == "additionalItems":
        m = re.search(r"extra item \[(\d+)\]", msg)
        return f"[{m.group(1)}]: schema does not allow additionalItems", True
    if kw == "dependencies":
        key = _first_quoted(msg)
        rest = msg.split(": ", 1)[-1]
        return f"dependent {_q(key)}: {rest}", True
    # unknown keyword: pass our message through under the type frame
    return msg, True


def render_reference_error(doc: Any, violation: Violation) -> str:
    """One violation row + its parsed document → the reference's wrapped
    error string (outermost frame first).  ``doc`` is the PARSED
    instance (the same value ``validate_value`` saw), needed because the
    reference interleaves the concrete value types along the path."""
    frames: list[str] = []
    cur = doc
    segments = split_pointer(violation.path) if violation.path else []
    for seg in segments:
        frames.append(_jx_type(cur))
        if isinstance(cur, dict):
            frames.append(_q(seg))
            cur = cur[seg]
        elif isinstance(cur, list):
            frames.append(f"[{seg}]")
            cur = cur[int(seg)]
        else:  # pragma: no cover — a path through a scalar is a bug
            raise ValueError(
                f"path {violation.path!r} descends through a scalar"
            )
    leaf, wants_type = _leaf(violation, cur)
    if wants_type and violation.keyword != "json":
        frames.append(_jx_type(cur))
    frames.append(leaf)
    return ": ".join(frames)

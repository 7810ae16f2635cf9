"""Value-domain helpers shared by the oracle and the vectorized engine.

The reference validator (/root/reference/src/validate.ts) operates on JS
values where ``undefined`` and ``null`` are distinct (validate.ts:50-54).
Python has only ``None``; we model JS ``undefined`` with the ``UNDEFINED``
sentinel.  A missing dict key reads as ``UNDEFINED`` (mirrors JS property
access on a missing key); an explicit ``None`` is JS ``null``.
"""

from __future__ import annotations

import json
import math
from typing import Any

MAX_SAFE_INTEGER = 2**53 - 1  # Number.MAX_SAFE_INTEGER


class _Undefined:
    """Singleton standing in for JS ``undefined``."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return "undefined"

    def __bool__(self) -> bool:
        return False


UNDEFINED = _Undefined()


def is_undefined(v: Any) -> bool:
    return v is UNDEFINED


def js_truthy(v: Any) -> bool:
    """JS truthiness: falsy = undefined, null, false, 0, NaN, ''.
    Empty arrays/objects are TRUTHY (unlike Python)."""
    if v is UNDEFINED or v is None or v is False:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0 and not (isinstance(v, float) and math.isnan(v))
    if isinstance(v, str):
        return v != ""
    return True


def is_js_number(v: Any) -> bool:
    """``typeof v === 'number' && Number.isFinite(v)`` (validate.ts:56-57).

    Python bools are ints but JS booleans are not numbers, so exclude them.
    """
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return True
    return isinstance(v, float) and math.isfinite(v)


def is_safe_integer(v: Any) -> bool:
    """``Number.isSafeInteger`` (validate.ts:67-68)."""
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return abs(v) <= MAX_SAFE_INTEGER
    if isinstance(v, float):
        return math.isfinite(v) and v.is_integer() and abs(v) <= MAX_SAFE_INTEGER
    return False


def utf16_length(s: str) -> int:
    """JS ``String.length`` = UTF-16 code units (validate.ts:78-79).

    Non-BMP code points count as two.
    """
    # Fast path: pure-BMP strings have len == utf16 length.
    n = len(s)
    extra = sum(1 for ch in s if ord(ch) > 0xFFFF)
    return n + extra


def js_num_str(v: Any) -> str:
    """Format a number the way JS template interpolation does.

    Used in ``Array length needs to be between ${min} - ${max}``-style
    messages (validate.ts:112-114, 174-176). Integral doubles print without
    a decimal point.
    """
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if math.isnan(v):
            return "NaN"
        if v.is_integer() and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    return str(v)


def js_jsonable(o: Any) -> Any:
    """JSON.stringify value semantics: undefined dict members are DROPPED,
    undefined array elements become null."""
    if o is UNDEFINED:
        return None
    if isinstance(o, dict):
        return {k: js_jsonable(v) for k, v in o.items() if v is not UNDEFINED}
    if isinstance(o, list):
        return [None if v is UNDEFINED else js_jsonable(v) for v in o]
    return o


def js_json_dumps(obj: Any) -> str:
    """``JSON.stringify``-compatible compact dump (no spaces), used by the
    reference's schema-error messages (validate.ts:203, 256)."""

    def default(o: Any) -> Any:
        if o is UNDEFINED:
            return None
        raise TypeError(type(o))

    return json.dumps(obj, separators=(",", ":"), default=default)

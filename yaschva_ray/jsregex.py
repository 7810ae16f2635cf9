"""JS-dialect regex support.

The reference compiles schema regexes as ``new RegExp(pattern, 'u')`` and
uses unanchored ``.test()`` (validate.ts:80-82, 179-181).  Differences from
Python ``re`` that we correct for:

* JS ``$`` (without the ``m`` flag) matches only at the very end of the
  string; Python ``$`` also matches before a trailing newline.  We translate
  ``$`` (outside character classes) to ``\\Z``.
* JS ``\\w``/``\\d``/``\\b`` are ASCII even under the ``u`` flag; Python's
  default is Unicode.  We wrap them in local ASCII-flag groups ``(?a:...)``
  (or expand them inside character classes).

Remaining known deviation: JS ``\\s`` matches a slightly different Unicode
whitespace set than Python's; the reference corpus never exercises this.

Patterns the translator cannot handle fall back to compiling verbatim.
"""

from __future__ import annotations

import re
from functools import lru_cache

_CLASS_EXPANSION = {"w": "A-Za-z0-9_", "d": "0-9"}


def translate(pattern: str) -> str:
    out: list[str] = []
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if in_class:
                if nxt in _CLASS_EXPANSION:
                    out.append(_CLASS_EXPANSION[nxt])
                else:
                    out.append(ch + nxt)
            else:
                if nxt in "wWdDbB":
                    out.append(f"(?a:\\{nxt})")
                else:
                    out.append(ch + nxt)
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
        else:
            if ch == "[":
                in_class = True
                out.append(ch)
            elif ch == "$":
                out.append("\\Z")
            else:
                out.append(ch)
        i += 1
    return "".join(out)


@lru_cache(maxsize=4096)
def compile_js(pattern: str) -> re.Pattern:
    try:
        return re.compile(translate(pattern))
    except re.error:
        return re.compile(pattern)


def js_test(pattern: str, value: str) -> bool:
    """``new RegExp(pattern, 'u').test(value)`` — unanchored search."""
    return compile_js(pattern).search(value) is not None


def is_re2_safe(pattern: str) -> bool:
    """True if the pattern uses only constructs Arrow's RE2 engine supports
    with identical semantics (no backrefs / lookaround).  Used by the
    vectorized compiler to decide between ``pc.match_substring_regex`` and
    the Python fallback."""
    return re.search(r"\\[1-9]|\(\?<?[=!]", pattern) is None

"""Engine extension surface (SURVEY §2.5 user-extension): named custom
column-level checks.

The reference's extension mechanism is ``$types`` — reusable, recursive
schema fragments resolved before builtins (validate.ts:215-228).  The
engine adds REGISTERED PREDICATES on top: a name (conventionally
``@``-prefixed) registered here becomes usable wherever a simple type
can appear, across all three evaluators (row oracle, compiled closures,
vectorized tables — the vectorized path routes registered leaves through
its per-column oracle fallback unless a vectorized kernel is supplied).

Resolution order preserves reference semantics exactly: an active
``$types`` entry still shadows everything (validate.ts:223-228), and an
UNREGISTERED unknown name still raises the reference's exact
``Unknown validator:<json>`` schema error — schemas valid against the
reference behave identically whether or not any checks are registered.

``fn(value) -> str | None`` receives the decoded JS value (may be
``None`` for JS null or the ``UNDEFINED`` sentinel) and returns an error
string (the violation's ``error``; the offending value is echoed like
every reference leaf failure) or ``None`` for pass.  ``vectorized``, if
given, is ``fn_vec(pyarrow.Array) -> numpy bool fail-mask over DEFINED
values`` and lets the table fast path skip the per-row fallback.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable

_REGISTRY: dict[str, tuple[Callable[[Any], str | None], Any]] = {}


def register_check(name: str, fn: Callable[[Any], str | None], *,
                   vectorized=None) -> None:
    if not isinstance(name, str) or not name:
        raise ValueError("check name must be a non-empty string")
    _REGISTRY[name] = (fn, vectorized)


def unregister_check(name: str) -> None:
    _REGISTRY.pop(name, None)


def lookup_check(name: str):
    """Returns ``(fn, vectorized_or_None)`` or ``None``."""
    return _REGISTRY.get(name)


@contextmanager
def registered_check(name: str, fn, *, vectorized=None):
    """Scoped registration (tests / per-pipeline configuration)."""
    register_check(name, fn, vectorized=vectorized)
    try:
        yield
    finally:
        unregister_check(name)

"""Seeded schema-conforming data generator.

Mirrors the reference generator's semantics (/root/reference/src/generate.ts:
defaults 62-74, depth rules 84-121, preference 51-59, undefined-member
omission 130-137, regex strings via randexp 147,163) with a seedable RNG so
fixture tables are deterministic.  Round-trip invariant (generate.spec.ts):
``validate(s, generate(s))["result"] == "pass"``.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, replace
from typing import Any

from . import schema as S
from .randregex import rand_from_regex
from .values import MAX_SAFE_INTEGER, UNDEFINED

_ALNUM = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_SIMPLE_FOR_ANY = ["number", "integer", "?", "string", "boolean"]  # generate.ts:28


class GenerationError(Exception):
    pass


@dataclass
class Options:
    # defaults: generate.ts:62-74
    arrayMin: int = 1
    arrayMax: int = 90
    mapMin: int = 1
    mapMax: int = 33
    minNumber: float = -MAX_SAFE_INTEGER
    maxNumber: float = MAX_SAFE_INTEGER
    minStringLength: int = 3
    maxStringLength: int = 16
    maxDepthSoft: int = 4
    maxDepthHard: int = 32
    prefer: str = "none"  # 'defined' | 'undefined' | 'none'


def _js_round(x: float) -> int:
    """JS Math.round — half-up toward +Infinity (generate.ts:24)."""
    return math.floor(x + 0.5)


def random_number(rng: random.Random, is_integer: bool, mn: float, mx: float) -> float | int:
    num = rng.random() * (mx - mn) + mn
    return _js_round(num) if is_integer else num


def _random_string(rng: random.Random, length: int) -> str:
    return "".join(_ALNUM[math.floor(rng.random() * len(_ALNUM))] for _ in range(length))


def _simple_generation(t: str, options: Options, rng: random.Random) -> Any:
    # generate.ts:37-49
    if t == "any":
        pick = _SIMPLE_FOR_ANY[random_number(rng, True, 0, len(_SIMPLE_FOR_ANY) - 1)]
        return _simple_generation(pick, options, rng)
    if t == "?":
        return UNDEFINED
    if t == "null":
        return None
    if t == "number":
        return random_number(rng, False, options.minNumber, options.maxNumber)
    if t == "integer":
        return random_number(rng, True, options.minNumber, options.maxNumber)
    if t == "string":
        return _random_string(
            rng, random_number(rng, True, options.minStringLength, options.maxStringLength)
        )
    if t == "boolean":
        return rng.random() > 0.5
    raise S.unknown_validator_error(t)


def _dedup_to_min(items: list, child_schema: Any, gen, mn,
                  attempts: int = 200) -> list:
    """Drop deep-equal repeats (first occurrence wins) and regenerate
    until ``mn`` distinct values exist — the ``$unique`` engine
    extension's generator side (oracle.py documents the equality).
    Raises SchemaError when the child value space can't supply enough
    distinct values (e.g. a 1-value $enum with minLength 2)."""
    from .oracle import canonical_value_key

    out: list = []
    seen: set = set()

    def push(x):
        k = canonical_value_key(x)
        if k not in seen:
            seen.add(k)
            out.append(x)

    for x in items:
        push(x)
    tries = 0
    while len(out) < mn:
        tries += 1
        if tries > attempts:
            raise S.SchemaError(
                "$unique: cannot generate enough distinct values "
                f"(need {mn}, found {len(out)} in {attempts} attempts)")
        x = gen(child_schema, True)
        if x is not UNDEFINED:
            push(x)
    return out


def _apply_preference(branches: list, options: Options) -> list:
    # generate.ts:51-59
    if options.prefer == "defined":
        return [x for x in branches if x != "?"] if len(branches) > 1 else branches
    if options.prefer == "undefined":
        return ["?"] if any(x == "?" for x in branches) else branches
    return branches


def generate(schema: Any, options: dict | None = None, rng: random.Random | None = None,
             seed: int | None = None) -> Any:
    """Public entry (generate.ts:61-76).  ``seed`` (or an explicit ``rng``)
    makes output deterministic; default is unseeded like the reference."""
    opts = replace(Options(), **(options or {}))
    rng = rng or random.Random(seed)
    return _generate_internal(schema, opts, {}, 0, rng)


def _generate_internal(
    type_in: Any, options: Options, types_in: dict, depth: int, rng: random.Random
) -> Any:
    # generate.ts:78-178
    if depth >= options.maxDepthHard:
        raise GenerationError(
            f"Maximum depth reached: {depth} --\n"
            "  Most likely a circular type with no possible way to terminate.\n"
            "  Consider making the recursion optional."
        )

    custom_types = types_in
    t = type_in
    if S.is_typedef(type_in):
        custom_types = type_in["$types"]
        t = {k: v for k, v in type_in.items() if k != "$types"}

    def gen(tt: Any, increase_depth: bool = False) -> Any:
        return _generate_internal(tt, options, custom_types, depth + 1 if increase_depth else depth, rng)

    if S.is_simple_type(t):
        if custom_types.get(t):
            return gen(custom_types[t])
        return _simple_generation(t, options, rng)

    if isinstance(t, list):
        if depth > options.maxDepthSoft and any(x == "?" for x in t):
            return _simple_generation("?", options, rng)
        type_array = _apply_preference(t, options)
        idx = random_number(rng, True, 0, len(type_array) - 1)
        return gen(type_array[idx])

    if S.is_array(t):
        if depth > options.maxDepthSoft:
            return []
        mn = t["minLength"] if isinstance(t.get("minLength"), (int, float)) and not isinstance(t.get("minLength"), bool) else options.arrayMin
        mx = t["maxLength"] if isinstance(t.get("maxLength"), (int, float)) and not isinstance(t.get("maxLength"), bool) else options.arrayMax
        items = [gen(t["$array"], True) for _ in range(random_number(rng, True, mn, mx))]
        items = [x for x in items if x is not UNDEFINED]
        if t.get("$unique"):  # engine extension (oracle.py): emit a SET
            items = _dedup_to_min(items, t["$array"], gen, mn)
        return items

    if S.is_enum(t):
        return t["$enum"][random_number(rng, True, 0, len(t["$enum"]) - 1)]

    if S.is_obj(t):
        out = {}
        for key, value in t.items():
            generated = gen(value, True)
            key_c = key[1:] if key.startswith("\\$") else key
            if generated is not UNDEFINED:
                out[key_c] = generated
        return out

    if S.is_map(t):
        mn = t["minLength"] if isinstance(t.get("minLength"), (int, float)) and not isinstance(t.get("minLength"), bool) else options.mapMin
        mx = t["maxLength"] if isinstance(t.get("maxLength"), (int, float)) and not isinstance(t.get("maxLength"), bool) else options.mapMax
        if depth >= options.maxDepthSoft and (t.get("minLength") or 0) <= 0:
            return {}
        count = random_number(rng, True, mn, mx)
        out = {}
        for _ in range(count):
            key = rand_from_regex(t["regex"], rng) if t.get("regex") else _simple_generation("string", options, rng)
            out[key] = gen(t["$map"], True)
        if t.get("$unique"):  # engine extension: values must form a set
            from .oracle import canonical_value_key

            uniq_vals = _dedup_to_min(list(out.values()), t["$map"],
                                      gen, mn)
            keep = {}
            seen: set = set()
            for k, v in out.items():
                ck = canonical_value_key(v)
                if ck not in seen:
                    seen.add(ck)
                    keep[k] = v
            # uniq_vals[:len(keep)] are exactly keep's values (same
            # first-occurrence order); the tail is the minLength top-up
            for v in uniq_vals[len(keep):]:
                for _ in range(100):  # fresh non-colliding key
                    key = (rand_from_regex(t["regex"], rng)
                           if t.get("regex")
                           else _simple_generation("string", options, rng))
                    if key not in keep:
                        break
                keep[key] = v
            out = keep
        return out

    if S.is_number(t):
        mn = t["$number"].get("min")
        mx = t["$number"].get("max")
        return random_number(
            rng, False,
            options.minNumber if mn is None else mn,
            options.maxNumber if mx is None else mx,
        )

    if S.is_meta(t):
        return gen(t["$type"])

    if S.is_string(t):
        if t["$string"].get("regex"):
            return rand_from_regex(t["$string"]["regex"], rng)
        return _random_string(rng, t["$string"].get("minLength") or t["$string"].get("maxLength") or 6)

    if S.is_and(t):
        combined = S.combine_validation_objects(t, custom_types, lambda x: x)
        if combined.get("result") == "error":
            raise GenerationError(
                "Schema error, $and types must be objects: " + repr(combined["error"])
            )
        return gen(combined["pass"])

    raise GenerationError("Unknown type")

"""Generic expectation-suite runner — the Great-Expectations-style
PRODUCT surface (the lineitem demo in pipelines/ops.py is one pinned
instance; this takes any table + a JSON spec).

Spec format::

    {
      "columns": {
        "l_quantity":   {"not_null": true, "min": 1, "max": 25},
        "l_returnflag": {"enum": ["A", "N"]},
        "l_comment":    {"regex": "^[a-z ]+$"}
      },
      "unique": ["l_orderkey", "l_linenumber"],   # composite key
      "min_rows": 1000
    }

Every countable expectation folds per block in ONE fused scan (one
column-pruned pass over exactly the spec's columns); composite
uniqueness goes through the bounded raw-task exchange on an EXACT
string-concat canonical key (null cells as CHR(0) — no hash-collision
caveat).  A NULL cell fails min/max/enum/regex (the count is rows NOT
passing); ``not_null`` counts nulls directly.  ``regex`` uses RE2
semantics (pyarrow match_substring_regex).

Output: (check_name, n_violations, passed) sorted by check_name —
check names are ``<column>_<rule>`` plus ``unique_<c1>_<c2>`` and
``min_rows``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rule_checks(spec: dict) -> list[tuple[str, str, object]]:
    out = []
    for col, rules in sorted(spec.get("columns", {}).items()):
        for rule in sorted(rules):
            out.append((f"{col}_{rule}", col, (rule, rules[rule])))
    return out


def expectations_report(ds, spec: dict) -> pa.Table:
    """Run ``spec`` over a Ray Dataset; returns the report table."""
    from .engine.blocks import gather_tables

    checks = _rule_checks(spec)
    ucols = spec.get("unique")
    min_rows = spec.get("min_rows")

    def counts(t: pa.Table) -> pa.Table:
        vals = {"__n": t.num_rows}
        for name, col, (rule, arg) in checks:
            c = t[col]
            if rule == "not_null":
                bad = int(pc.sum(pc.cast(pc.is_null(c),
                                         pa.int64())).as_py() or 0) \
                    if arg else 0
            else:
                if rule == "min":
                    ok = pc.greater_equal(c, arg)
                elif rule == "max":
                    ok = pc.less_equal(c, arg)
                elif rule == "enum":
                    ok = pc.and_(pc.is_valid(c), pc.fill_null(
                        pc.is_in(c, value_set=pa.array(arg)), False))
                elif rule == "regex":
                    ok = pc.match_substring_regex(c, arg)
                else:
                    raise ValueError(f"unknown expectation rule {rule!r}")
                bad = t.num_rows - int(pc.sum(pc.cast(
                    pc.fill_null(ok, False), pa.int64())).as_py() or 0)
            vals[name] = bad
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in vals.items()})

    parts = [p for p in gather_tables(
        ds.map_batches(counts, batch_format="pyarrow")) if p.num_rows]
    keys = ["__n"] + [name for name, _, _ in checks]
    tot = {k: sum(int(p[k][0].as_py()) for p in parts) for k in keys}

    rows: list[tuple[str, int]] = [
        (name, tot[name]) for name, _, _ in checks]
    if min_rows is not None:
        rows.append(("min_rows", 0 if tot["__n"] >= min_rows else 1))
    if ucols:
        from .engine.checks import uniqueness_violations

        def pack(t: pa.Table) -> pa.Table:
            cols = [pc.fill_null(pc.cast(t[c], pa.string()), "\x00")
                    for c in ucols]
            key = (cols[0] if len(cols) == 1
                   else pc.binary_join_element_wise(*cols, "|"))
            return pa.table({"k": key})

        dup = uniqueness_violations(
            ds.map_batches(pack, batch_format="pyarrow"), "k")
        extra = 0
        if dup.num_rows:
            extra = int(pc.sum(pc.subtract(
                dup["n_docs"].cast(pa.int64()),
                pa.scalar(1, pa.int64()))).as_py() or 0)
        rows.append((f"unique_{'_'.join(ucols)}", extra))

    rows.sort()
    return pa.table({
        "check_name": pa.array([r[0] for r in rows], pa.string()),
        "n_violations": pa.array([r[1] for r in rows], pa.int64()),
        "passed": pa.array([r[1] == 0 for r in rows], pa.bool_())})


def spec_columns(spec: dict) -> list[str]:
    """The pruned column set a spec needs (for columns= at the read)."""
    cols = set(spec.get("columns", {}))
    cols.update(spec.get("unique") or [])
    return sorted(cols)


def suggest_spec(ds, *, enum_cap: int = 16,
                 distinct_cap: int = 64) -> dict:
    """Profile a table and EMIT a candidate expectation spec — the
    loop-closer: ``suggest_spec`` output fed to ``expectations_report``
    passes BY CONSTRUCTION on the profiled table (observed min/max
    bounds, not_null where no nulls were seen, enum where the observed
    distinct set stayed under ``enum_cap``).

    One fused scan: per-block partials carry (n, nulls, min, max) per
    column plus a CAPPED distinct sample (pc.unique per block, merged
    with the cap re-applied — a column exceeding ``distinct_cap``
    distincts abandons its enum candidacy, so driver state stays
    O(columns × cap), never O(rows))."""
    import pyarrow.types as pat

    from .engine.blocks import gather_tables

    schema = ds.schema()
    names = list(schema.names)
    types = {n: t for n, t in zip(schema.names, schema.types)}
    num_cols = [n for n in names if pat.is_integer(types[n])
                or pat.is_floating(types[n])]
    str_cols = [n for n in names if pat.is_string(types[n])
                or pat.is_large_string(types[n])]

    def partial(t: pa.Table) -> pa.Table:
        cols: dict = {"__n": pa.array([t.num_rows], pa.int64())}
        for c in names:
            cols[f"{c}__nulls"] = pa.array(
                [t[c].null_count], pa.int64())
        for c in num_cols:
            cols[f"{c}__min"] = pa.array(
                [pc.min(t[c]).as_py()], pa.float64())
            cols[f"{c}__max"] = pa.array(
                [pc.max(t[c]).as_py()], pa.float64())
        for c in str_cols:
            u = pc.unique(t[c].combine_chunks())
            vals = ([] if len(u) > distinct_cap
                    else [v for v in u.to_pylist() if v is not None])
            over = len(u) > distinct_cap
            cols[f"{c}__distinct"] = pa.array(
                [vals], pa.list_(pa.string()))
            cols[f"{c}__over"] = pa.array([over], pa.bool_())
        return pa.table(cols)

    parts = [p for p in gather_tables(
        ds.map_batches(partial, batch_format="pyarrow")) if p.num_rows]
    if not parts:
        return {"columns": {}}
    n = sum(int(p["__n"][0].as_py()) for p in parts)
    spec: dict = {"columns": {}, "min_rows": max(1, n // 2)}
    for c in names:
        rules: dict = {}
        nulls = sum(int(p[f"{c}__nulls"][0].as_py()) for p in parts)
        if nulls == 0 and n > 0:
            rules["not_null"] = True
        if c in num_cols:
            mins = [p[f"{c}__min"][0].as_py() for p in parts]
            maxs = [p[f"{c}__max"][0].as_py() for p in parts]
            mins = [v for v in mins if v is not None]
            maxs = [v for v in maxs if v is not None]
            if mins:
                rules["min"] = min(mins)
                rules["max"] = max(maxs)
        if c in str_cols:
            over = any(p[f"{c}__over"][0].as_py() for p in parts)
            if not over:
                seen: set = set()
                for p in parts:
                    seen.update(p[f"{c}__distinct"][0].as_py())
                if seen and len(seen) <= enum_cap:
                    rules["enum"] = sorted(seen)
        if rules:
            spec["columns"][c] = rules
    return spec


def _clamp_scalar(bound, typ: pa.DataType, *, is_min: bool) -> pa.Scalar:
    """Replacement scalar for a min/max clamp.  On INTEGRAL columns a
    fractional bound is rounded toward the INTERIOR of the valid range
    (ceil for min, floor for max): ``pa.scalar(1.5, int64)`` truncates
    to 1, so a -2 clamped by min=1.5 would come back as 1 — still
    violating the rule, and ``repair`` → ``expect`` would re-fail with
    no explanation.  The comparison itself still uses the raw fractional
    bound (int 1 < 1.5 clamps, int 2 doesn't), so only the replacement
    value changes."""
    if pa.types.is_integer(typ) and isinstance(bound, float) \
            and not float(bound).is_integer():
        import math

        return pa.scalar(math.ceil(bound) if is_min else math.floor(bound),
                         typ)
    return pa.scalar(bound, typ)


def _repair_batch(t: pa.Table, spec: dict,
                  count: bool = False) -> pa.Table:
    """Apply ``spec``'s repairable rules to one batch: min/max CLAMP
    (null-preserving), out-of-enum and regex-failing values NULL OUT
    (repair never invents data; ``not_null`` is not repairable).  With
    ``count=True`` returns a one-row per-rule repair-count partial
    instead of the repaired rows."""
    counts: dict = {}
    out = t
    for col, rules in sorted(spec.get("columns", {}).items()):
        c = out[col]
        valid = pc.is_valid(c)
        if "min" in rules or "max" in rules:
            rep = c
            if "min" in rules:
                rep = pc.if_else(pc.fill_null(
                    pc.less(rep, rules["min"]), False),
                    _clamp_scalar(rules["min"], c.type, is_min=True), rep)
            if "max" in rules:
                rep = pc.if_else(pc.fill_null(
                    pc.greater(rep, rules["max"]), False),
                    _clamp_scalar(rules["max"], c.type, is_min=False), rep)
            if count:
                counts[f"{col}_clamped"] = int(pc.sum(pc.cast(
                    pc.and_(valid, pc.invert(pc.fill_null(pc.equal(
                        c, rep), True))), pa.int64())).as_py() or 0)
            c = rep
        bad = None
        if "enum" in rules:
            bad = pc.and_(valid, pc.invert(pc.fill_null(pc.is_in(
                c, value_set=pa.array(rules["enum"])), False)))
        if "regex" in rules:
            rbad = pc.and_(valid, pc.invert(pc.fill_null(
                pc.match_substring_regex(c, rules["regex"]), False)))
            bad = rbad if bad is None else pc.or_(bad, rbad)
        if bad is not None:
            if count:
                counts[f"{col}_nulled"] = int(pc.sum(pc.cast(
                    bad, pa.int64())).as_py() or 0)
            c = pc.if_else(bad, pa.scalar(None, c.type), c)
        if not count:
            i = out.schema.get_field_index(col)
            ca = c.combine_chunks() if isinstance(
                c, pa.ChunkedArray) else c
            out = out.set_column(i, pa.field(col, ca.type), ca)
    if count:
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in sorted(counts.items())})
    return out


def repair_counts(ds, spec: dict) -> dict:
    """Streaming count pass: per-rule repair counts (driver state =
    one int per rule)."""
    from .engine.blocks import gather_tables

    parts = [p for p in gather_tables(ds.map_batches(
        lambda t: _repair_batch(t, spec, count=True),
        batch_format="pyarrow")) if p.num_rows]
    if not parts:
        return {}
    return {k: sum(int(p[k][0].as_py()) for p in parts)
            for k in parts[0].column_names}

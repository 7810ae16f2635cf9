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

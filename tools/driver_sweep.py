#!/usr/bin/env python
"""Local stand-in for the driver's correctness sweep: run every
``__ray_entry__.queries()`` entry at sf0.01 next to its ``oracle_sql()``
through DuckDB and report rows/schema/value-hash matches (columns sorted
by name before hashing, the driver's protocol).

Usage: python tools/driver_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys


def _norm(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:  # Ray Dataset
        df = obj.to_pandas()
    return df[sorted(df.columns)].reset_index(drop=True)


def _value_hash(df) -> str:
    # row-order-sensitive like the driver's sorted compare: both sides
    # ORDER BY deterministically, so stringify + hash is stable
    payload = df.astype(str).to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    con = duckdb.connect()
    for f in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    results, n_pass, n_fail, n_noor = {}, 0, 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = _norm(fn(sf))
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"query: {e}"}
            n_fail += 1
            print(f"ERR  {name}: {e}")
            continue
        if name not in oracles:
            results[name] = {"rows": len(r), "err": "no_oracle"}
            n_noor += 1
            print(f"noor {name}: {len(r)} rows")
            continue
        try:
            o = _norm(con.execute(oracles[name]).fetch_df())
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle: {e}"}
            n_fail += 1
            print(f"ERR  {name} oracle: {e}")
            continue
        rows = len(r) == len(o)
        schema = list(r.columns) == list(o.columns)
        hash_m = rows and schema and _value_hash(r) == _value_hash(o)
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hash_m,
                         "spark_rows": len(r), "oracle_rows": len(o)}
        ok = rows and schema and hash_m
        n_pass += ok
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name}: rows {len(r)}/{len(o)} "
              f"schema={schema} hash={hash_m}")
    print(json.dumps({"pass": n_pass, "fail": n_fail, "no_oracle": n_noor}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

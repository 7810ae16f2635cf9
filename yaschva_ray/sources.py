"""Dataset sources/sinks.

The north rule targets Lance tables of interleaved documents; this container
has no ``lance``/``pylance`` package, so the Lance path is gated behind an
import-try with the same call signature — the pipeline code is
format-agnostic and switches on file layout.
"""

from __future__ import annotations

import os


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def clean_parquet_schema(path: str, columns: list[str] | None = None):
    """File schema with key-value metadata stripped (and pruned to
    ``columns`` when given).

    Pandas-written parquet carries a ``b'pandas'`` metadata blob that makes
    ``pa.Schema`` UNHASHABLE — every downstream block-schema unify then logs
    Ray's "Failed to hash the schemas (for deduplication)" warning and takes
    the slow path.  Passing this cleaned schema to ``read_parquet`` keeps
    every block schema hashable from the first stage on.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    full = pq.read_schema(path).remove_metadata()
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])


def read_docs(paths: list[str] | str, *, columns: list[str] | None = None,
              include_paths: bool = False, **kwargs):
    """Read an interleaved-doc table as a ``ray.data.Dataset``.

    * a ``.lance`` dataset directory → ``ray.data.read_lance`` (requires the
      ``lance`` package; raises a clear error here if absent),
    * ``.jsonl``/``.json`` → ``ray.data.read_json`` (+ column projection
      applied as a batch select — JSON has no pushdown),
    * ``.csv`` → ``ray.data.read_csv`` (same),
    * otherwise parquet file(s) → ``ray.data.read_parquet``.
    """
    import ray.data

    first = paths if isinstance(paths, str) else paths[0]
    s = str(first).rstrip("/")
    if s.endswith(".lance"):
        if not have_lance():
            raise ImportError(
                "Lance support requires the 'lance' package (not in this "
                "container); use parquet or install pylance")
        return ray.data.read_lance(first, columns=columns, **kwargs)
    if s.endswith((".jsonl", ".json")) or s.endswith(".csv"):
        reader = ray.data.read_csv if s.endswith(".csv") else ray.data.read_json
        ds = reader(paths, include_paths=include_paths, **kwargs)
        if columns:
            keep = list(columns) + (["path"] if include_paths else [])
            ds = ds.map_batches(lambda t: t.select(keep),
                                batch_format="pyarrow")
        return ds
    if "schema" not in kwargs and os.path.isfile(str(first)):
        kwargs["schema"] = clean_parquet_schema(str(first), columns)
    return ray.data.read_parquet(paths, columns=columns,
                                 include_paths=include_paths, **kwargs)


def write_docs(ds, path: str, *, format: str = "parquet", **kwargs) -> None:
    if format == "lance":
        if not have_lance():
            raise ImportError("Lance support requires the 'lance' package")
        return ds.write_lance(path, **kwargs)
    if format in ("jsonl", "json"):
        return ds.write_json(path, **kwargs)
    if format == "csv":
        return ds.write_csv(path, **kwargs)
    return ds.write_parquet(path, **kwargs)

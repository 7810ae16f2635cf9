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
    * ``.orc`` / ``.feather``/``.arrow``/``.ipc`` → one Ray task per file
      with pyarrow's native column pruning (Ray ships no reader for these),
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
    if s.endswith(".orc") or s.endswith((".feather", ".arrow", ".ipc")):
        # Ray ships no ORC / Arrow-IPC reader: distribute as one task per
        # file with column projection pushed into the pyarrow reader
        return _read_files_with(paths,
                                "orc" if s.endswith(".orc") else "feather",
                                columns)
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
    if format in ("orc", "feather"):
        return _write_blocks(ds, path, format)
    return ds.write_parquet(path, **kwargs)


_FILE_READ_REMOTE = None


def _read_files_with(paths, fmt: str, columns):
    """Distributed per-file read for formats Ray lacks natively (ORC,
    Arrow IPC/feather): one Ray task per file, column projection pushed
    into the task's pyarrow reader (both formats support native column
    pruning), assembled with ``from_arrow_refs``."""
    import glob as _glob

    import ray
    import ray.data

    if isinstance(paths, str):
        files = sorted(_glob.glob(paths)) if any(c in paths for c in "*?[") \
            else [paths]
    else:
        files = list(paths)

    global _FILE_READ_REMOTE
    if _FILE_READ_REMOTE is None:
        _FILE_READ_REMOTE = ray.remote(_read_one_file)
    return ray.data.from_arrow_refs(
        [_FILE_READ_REMOTE.remote(f, fmt, columns) for f in files])


def _read_one_file(f: str, fmt: str, columns):
    if fmt == "orc":
        import pyarrow.orc as orc

        return orc.ORCFile(f).read(columns=columns)
    import pyarrow.feather as feather

    return feather.read_table(f, columns=columns)


def _write_blocks(ds, path: str, fmt: str) -> None:
    """Per-block sink for formats Ray lacks natively: each block writes
    one file (tmp + atomic rename; unique names, so retries and reruns
    never interleave half-written parts)."""
    import uuid

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def w(t: pa.Table) -> pa.Table:
        out = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.{fmt}")
        tmp = out + ".tmp"
        if fmt == "orc":
            import pyarrow.orc as orc

            orc.write_table(t, tmp)
        else:
            import pyarrow.feather as feather

            feather.write_feather(t, tmp)
        os.replace(tmp, out)
        return pa.table({"path": pa.array([out]),
                         "rows": pa.array([t.num_rows], pa.int64())})

    for _ in ds.map_batches(w, batch_format="pyarrow",
                            batch_size=None).iter_batches():
        pass


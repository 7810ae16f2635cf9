"""Arrow IPC (de)serialization helpers for compact per-batch payload blobs
(violation tables, key partials, dangling-ref tables) carried as binary
columns through fused-stage rows."""

from __future__ import annotations

import pyarrow as pa


def ipc_bytes(table: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def ipc_table(data: bytes) -> pa.Table:
    with pa.ipc.open_stream(pa.BufferReader(data)) as r:
        return r.read_all()

"""Streaming per-column sketches (engine additions per the north rule):

* count / null count / min / max / sum,
* distinct via HyperLogLog (dense, p=14, ~16 KiB registers),
* quantiles via a merging t-digest,
* distribution drift vs a baseline sketch (PSI over quantile histogram +
  approximate KS from the quantile curves).

Usage pattern (SURVEY.md §7.1 step 6): a ``ColumnSketcher`` actor pool via
``map_batches(..., concurrency=(2, 8))`` emits ONE serialized partial-state
row per input batch; partials are tiny and are merged on the driver (or in a
tree) with ``merge_partials`` — a partial/final aggregation with no wide
shuffle.  Hashing is vectorized through polars (xxhash) — no per-row Python.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import os as _os

# Cap worker-side thread pools BEFORE polars/arrow spin theirs up: Ray's
# num_cpus accounting assumes one core per task — un-capped internal pools
# silently use every core, which both oversubscribes the node and falsifies
# parallelism-level comparisons (the "2-cpu" bench run would secretly use
# 32 cores for parquet decode / hashing).
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

try:  # vectorized hashing; fall back to numpy-only mixing for ints
    import polars as pl
except ImportError:  # pragma: no cover
    pl = None


def limit_worker_threads() -> None:
    """Call once per worker process (stage __init__ / task cache miss)."""
    import pyarrow as _pa

    try:
        _pa.set_cpu_count(1)
        _pa.set_io_thread_count(2)
    except Exception:  # pragma: no cover
        pass

HLL_P = 14
HLL_M = 1 << HLL_P


def _hash64(arr: pa.Array, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow array's values.

    LENGTH-PRESERVING: output has exactly ``len(arr)`` entries so callers may
    align it positionally with full-length tables (bucketize / fingerprint /
    uniqueness partials).  Null slots hash to a fixed deterministic value
    (polars hashes nulls; the numpy fallback hashes the NaN bit pattern).
    Callers that want nulls excluded (e.g. HLL distinct) drop them first.
    ``seed`` selects an INDEPENDENT hash family — callers that need >64
    collision bits (e.g. the 128-bit span-dedup fingerprints) combine two
    seeds instead of deriving the second hash from the first (a derived
    hash collides whenever the base does, so it adds zero bits).
    """
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    if pl is not None:
        s = pl.from_arrow(arr)
        if not isinstance(s, pl.Series):  # pragma: no cover
            s = s.to_series()
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    v = np.asarray(arr.cast(pa.float64()).to_numpy(zero_copy_only=False)).view(np.uint64)
    z = (v + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(29)
    return z


class HyperLogLog:
    """Dense HLL distinct-count sketch."""

    def __init__(self, registers: np.ndarray | None = None):
        self.registers = registers if registers is not None else np.zeros(HLL_M, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = (h << np.uint64(HLL_P)) | np.uint64(1 << (HLL_P - 1))
        # rank = leading zeros of remaining bits + 1, vectorized via float trick
        # use bit_length: 64 - floor(log2(rest)) ; rest guaranteed nonzero
        fl = np.frexp(rest.astype(np.float64))[1]  # exponent e: 2^(e-1) <= x < 2^e
        rank = (64 - fl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(HLL_M)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(est)


class TDigest:
    """Merging t-digest (Dunning) — quantile sketch with bounded size."""

    def __init__(self, compression: float = 200.0):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    def add(self, values: np.ndarray) -> None:
        values = values[np.isfinite(values)]
        if len(values) == 0:
            return
        self._buf.append(values.astype(np.float64))
        self._buf_n += len(values)
        if self._buf_n > 32768:
            self._compress()

    def _compress(self, force: bool = False) -> None:
        if not force and not self._buf and len(self.means):
            return  # already compact
        new = np.concatenate(self._buf) if self._buf else np.empty(0)
        means = np.concatenate([self.means, new])
        weights = np.concatenate([self.weights, np.ones(len(new))])
        self._buf, self._buf_n = [], 0
        if len(means) == 0:
            return
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # vectorized k1-scale clustering: k1(q) = (δ/2π)·asin(2q−1); points
        # whose k1 midpoints floor to the same integer merge into one centroid
        q_mid = (np.cumsum(weights) - weights / 2.0) / total
        k1 = (self.compression / (2.0 * np.pi)) * np.arcsin(
            np.clip(2.0 * q_mid - 1.0, -1.0, 1.0))
        ids = np.floor(k1).astype(np.int64)
        boundaries = np.nonzero(np.diff(ids))[0] + 1
        starts = np.concatenate([[0], boundaries])
        w_c = np.add.reduceat(weights, starts)
        m_c = np.add.reduceat(weights * means, starts) / w_c
        self.means = m_c
        self.weights = w_c

    def merge(self, other: "TDigest") -> None:
        self._compress()
        other._compress()
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress(force=True)

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        total = self.weights.sum()
        return float(np.interp(q * total, cum, self.means))

    def cdf(self, x: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        total = self.weights.sum()
        return float(np.interp(x, self.means, cum / total))


class LogHistogram:
    """Fixed-log-bin quantile sketch.

    Unlike a t-digest, bin counts are ADDITIVE and order-independent, so a
    merged sketch is bit-identical no matter how the data was batched or
    which partition processed it — required for byte-identical
    checkpoint-resume outputs.  48 bins/decade ⇒ ≤ ~5% relative quantile
    error; exact min/max clamp the tails.  Same interface as TDigest.
    """

    _PER_DECADE = 48
    _LO_EXP, _HI_EXP = -6, 15
    _POS_EDGES = np.logspace(_LO_EXP, _HI_EXP, (_HI_EXP - _LO_EXP) * _PER_DECADE + 1)
    # edges: (-inf, -pos_edges reversed, 0-, 0+, pos_edges, +inf)
    EDGES = np.concatenate([-_POS_EDGES[::-1], [0.0], _POS_EDGES])

    def __init__(self):
        self.counts = np.zeros(len(self.EDGES) + 1, dtype=np.int64)
        self.vmin = np.inf
        self.vmax = -np.inf

    def add(self, values: np.ndarray) -> None:
        values = values[np.isfinite(values)]
        if len(values) == 0:
            return
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        idx = np.searchsorted(self.EDGES, values, side="left")
        self.counts += np.bincount(idx, minlength=len(self.counts)).astype(np.int64)

    def merge(self, other: "LogHistogram") -> None:
        self.counts += other.counts
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)

    def _compress(self, force: bool = False) -> None:  # interface parity
        pass

    def _bin_bounds(self, i: int) -> tuple[float, float]:
        lo = self.EDGES[i - 1] if i > 0 else self.vmin
        hi = self.EDGES[i] if i < len(self.EDGES) else self.vmax
        return float(lo), float(hi)

    def quantile(self, q: float) -> float:
        total = self.counts.sum()
        if total == 0:
            return float("nan")
        target = q * total
        cum = np.cumsum(self.counts)
        i = int(np.searchsorted(cum, target, side="left"))
        prev = cum[i - 1] if i > 0 else 0
        frac = (target - prev) / max(self.counts[i], 1)
        lo, hi = self._bin_bounds(i)
        lo = max(lo, self.vmin)
        hi = min(hi, self.vmax)
        return float(np.clip(lo + frac * (hi - lo), self.vmin, self.vmax))

    def cdf(self, x: float) -> float:
        total = self.counts.sum()
        if total == 0:
            return float("nan")
        i = int(np.searchsorted(self.EDGES, x, side="left"))
        cum = np.cumsum(self.counts)
        prev = cum[i - 1] if i > 0 else 0
        lo, hi = self._bin_bounds(i)
        lo, hi = max(lo, self.vmin), min(hi, self.vmax)
        frac = 0.0 if hi <= lo else np.clip((x - lo) / (hi - lo), 0.0, 1.0)
        return float((prev + frac * self.counts[i]) / total)


class ColumnSketch:
    """Full per-column sketch state."""

    def __init__(self, numeric: bool):
        self.numeric = numeric
        self.count = 0
        self.nulls = 0
        self.hll = HyperLogLog()
        self.digest = LogHistogram() if numeric else None
        self.min: Any = None
        self.max: Any = None
        self.sum = 0.0

    def update(self, arr: pa.Array) -> None:
        self.count += len(arr)
        self.nulls += arr.null_count
        self.hll.add_hashes(_hash64(arr.drop_null()))
        if self.numeric:
            vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
            finite = vals[np.isfinite(vals)]
            if len(finite):
                self.digest.add(finite)
                self.sum += float(finite.sum())
                mn, mx = float(finite.min()), float(finite.max())
                self.min = mn if self.min is None else min(self.min, mn)
                self.max = mx if self.max is None else max(self.max, mx)
        else:
            valid = arr.drop_null()
            if len(valid):
                mn = pc.min(valid).as_py()
                mx = pc.max(valid).as_py()
                self.min = mn if self.min is None else min(self.min, mn)
                self.max = mx if self.max is None else max(self.max, mx)

    def merge(self, other: "ColumnSketch") -> None:
        self.count += other.count
        self.nulls += other.nulls
        self.hll.merge(other.hll)
        if self.numeric and other.digest is not None:
            self.digest.merge(other.digest)
            self.sum += other.sum
        for attr, fn in (("min", min), ("max", max)):
            a, b = getattr(self, attr), getattr(other, attr)
            setattr(self, attr, b if a is None else (a if b is None else fn(a, b)))

    def summary(self) -> dict:
        out = {
            "count": self.count,
            "nulls": self.nulls,
            "null_rate": self.nulls / self.count if self.count else 0.0,
            "distinct_est": round(self.hll.estimate()),
            "min": self.min,
            "max": self.max,
        }
        if self.numeric and self.count > self.nulls:
            out["sum"] = self.sum
            out["mean"] = self.sum / (self.count - self.nulls)
            out["quantiles"] = {q: self.digest.quantile(q) for q in (0.01, 0.25, 0.5, 0.75, 0.99)}
        return out


class ColumnSketcher:
    """Actor-pool ``map_batches`` stage: one serialized partial per batch.

    Stateful setup (column plan) happens once per actor in ``__init__``;
    per-batch work is fully vectorized.  Output schema:
    ``(column: string, state: binary)`` — a few KiB per row.
    """

    def __init__(self, columns: list[str] | None = None):
        self.columns = columns

    def _cols(self, batch: pa.Table) -> Iterable[tuple[str, pa.Array]]:
        names = self.columns or [
            f.name for f in batch.schema
            if pa.types.is_primitive(f.type) or pa.types.is_string(f.type)
        ]
        for name in names:
            if name in batch.column_names:
                col = batch[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                yield name, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        names: list[str] = []
        states: list[bytes] = []
        for name, arr in self._cols(batch):
            numeric = pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)
            sk = ColumnSketch(numeric)
            sk.update(arr)
            if sk.digest is not None:
                sk.digest._compress()
            names.append(name)
            states.append(pickle.dumps(sk))
        return pa.table({"column": pa.array(names, pa.string()),
                         "state": pa.array(states, pa.binary())})


def merge_partials(rows: list[dict]) -> dict[str, ColumnSketch]:
    """Merge serialized partial sketches (small; driver-side or tree).

    Partials are sorted before merging: t-digest merge is order-dependent,
    and resume requires byte-identical outputs regardless of block arrival
    order."""
    rows = sorted(rows, key=lambda r: (r["column"], r["state"]))
    merged: dict[str, ColumnSketch] = {}
    for row in rows:
        sk: ColumnSketch = pickle.loads(row["state"])
        if row["column"] in merged:
            merged[row["column"]].merge(sk)
        else:
            merged[row["column"]] = sk
    return merged


# --- drift ------------------------------------------------------------------


def psi(baseline: TDigest, current: TDigest, bins: int = 10) -> float:
    """Population Stability Index: current mass in baseline quantile bins."""
    inner_edges = [baseline.quantile(i / bins) for i in range(1, bins)]
    cuts = [0.0] + [current.cdf(e) for e in inner_edges] + [1.0]
    out = 0.0
    b = 1.0 / bins
    for i in range(bins):
        c = min(max(cuts[i + 1] - cuts[i], 1e-6), 1.0)
        out += (c - b) * np.log(c / b)
    return float(out)


def ks_statistic(a: TDigest, b: TDigest, points: int = 64) -> float:
    """Approximate Kolmogorov–Smirnov distance from two digests."""
    qs = np.linspace(0.01, 0.99, points)
    xs = np.unique(np.concatenate([[a.quantile(q) for q in qs], [b.quantile(q) for q in qs]]))
    xs = xs[np.isfinite(xs)]
    if len(xs) == 0:
        return 0.0
    return float(max(abs(a.cdf(x) - b.cdf(x)) for x in xs))


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries, Agarwal et al. 2012)
# --------------------------------------------------------------------------


def mg_summary(values: pa.Array, counts: np.ndarray, k: int) -> pa.Table:
    """Reduce exact (value, count) pairs to a k-counter Misra-Gries
    summary: subtract the (k+1)-th largest count from every counter and
    drop the non-positive ones.  The summary's ERROR BUDGET (the subtracted
    offset, ≤ N/(k+1) for N input occurrences) rides along as one row with
    a NULL value, so summaries stay plain mergeable tables: true count ∈
    [n, n + total budget] for any stored item, and any item whose true
    count exceeds the total budget is guaranteed present."""
    if len(counts) <= k:
        off = 0
    else:
        off = int(np.partition(counts,
                               len(counts) - k - 1)[len(counts) - k - 1])
    kept = counts - off
    pos = kept > 0
    vals = values.combine_chunks() if isinstance(values, pa.ChunkedArray) \
        else values
    return pa.table({
        "value": pa.concat_arrays([vals.filter(pa.array(pos)),
                                   pa.array([None], vals.type)]),
        "n": pa.array(np.append(kept[pos], off), pa.int64()),
    })


def mg_merge(parts: list, k: int) -> tuple[pa.Table, int]:
    """Merge Misra-Gries summaries: group-sum stored counts, pool the
    null-row budgets, reduce once more to k counters (the new offset adds
    to the budget).  Returns (summary (value, n) sorted by n desc then
    value, total error budget) — true count ∈ [n, n + budget]."""
    empty = pa.table({"value": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty, 0
    t = pa.concat_tables(parts).combine_chunks()
    nullmask = pc.is_null(t["value"])
    budget = int(pc.sum(t.filter(nullmask)["n"]).as_py() or 0)
    g = t.filter(pc.invert(nullmask)).group_by("value").aggregate(
        [("n", "sum")])
    ns = np.asarray(g["n_sum"].to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    if len(ns) <= k:
        off = 0
    else:
        off = int(np.partition(ns, len(ns) - k - 1)[len(ns) - k - 1])
    kept = ns - off
    pos = kept > 0
    vals = g["value"].combine_chunks() if isinstance(g["value"],
                                                     pa.ChunkedArray) \
        else g["value"]
    out = pa.table({"value": vals.filter(pa.array(pos)),
                    "n": pa.array(kept[pos], pa.int64())})
    order = pc.sort_indices(out, sort_keys=[("n", "descending"),
                                            ("value", "ascending")])
    return out.take(order), budget + off

"""Cardinality sketches: HyperLogLog approximate COUNT(DISTINCT).

The scale path beside the exact two-phase ``stages.agg.count_distinct``:
exact distinct must exchange the distinct-value vocabulary (fine when the
vocabulary is bounded, e.g. user ids per day; wrong when the column is
near-unique at 100 TB).  The HLL sketch is a fixed 2**p-byte register array
per block — each batch emits ONE row regardless of row count, the merge is an
elementwise max (associative + commutative, so any combine tree is exact),
and the driver folds block-count rows of 2**p bytes.

Standard HLL (Flajolet et al. 2007) with the linear-counting small-range
correction.  Hash = md5 (same deterministic, platform-independent choice as
the rest of the repo — no Python hash() salt, identical estimates across
runs and cluster sizes).  p=12 -> 4096 registers, ~1.6% relative error.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _registers_for(values, p: int) -> np.ndarray:
    """Max rank-of-leftmost-1 per register over the batch's values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for v in values:
        if v is None:
            continue
        h = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
        idx = h >> (64 - p)
        rest = h & ((1 << (64 - p)) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        rank = (64 - p) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:                      # small-range: linear counting
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return est


def approx_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate global COUNT(DISTINCT col) via a distributed HLL fold.

    Each batch reduces to one 2**p-byte register row (corpus bytes never
    move); the driver max-merges block-count rows.  Deterministic (md5) —
    the same input gives the same estimate at any parallelism."""
    def sketch(batch: pa.Table) -> pa.Table:
        regs = _registers_for(batch.column(col).to_pylist(), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        sketch, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in parts:
        merged = np.maximum(merged, np.frombuffer(r["regs"], dtype=np.uint8))
    return int(round(_estimate(merged)))


# --- count-min sketch + heavy hitters ----------------------------------------

def _cms_rows(values, depth: int, width: int) -> np.ndarray:
    """(depth, width) count matrix for one batch (md5-derived row hashes)."""
    cms = np.zeros((depth, width), dtype=np.int64)
    for v in values:
        if v is None:
            continue
        dig = hashlib.md5(str(v).encode()).digest()
        for d in range(depth):
            idx = int.from_bytes(dig[d * 4:d * 4 + 4], "big") % width
            cms[d, idx] += 1
    return cms


def _cms_estimate(cms: np.ndarray, v) -> int:
    dig = hashlib.md5(str(v).encode()).digest()
    width = cms.shape[1]
    return int(min(cms[d, int.from_bytes(dig[d * 4:d * 4 + 4], "big") % width]
                   for d in range(cms.shape[0])))


def approx_heavy_hitters(ds, col: str, k: int = 10, depth: int = 4,
                         width: int = 2048, candidates_per_block: int | None = None):
    """Approximate top-k frequent values via a distributed count-min sketch.

    The scale path beside the exact ``hash_aggregate`` count: exact top-k
    must exchange the full value vocabulary; here each block emits (a) ONE
    fixed-size (depth x width) int64 count matrix — merge is elementwise SUM,
    associative and layout-free — and (b) its local top candidates (bounded
    at ``candidates_per_block``, default 4k).  The driver folds block-count
    sketches plus a bounded candidate union and ranks candidates by their
    CMS estimate (>= true count, the classic one-sided CMS guarantee; a
    global top-k item is locally heavy in at least one block, so the
    candidate union covers it on skewed data — the regime heavy hitters are
    for).  Deterministic md5 hashing: same estimates at any parallelism.

    Returns list of (value, estimated_count) sorted by (-est, value)."""
    cpb = candidates_per_block or 4 * k

    def sketch(batch: pa.Table) -> pa.Table:
        vals = [v for v in batch.column(col).to_pylist() if v is not None]
        cms = _cms_rows(vals, depth, width)
        from collections import Counter
        top = Counter(vals).most_common(cpb)
        return pa.table({
            "cms": pa.array([cms.tobytes()] + [None] * len(top), pa.binary()),
            "cand": pa.array([None] + [str(v) for v, _ in top], pa.string()),
        })

    parts = ds.select_columns([col]).map_batches(
        sketch, batch_format="pyarrow").take_all()
    merged = np.zeros((depth, width), dtype=np.int64)
    cands: set[str] = set()
    for r in parts:
        if r["cms"] is not None:
            merged += np.frombuffer(r["cms"], dtype=np.int64).reshape(depth, width)
        elif r["cand"] is not None:
            cands.add(r["cand"])
    scored = sorted(((_cms_estimate(merged, c), c) for c in cands),
                    key=lambda t: (-t[0], t[1]))
    return [(c, est) for est, c in scored[:k]]

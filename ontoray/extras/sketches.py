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


# =============================================================================
# SQL-mirrored sketch family (driver-oracle-checkable)
#
# The fast paths above fold per-block sketches on the driver with md5-digest
# hashes that DuckDB cannot reproduce.  The variants below restate both
# sketches over the SAME algebra but with every hashed value =
# int(md5(key)[:15], 16) — reproducible in SQL — and the merge expressed as
# a ``hash_aggregate`` (max / sum) instead of a driver fold, so the driver
# can hash-check registers, counters AND estimates against DuckDB exactly.
# They also add per-group sketching (one register set per group key).
# =============================================================================

import math

# --- shared md5 hash ---------------------------------------------------------

def _md5_int60(values: list, salt: str | None = None) -> np.ndarray:
    """int(md5(f'{salt}:{v}')[:15], 16) per value — 60-bit non-negative
    int64, byte-identical to the DuckDB expression in the mirrors."""
    from ontoray.extras.fastmd5 import md5_int60
    pre = (f"{salt}:" if salt is not None else "").encode()
    return md5_int60([pre + str(v).encode() for v in values])


def sql_md5_int60(expr: str, salt: str | None = None) -> str:
    inner = f"'{salt}:' || {expr}" if salt is not None else expr
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"


# --- HyperLogLog -------------------------------------------------------------

HLL_B = 12                    # 2^12 = 4096 registers, ~1.6% standard error
HLL_M = 1 << HLL_B
_W_BITS = 60 - HLL_B          # low bits feeding rho
_RHO_MAX = _W_BITS + 1        # rho when the low word is all zeros


def _hll_partial(batch: pa.Table, key_col: str, group_col: str | None):
    """Per-batch register partials: (group?, j, reg) rows, one per touched
    register — the in-batch combiner that keeps the exchange sketch-sized.
    Register max via np.maximum.at over a dense (group, register) grid."""
    h = _md5_int60(batch.column(key_col).to_pylist())
    j = (h >> _W_BITS).astype(np.int64)
    w = h & ((np.int64(1) << _W_BITS) - 1)
    # rho = leading zeros of the 48-bit word + 1 = 49 - bit_length(w).
    # frexp is exact (no log2 rounding hazards at powers of two).
    _, e = np.frexp(w.astype(np.float64))
    rho = (_RHO_MAX - e).astype(np.int64)          # w == 0 -> e = 0 -> RHO_MAX
    if group_col is None:
        gid = np.zeros(len(h), np.int64)
        uniq = None
    else:
        import pandas as pd
        codes, uniq = pd.factorize(
            np.asarray(batch.column(group_col).to_pylist(), object))
        gid = codes.astype(np.int64)
    n_g = 1 if uniq is None else len(uniq)
    grid = np.zeros(n_g * HLL_M, np.int64)
    np.maximum.at(grid, gid * HLL_M + j, rho)
    nz = np.nonzero(grid)[0]
    cols = {"j": pa.array(nz % HLL_M, type=pa.int64()),
            "reg": pa.array(grid[nz], type=pa.int64())}
    if group_col is not None:
        cols = {group_col: pa.array(uniq.take(nz // HLL_M)), **cols}
    return pa.table(cols)


def hll_estimate(ds, key_col: str, group_col: str | None = None) -> pa.Table:
    """Distinct-count estimate per group: (group?, m, n_zero, harmonic_num,
    est).

    m/n_zero/harmonic_num are EXACT integers (harmonic_num = Σ_j 2^(RHO_MAX -
    reg_j), untouched registers contributing 2^RHO_MAX-at-reg-0 = 2^RHO_MAX
    ... i.e. Σ over all m registers of 2^(RHO_MAX - reg) with reg=0 for
    empty), so their hash check is rounding-free; est applies the standard
    HLL formula with the small-range linear-counting branch, rounded to 4
    decimals (both engines evaluate the identical double expression).
    """
    from ontoray.stages.agg import hash_aggregate

    keys = ([group_col] if group_col else []) + ["j"]
    reg = hash_aggregate(
        ds.map_batches(lambda b: _hll_partial(b, key_col, group_col),
                       batch_format="pyarrow"),
        keys, partial_aggs=[("reg", "max")],
        aggs=[("reg_max", "max")], rename={"reg_max_max": "reg"})

    rows = reg.take_all()    # sketch-bounded: <= n_groups * 4096 rows
    per: dict = {}
    for r in rows:
        per.setdefault(r[group_col] if group_col else "", []).append(r["reg"])
    out_g, out_m, out_z, out_s, out_e = [], [], [], [], []
    for g in sorted(per):
        regs = per[g]
        n_zero = HLL_M - len(regs)
        s_num = n_zero * (1 << _RHO_MAX) + sum(1 << (_RHO_MAX - r)
                                               for r in regs)
        alpha = 0.7213 / (1 + 1.079 / HLL_M)
        raw = alpha * HLL_M * HLL_M * float(1 << _RHO_MAX) / s_num
        if raw <= 2.5 * HLL_M and n_zero > 0:
            est = HLL_M * math.log(HLL_M / n_zero)
        else:
            est = raw
        out_g.append(g)
        out_m.append(HLL_M)
        out_z.append(n_zero)
        out_s.append(s_num)
        out_e.append(round(est, 4))
    cols = {"m": pa.array(out_m, pa.int64()),
            "n_zero": pa.array(out_z, pa.int64()),
            "harmonic_num": pa.array(out_s, pa.int64()),
            "est": pa.array(out_e, pa.float64())}
    if group_col:
        cols = {group_col: pa.array(out_g, pa.string()), **cols}
    return pa.table(cols)


def sql_hll_estimate(source_sql: str, key_expr: str,
                     group_col: str | None = None) -> str:
    """DuckDB mirror of ``hll_estimate`` over ``source_sql`` (a FROM-able
    subquery/table).  Identical registers (md5 60-bit hash, top-12-bit
    index, 49 - bit_length(rho-word)) and the identical estimate formula."""
    m, wb, rmax = HLL_M, _W_BITS, _RHO_MAX
    gsel = f"{group_col}, " if group_col else ""
    gby = f"GROUP BY {group_col}" if group_col else ""
    gby2 = f"{group_col}, " if group_col else ""
    alpha = f"(0.7213 / (1 + 1.079 / {m}))"
    raw = f"({alpha} * {m} * {m} * {float(1 << rmax)!r} / harmonic_num)"
    return f"""
    WITH src AS ({source_sql}),
    h AS (SELECT {gsel}{sql_md5_int60(key_expr)} AS h FROM src),
    r AS (SELECT {gsel}h >> {wb} AS j,
                 CASE WHEN (h & {(1 << wb) - 1}) = 0 THEN {rmax}
                      ELSE {rmax} - length(bin(h & {(1 << wb) - 1})) END AS rho
          FROM h),
    reg AS (SELECT {gsel}j, max(rho) AS reg FROM r GROUP BY {gby2}j),
    agg AS (SELECT {gsel}count(*) AS n_used,
                   sum((1::BIGINT << ({rmax} - reg))::BIGINT)::BIGINT AS s_used
            FROM reg {gby}),
    fin AS (SELECT {gsel}{m} AS m, ({m} - n_used) AS n_zero,
                   (({m} - n_used) * (1::BIGINT << {rmax}) + s_used)::BIGINT
                     AS harmonic_num
            FROM agg)
    SELECT {gsel}m, n_zero, harmonic_num,
           round(CASE WHEN {raw} <= 2.5 * {m} AND n_zero > 0
                      THEN {m} * ln({m}::DOUBLE / n_zero)
                      ELSE {raw} END, 4) AS est
    FROM fin
    """


# --- count-min sketch --------------------------------------------------------

CMS_D = 4
CMS_W = 1024


def _cms_partial(batch: pa.Table, key_col: str, d: int, w: int) -> pa.Table:
    """Per-batch counter partials: (i, j, c) rows via bincount — the sketch
    is d*w counters, so the exchange is sketch-sized regardless of input."""
    vals = batch.column(key_col).to_pylist()
    ii, jj, cc = [], [], []
    for i in range(d):
        j = _md5_int60(vals, salt=str(i)) % w
        cnt = np.bincount(j, minlength=w)
        nz = np.nonzero(cnt)[0]
        ii.extend([i] * len(nz))
        jj.extend(nz.tolist())
        cc.extend(cnt[nz].tolist())
    return pa.table({"i": pa.array(ii, pa.int64()),
                     "j": pa.array(jj, pa.int64()),
                     "c": pa.array(cc, pa.int64())})


def cms_sketch(ds, key_col: str, d: int = CMS_D, w: int = CMS_W):
    """Count-min sketch over ``key_col``: Dataset of (i, j, c), c > 0.
    Counter sums are associative — partitioning-invariant by construction."""
    from ontoray.stages.agg import hash_aggregate

    return hash_aggregate(
        ds.map_batches(lambda b: _cms_partial(b, key_col, d, w),
                       batch_format="pyarrow"),
        ["i", "j"], partial_aggs=[("c", "sum")],
        aggs=[("c_sum", "sum")], rename={"c_sum_sum": "c"})


def cms_heavy_hitters(ds, candidates_ds, key_col: str, cand_col: str,
                      threshold: int, d: int = CMS_D, w: int = CMS_W):
    """(key, est) for every candidate whose count-min estimate (min over the
    d rows of counter[i][h_i(key)]) reaches ``threshold``.

    The sketch (d*w ints) broadcasts via ``ray.put`` once; candidates stream
    through ``map_batches`` doing vectorized counter lookups — the classic
    two-pass heavy-hitter plan: sketch-build pass + candidate-probe pass,
    no corpus-scale exact count anywhere.
    """
    import ray

    sk = np.zeros((d, w), np.int64)
    for r in cms_sketch(ds, key_col, d, w).take_all():   # d*w-bounded
        sk[r["i"], r["j"]] = r["c"]
    bcast = ray.put(sk)

    def probe(batch: pa.Table) -> pa.Table:
        s = ray.get(bcast)
        vals = batch.column(cand_col).to_pylist()
        est = np.full(len(vals), np.iinfo(np.int64).max, np.int64)
        for i in range(d):
            j = _md5_int60(vals, salt=str(i)) % w
            est = np.minimum(est, s[i, j])
        keep = est >= threshold
        return pa.table({
            "key": pa.array([v for v, k in zip(vals, keep) if k], pa.string()),
            "est": pa.array(est[keep], pa.int64())})

    return candidates_ds.map_batches(probe, batch_format="pyarrow")


def sql_cms_heavy(source_sql: str, key_expr: str, threshold: int,
                  d: int = CMS_D, w: int = CMS_W) -> str:
    """DuckDB mirror of sketch-build + candidate-probe + threshold, with the
    candidate set = distinct keys of the source (what the query wires)."""
    return f"""
    WITH src AS ({source_sql}),
    keys AS (SELECT {key_expr} AS k FROM src),
    g AS (SELECT unnest(range({d})) AS i),
    sk AS (SELECT g.i,
                  ('0x' || substr(md5(g.i || ':' || keys.k), 1, 15))::BIGINT
                    % {w} AS j, count(*) AS c
           FROM keys CROSS JOIN g GROUP BY 1, 2),
    cand AS (SELECT DISTINCT k FROM keys),
    probe AS (SELECT cand.k, g.i,
                     ('0x' || substr(md5(g.i || ':' || cand.k), 1, 15))::BIGINT
                       % {w} AS j
              FROM cand CROSS JOIN g),
    est AS (SELECT probe.k AS key, min(sk.c) AS est
            FROM probe JOIN sk ON sk.i = probe.i AND sk.j = probe.j
            GROUP BY probe.k)
    SELECT key, est FROM est WHERE est >= {threshold}
    """

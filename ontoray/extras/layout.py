"""Data-layout operators: Z-order clustering + zone-map pruning evaluation.

The 100-TB read-path story: a table physically clustered on a Z-order
(Morton) curve over two filter columns gives every fixed-size block a tight
min/max zone map on BOTH columns at once, so a rectangle predicate prunes
most blocks at the read — the optimization behind lakehouse ``OPTIMIZE
ZORDER BY`` and multi-dimensional data skipping.  ``zorder_layout`` rewrites
nothing; it computes, for a chosen block size, the per-block zone maps the
clustered layout WOULD have, plus the scanned/pruned verdict for a probe
rectangle — the planning signal for whether re-clustering pays.

All arithmetic is integer-exact (8-bit equi-width quantization, explicit
bit interleave, floor division) so the DuckDB mirror hash-matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_QBITS = 8  # per-dimension quantization → 16-bit Morton codes


def _interleave16(xq: np.ndarray, yq: np.ndarray) -> np.ndarray:
    """Morton-interleave two 8-bit arrays; x takes the odd (high) bits."""
    z = np.zeros(len(xq), np.int64)
    for i in range(_QBITS):
        z += (((xq >> i) & 1) << (2 * i + 1)) + (((yq >> i) & 1) << (2 * i))
    return z


def _sql_interleave(xe: str, ye: str) -> str:
    terms = []
    for i in range(_QBITS):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_layout(ds, x_col: str, y_col: str, tie_col: str,
                  block_rows: int = 512, num_partitions: int = 16):
    """Per-block zone maps + probe-pruning verdict for the Z-order layout
    of ``ds`` clustered on (``x_col``, ``y_col``).

    Pipeline: (1) one streaming fold for the global extents; (2) per-batch
    8-bit equi-width quantization + Morton interleave; (3) distributed rank
    over (z, tie) — rows bucket by ``z >> 4`` (vocabulary-bounded at 4 096
    buckets), the driver prefix-sums bucket counts, each bucket
    ranks locally (the ``running_total`` offset pattern); (4) block id =
    (rn-1) // ``block_rows``, then a two-phase min/max/count fold per block;
    (5) the probe rectangle (the lower-left quarter of the extent square —
    deterministic, data-derived) marks each block scanned or pruned.

    Output: (blk, n, x_min, x_max, y_min, y_max, scanned).  The fraction of
    ``scanned`` blocks IS the layout's data-skipping quality; compare
    against ~100 % scanned for an uncorrelated natural order.

    Scale shape: raw rows shuffle ONCE, keyed on the small z int; every
    other exchange is vocabulary- or block-bounded; the driver holds only
    the <= 65 536-entry bucket-count map.  Cites the zone-map design of
    Moerkotte's small materialized aggregates (1998) and Delta OPTIMIZE
    ZORDER."""
    import pyarrow.compute as pc
    import ray

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    def extent_partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col)
        y = batch.column(y_col)
        return pa.table({
            "xmin": pa.array([pc.min(x).as_py()], pa.int64()),
            "xmax": pa.array([pc.max(x).as_py()], pa.int64()),
            "ymin": pa.array([pc.min(y).as_py()], pa.int64()),
            "ymax": pa.array([pc.max(y).as_py()], pa.int64())})

    parts = ds.map_batches(extent_partial, batch_format="pyarrow").take_all()
    xmin = min(r["xmin"] for r in parts)
    xmax = max(r["xmax"] for r in parts)
    ymin = min(r["ymin"] for r in parts)
    ymax = max(r["ymax"] for r in parts)
    xspan = (xmax - xmin) if xmax > xmin else 1
    yspan = (ymax - ymin) if ymax > ymin else 1
    # probe rectangle: the lower-left quarter of the extent square
    qx2 = xmin + (xmax - xmin) // 4
    qy2 = ymin + (ymax - ymin) // 4

    def derive(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.column(tie_col).to_numpy(zero_copy_only=False).astype(np.int64)
        xq = (x - xmin) * 255 // xspan
        yq = (y - ymin) * 255 // yspan
        z = _interleave16(xq, yq)
        return pa.table({
            "z": pa.array(z, pa.int64()),
            "zb": pa.array(z >> 4, pa.int64()),     # 4096 rank buckets
            "t": pa.array(t, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64())})

    derived = ds.map_batches(derive, batch_format="pyarrow").materialize()

    counts = hash_aggregate(
        derived.select_columns(["zb"]), ["zb"],
        partial_aggs=[("zb", "count")], aggs=[("zb_count", "sum")],
        rename={"zb_count_sum": "n"}).take_all()     # <= 4 096 rows
    counts.sort(key=lambda r: r["zb"])
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["zb"]] = acc
        acc += r["n"]
    off_ref = ray.put(offsets)

    def rank_z(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[g.column("zb")[0].as_py()]
        z = g.column("z").to_numpy(zero_copy_only=False)
        t = g.column("t").to_numpy(zero_copy_only=False)
        x = g.column("x").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        # (z, t, x, y): residual duplicate tie-keys still order rows
        # deterministically up to full-row equality (stats-invariant)
        order = np.lexsort((y, x, t, z))
        rn = off + np.arange(1, len(t) + 1)
        return pa.table({
            "blk": pa.array((rn - 1) // block_rows, pa.int64()),
            "x": pa.array(x[order], pa.int64()),
            "y": pa.array(y[order], pa.int64())})

    ranked = (derived.repartition(default_coalesce())
              .groupby("zb").map_groups(rank_z, batch_format="pyarrow"))

    blocks = hash_aggregate(
        ranked, ["blk"],
        partial_aggs=[("x", "min"), ("x", "max"),
                      ("y", "min"), ("y", "max"), ("blk", "count")],
        aggs=[("x_min", "min"), ("x_max", "max"),
              ("y_min", "min"), ("y_max", "max"), ("blk_count", "sum")],
        rename={"x_min_min": "x_min", "x_max_max": "x_max",
                "y_min_min": "y_min", "y_max_max": "y_max",
                "blk_count_sum": "n"},
        num_buckets=num_partitions)

    def verdict(batch: pa.Table) -> pa.Table:
        scanned = pc.and_(
            pc.and_(pc.greater_equal(batch.column("x_max"), xmin),
                    pc.less_equal(batch.column("x_min"), qx2)),
            pc.and_(pc.greater_equal(batch.column("y_max"), ymin),
                    pc.less_equal(batch.column("y_min"), qy2)))
        return pa.table({
            "blk": batch.column("blk"),
            "n": batch.column("n"),
            "x_min": batch.column("x_min"), "x_max": batch.column("x_max"),
            "y_min": batch.column("y_min"), "y_max": batch.column("y_max"),
            "scanned": scanned})

    return blocks.map_batches(verdict, batch_format="pyarrow")


def sql_zorder_layout(table: str, x_col: str, y_col: str, tie_expr: str,
                      block_rows: int = 512) -> str:
    """DuckDB mirror of ``zorder_layout``: identical integer quantization,
    the identical unrolled 16-term Morton interleave, row_number over
    (z, tie) and the same block fold + probe verdict."""
    inter = _sql_interleave("xq", "yq")
    return f"""
    WITH src AS (SELECT {x_col} AS x, {y_col} AS y, {tie_expr} AS t
                 FROM {table}),
    ext AS (SELECT min(x) AS xmin, max(x) AS xmax,
                   min(y) AS ymin, max(y) AS ymax,
                   CASE WHEN max(x) > min(x) THEN max(x) - min(x) ELSE 1 END
                     AS xspan,
                   CASE WHEN max(y) > min(y) THEN max(y) - min(y) ELSE 1 END
                     AS yspan,
                   min(x) + (max(x) - min(x)) // 4 AS qx2,
                   min(y) + (max(y) - min(y)) // 4 AS qy2
            FROM src),
    qz AS (SELECT t, x, y,
                  (x - ext.xmin) * 255 // ext.xspan AS xq,
                  (y - ext.ymin) * 255 // ext.yspan AS yq
           FROM src, ext),
    z AS (SELECT t, x, y, {inter} AS z FROM qz),
    r AS (SELECT x, y, row_number() OVER (ORDER BY z, t, x, y) AS rn
          FROM z),
    blocks AS (SELECT (rn - 1) // {block_rows} AS blk,
                      CAST(count(*) AS BIGINT) AS n,
                      min(x) AS x_min, max(x) AS x_max,
                      min(y) AS y_min, max(y) AS y_max
               FROM r GROUP BY 1)
    SELECT b.blk, b.n, b.x_min, b.x_max, b.y_min, b.y_max,
           (b.x_max >= ext.xmin AND b.x_min <= ext.qx2
            AND b.y_max >= ext.ymin AND b.y_min <= ext.qy2) AS scanned
    FROM blocks b, ext
    """

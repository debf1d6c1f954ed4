"""Distributed graph analytics over the extracted triple graph.

``pagerank`` — concept-importance ranking over (src, dst) edges: the
power-iteration PageRank shape, as the reference ranks learned concepts for
review by degree/confidence (src/analysis/*, top_k_evaluation.py) but with a
real link-analysis score.

Exact-arithmetic contract: all rank mass is int64 fixed-point
(SCALE = 10^12), every division is integer floor division — so the result is
bit-identical no matter how edges were partitioned (integer sums are
associative; float PageRank would drift per partitioning) AND identical to
the DuckDB mirror (``ontoray.queries.sql_kg_pagerank``), which evaluates the
same recurrence in BIGINT/HUGEINT.

Scale shape per iteration: ONE streaming pass over the (materialized,
vocabulary-bounded) distinct-edge table computing per-edge contributions with
a broadcast rank array (ray.put once per iteration, vectorized index_in +
take lookup), then one dst-vocabulary-scale exchange (hash_aggregate sum).
Ranks/outdegrees are node-vocabulary-bounded — the same broadcast regime as
the linker's alias dictionary; a vocabulary beyond driver memory would swap
the broadcast lookup for stages/joins.hash_join on src, leaving the
iteration structure unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio


def distinct_edges(ds, src_col: str = "src", dst_col: str = "dst"):
    """Distinct (src, dst) pairs via the bucketed vectorized aggregate."""
    from ontoray.stages.agg import hash_aggregate

    def pairs(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column(src_col),
                         "dst": batch.column(dst_col)})

    return hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"), ["src", "dst"],
        partial_aggs=[("src", "count")],
        aggs=[("src_count", "sum")], rename={"src_count_sum": "__n"},
    ).select_columns(["src", "dst"])


def pagerank(edges_ds, iters: int = 5, src_col: str = "src",
             dst_col: str = "dst") -> pa.Table:
    """Fixed-point PageRank over the distinct (src, dst) edge set.

    r0 = SCALE // N for every node; each iteration
    r' = (15*SCALE)//(100*N) + (85 * sum_{(u,v) in E} r_u // outdeg_u) // 100.
    Dangling-node mass is dropped (the standard simplification — documented,
    and mirrored identically in SQL).  Returns (name, rank) with rank the
    int64 fixed-point score.
    """
    import ray

    from ontoray.stages.agg import hash_aggregate
    from ontoray.util import column_lists

    ep = distinct_edges(edges_ds, src_col, dst_col).materialize()

    # Node vocabulary + out-degrees: node-scale collects (bounded by the
    # concept vocabulary, not the corpus).
    deg_rows = column_lists(
        hash_aggregate(ep.select_columns(["src"]), ["src"],
                       partial_aggs=[("src", "count")],
                       aggs=[("src_count", "sum")],
                       rename={"src_count_sum": "od"}),
        ["src", "od"])
    outdeg = dict(zip(deg_rows["src"], deg_rows["od"]))

    def names_only(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"name": batch.column(col)})
        return fn

    node_ds = hash_aggregate(
        ep.map_batches(names_only("src"), batch_format="pyarrow")
          .union(ep.map_batches(names_only("dst"), batch_format="pyarrow")),
        ["name"], partial_aggs=[("name", "count")],
        aggs=[("name_count", "sum")], rename={"name_count_sum": "__n"})
    names = sorted(column_lists(node_ds, ["name"])["name"])
    n = len(names)
    if n == 0:
        return pa.table({"name": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64())})

    base = (15 * SCALE) // (100 * n)
    rank = {name: SCALE // n for name in names}
    keys_arr = pa.array(names, pa.string())
    od_arr = np.array([outdeg.get(m, 1) for m in names], np.int64)  # 1 guards
    # dangling nodes (never looked up as src of an edge, so the value is moot)

    for _ in range(iters):
        rank_np = np.array([rank[m] for m in names], np.int64)
        bcast = ray.put((keys_arr, rank_np, od_arr))

        def contrib(batch: pa.Table) -> pa.Table:
            k, r, od = ray.get(bcast)
            idx = pc.index_in(batch.column("src"), value_set=k)\
                    .to_numpy(zero_copy_only=False).astype(np.int64)
            c = r[idx] // od[idx]
            return pa.table({"dst": batch.column("dst"),
                             "c": pa.array(c, pa.int64())})

        sums = column_lists(
            hash_aggregate(ep.map_batches(contrib, batch_format="pyarrow"),
                           ["dst"], partial_aggs=[("c", "sum")],
                           aggs=[("c_sum", "sum")], rename={"c_sum_sum": "c"}),
            ["dst", "c"])
        incoming = dict(zip(sums["dst"], sums["c"]))
        rank = {m: base + (DAMP_NUM * incoming.get(m, 0)) // DAMP_DEN
                for m in names}

    return pa.table({"name": pa.array(names, pa.string()),
                     "rank": pa.array([rank[m] for m in names], pa.int64())})

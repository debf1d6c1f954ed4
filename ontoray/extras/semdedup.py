"""SemDeDup — semantic deduplication via within-cluster embedding cosine
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540).

The published recipe: k-means the corpus embeddings, then compare pairs ONLY
within each cluster and drop all but one of every semantic-duplicate group.
Pairwise cost falls from O(n^2) to sum |cluster|^2 — k scales with the corpus
so clusters stay bounded (the paper uses k = 11k on LAION-440M, ~40k
vectors/cluster).

Ray-Data composition (no new distributed machinery):
- clustering = ``kmeans_fixed`` (exact int64 fixed-point Lloyd; centroids
  broadcast once per round, corpus never shuffles);
- ONE corpus pass assigns clusters and carries the quantized vectors;
- ONE cluster-keyed exchange, then per-cluster vectorized pairwise cosine
  inside ``map_groups``.

Determinism contract (hash-equal to the DuckDB mirror at any parallelism):
vectors quantize once to int64 (the KM_SCALE contract), dots and norms are
exact int64, and the threshold test is EXACT integer arithmetic —
``dot > 0 AND dot^2 * den^2 >= num^2 * |a|^2 * |b|^2`` evaluated in Python
ints / SQL HUGEINT — so no float rounding can flip a boundary pair.  A float
cosine PREFILTER (with margin) picks candidates; only candidates pay the
bigint confirm.

Duplicate rule: a vector is a duplicate iff SOME lower-id vector in its
cluster is within the cosine threshold ("keep first" greedy — the paper
keeps one exemplar per group; lowest-id is the deterministic choice, and the
EXISTS shape is what the SQL mirror states directly).

Reference basis: the reference dedups concepts by embedding similarity
inside its LLM linker (src/enhanced_concept_matcher.py match loop); this is
the corpus-scale, model-free analog over the synthetic embeddings table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ontoray.extras.kmeans import KM_SCALE, kmeans_fixed, sql_kmeans_ctes


def semdedup(ds, k: int = 8, iters: int = 3, seed: int = 42,
             threshold_num: int = 45, threshold_den: int = 100,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """(vec_id, cluster, is_dup) for every vector; ``is_dup`` marks vectors
    with a lower-id within-threshold neighbor in the same cluster.
    Threshold is the rational ``threshold_num/threshold_den`` (default 0.45)
    so the boundary test stays exact on both engine and SQL sides."""
    import ray

    from ontoray.stages.agg import default_coalesce

    assert 0 < threshold_num <= threshold_den
    _, cents, qds = kmeans_fixed(ds, k, iters, seed, id_col, vec_col,
                                 return_centroids=True)
    bcast = ray.put(cents)

    def with_cluster(batch: pa.Table) -> pa.Table:
        C = ray.get(bcast)
        q = np.floor(np.array(batch.column(vec_col).to_pylist(),
                              dtype=np.float64) * KM_SCALE + 0.5).astype(np.int64)
        # exact integer squared L2; argmin first-hit = lowest cluster id on
        # ties — identical to kmeans_fixed's final assignment.
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            "vec_id": batch.column(id_col),
            "cluster": pa.array(d2.argmin(axis=1), pa.int64()),
            "qv": pa.array(q.tolist(), pa.list_(pa.int64())),
        })

    rows = qds.map_batches(with_cluster, batch_format="pyarrow")
    tn2 = threshold_num * threshold_num
    td2 = threshold_den * threshold_den
    thf = threshold_num / threshold_den

    def dedup_group(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("vec_id").to_pylist(), dtype=np.int64)
        Q = np.array(g.column("qv").to_pylist(), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, Q = ids[order], Q[order]
        norms = (Q * Q).sum(axis=1)                  # int64-exact
        dots = Q @ Q.T                               # int64-exact
        nf = np.sqrt(norms.astype(np.float64))
        nf[nf == 0] = 1.0
        cosf = dots / (nf[:, None] * nf[None, :])
        n = len(ids)
        is_dup = np.zeros(n, dtype=bool)
        for i in range(1, n):
            for j in np.flatnonzero(cosf[i, :i] >= thf - 1e-9):
                d = int(dots[i, j])
                if d > 0 and d * d * td2 >= tn2 * int(norms[i]) * int(norms[j]):
                    is_dup[i] = True
                    break
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array([g.column("cluster")[0].as_py()] * n, pa.int64()),
            "is_dup": pa.array(is_dup.tolist(), pa.bool_()),
        })

    return (rows.repartition(default_coalesce())
            .groupby("cluster").map_groups(dedup_group, batch_format="pyarrow"))


def sql_semdedup(k: int = 8, iters: int = 3, seed: int = 42,
                 threshold_num: int = 45, threshold_den: int = 100,
                 table: str = "embeddings") -> str:
    """DuckDB mirror of ``semdedup``: the unrolled k-means CTE chain, then a
    within-cluster lower-id self-join with the identical exact-integer
    threshold test (HUGEINT — dot^2 and |a|^2*|b|^2 overflow int64 at
    ~dim * (8*KM_SCALE)^2)."""
    ctes, final = sql_kmeans_ctes(k, iters, seed, table)
    tn2 = threshold_num * threshold_num
    td2 = threshold_den * threshold_den
    ctes.append(
        f"qa AS (SELECT a.vec_id, a.cl AS cluster, q.qv, "
        f"list_sum(list_transform(q.qv, x -> x * x)) AS nrm "
        f"FROM {final} a JOIN q USING (vec_id))")
    ctes.append(
        "pr AS (SELECT a.vec_id AS va, b.vec_id AS vb, a.nrm AS na, b.nrm AS nb, "
        "list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS dt "
        "FROM qa a JOIN qa b ON b.cluster = a.cluster AND b.vec_id < a.vec_id)")
    return ("WITH " + ", ".join(ctes) + f"""
    SELECT q.vec_id, q.cluster,
           coalesce(bool_or(p.dt > 0 AND
                            CAST(p.dt AS HUGEINT) * p.dt * {td2} >=
                            CAST({tn2} AS HUGEINT) * p.na * p.nb), FALSE) AS is_dup
    FROM qa q LEFT JOIN pr p ON p.va = q.vec_id
    GROUP BY q.vec_id, q.cluster
    """)

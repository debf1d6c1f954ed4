"""Distributed Lloyd k-means over the embeddings table — iterative ML as a
Ray Data pipeline, in EXACT int64 fixed-point arithmetic.

Why fixed-point: float centroid updates are order-sensitive (non-associative
sums), so the result would depend on block layout.  Here vectors quantize
once to int64 (floor(x * 1e6 + 0.5), the grouped_centroids contract), every
distance is an integer, argmin ties break to the lowest cluster id, and
centroid means are integer floor division — the assignment after any number
of rounds is bit-identical at any parallelism AND hash-equal to the DuckDB
mirror (``sql_kmeans``), which unrolls the same recurrence as chained CTEs.

Per-iteration scale shape (the textbook distributed Lloyd plan):
- centroids (k × dim int64) broadcast once via ``ray.put``;
- ONE streaming pass over the corpus computes assignments + per-(cluster,
  pos) partial sums inside ``map_batches`` (vectorized (n, k, dim) numpy);
- ONE k×dim-bounded ``hash_aggregate`` exchange finishes the update — no
  corpus bytes ever shuffle.
Seeding: the k rows with the smallest md5(vec_id || ':seed') rank (hex
string compare ≡ SQL VARCHAR compare) — a deterministic uniform sample,
gathered with the local-top-k + tiny-global-merge pattern.

Reference basis: the reference clusters concept embeddings with sklearn
KMeans(n_clusters=min(8, n//5), random_state=42) for its ontology views
(reference src/schema_ontology_visualizer.py:301-319,
create_embedding_clusters); this is the at-scale distributed equivalent
over the synthetic ``embeddings`` table, with determinism coming from
fixed-point arithmetic + md5 seeding instead of a library RNG.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

KM_SCALE = 10**6


def _quantize(batch: pa.Table, vec_col: str) -> np.ndarray:
    vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
    return np.floor(vecs * KM_SCALE + 0.5).astype(np.int64)


def _seed_centroids(ds, k: int, seed: int, id_col: str, vec_col: str):
    """k quantized seed vectors by md5(vec_id || ':seed') rank: per-batch
    local top-k, then a (num_batches*k)-row driver merge."""
    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ranks = [hashlib.md5(f"{i}:{seed}".encode()).hexdigest() for i in ids]
        order = sorted(range(len(ids)), key=lambda j: (ranks[j], ids[j]))[:k]
        q = _quantize(batch, vec_col)
        return pa.table({
            "rank": pa.array([ranks[j] for j in order], pa.string()),
            "vid": pa.array([ids[j] for j in order], pa.int64()),
            "qv": pa.array([q[j].tolist() for j in order],
                           pa.list_(pa.int64()))})

    cand = sorted(((r["rank"], r["vid"], r["qv"]) for r in
                   ds.map_batches(local, batch_format="pyarrow").take_all()))
    return np.array([qv for _, _, qv in cand[:k]], dtype=np.int64)


def kmeans_fixed(ds, k: int = 8, iters: int = 3, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 return_centroids: bool = False):
    """``iters`` assignment rounds / ``iters``-1 centroid updates; returns
    the final assignment Dataset (vec_id, cluster).  Empty clusters keep
    their previous centroid (mirrored with LEFT JOIN + coalesce in SQL)."""
    import ray

    from ontoray.stages.agg import hash_aggregate
    from ontoray.util import column_lists

    # Materialize ONCE (r2 ADVICE): seeding + every update round + the final
    # assignment each stream over ``ds``, so a lazy input pipeline (parquet
    # read etc.) would otherwise re-execute iters+1 times.  Mirrors
    # pagerank's ep.materialize().  Only the needed columns are pinned.
    ds = ds.select_columns([id_col, vec_col]).materialize()
    cents = _seed_centroids(ds, k, seed, id_col, vec_col)
    dim = cents.shape[1]

    def assign(batch: pa.Table, C: np.ndarray) -> np.ndarray:
        q = _quantize(batch, vec_col)
        # (n, k) exact integer squared L2; argmin takes the first (lowest
        # cluster id) on ties.
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return q, d2.argmin(axis=1)

    for t in range(1, iters):
        bcast = ray.put(cents)

        def cells(batch: pa.Table) -> pa.Table:
            C = ray.get(bcast)
            q, cl = assign(batch, C)
            out_c, out_p, out_s, out_n = [], [], [], []
            for c in np.unique(cl):
                mask = cl == c
                s = q[mask].sum(axis=0)
                out_c.extend([int(c)] * dim)
                out_p.extend(range(dim))
                out_s.extend(int(x) for x in s)
                out_n.extend([int(mask.sum())] * dim)
            return pa.table({"cl": pa.array(out_c, pa.int64()),
                             "pos": pa.array(out_p, pa.int64()),
                             "s": pa.array(out_s, pa.int64()),
                             "n": pa.array(out_n, pa.int64())})

        agg = column_lists(
            hash_aggregate(ds.map_batches(cells, batch_format="pyarrow"),
                           ["cl", "pos"],
                           partial_aggs=[("s", "sum"), ("n", "sum")],
                           aggs=[("s_sum", "sum"), ("n_sum", "sum")],
                           rename={"s_sum_sum": "s", "n_sum_sum": "n"}),
            ["cl", "pos", "s", "n"])
        new = cents.copy()                      # empty clusters carry forward
        for c, p, s, n in zip(agg["cl"], agg["pos"], agg["s"], agg["n"]):
            # python // is true floor division — matches the SQL floor-div
            # spelling (DuckDB // truncates; the mirror corrects negatives)
            new[c, p] = s // n
        cents = new

    bcast = ray.put(cents)

    def final(batch: pa.Table) -> pa.Table:
        C = ray.get(bcast)
        _, cl = assign(batch, C)
        return pa.table({"vec_id": batch.column(id_col),
                         "cluster": pa.array(cl, pa.int64())})

    out = ds.map_batches(final, batch_format="pyarrow")
    if return_centroids:
        # (assignment, final int64 centroids, the materialized quantizable
        # input) — the exact-IVF consumer recomputes assignments per pass
        # against these centroids instead of joining the assignment back.
        return out, cents, ds
    return out


def kmeans_outliers(ds, k: int = 8, iters: int = 3, seed: int = 42,
                    topn: int = 25, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> pa.Table:
    """Global top-``topn`` embedding outliers by exact integer squared
    distance to their own (final) k-means centroid — the distance-based
    quality scan a curation pass runs before training (garbage vectors,
    mojibake embeddings, wrong-modality rows all surface at the tail).

    Output (vec_id, cluster, d2), ordered by (d2 DESC, vec_id).  Exactness:
    distances are int64 on quantized vectors against the same final
    centroids the assignment used, so the mirror (``sql_kmeans_outliers``)
    reproduces rows AND order bit-for-bit.

    Scale shape: the k-means rounds are ``kmeans_fixed``; the scan is ONE
    extra streaming pass with the k×dim centroid broadcast, keeping a
    per-block top-``topn`` (the ann local-top-k + tiny-global-merge
    pattern) — the driver merges blocks × topn candidate rows only."""
    import ray

    _, cents, dsq = kmeans_fixed(ds, k, iters, seed, id_col, vec_col,
                                 return_centroids=True)
    bcast = ray.put(cents)

    def local_top(batch: pa.Table) -> pa.Table:
        C = ray.get(bcast)
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        q = _quantize(batch, vec_col)
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        dmin = d2[np.arange(len(cl)), cl]
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, -dmin))[:topn]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "cluster": pa.array(cl[order], pa.int64()),
                         "d2": pa.array(dmin[order], pa.int64())})

    cand = sorted(
        ((r["d2"], r["vec_id"], r["cluster"]) for r in
         dsq.map_batches(local_top, batch_format="pyarrow").take_all()),
        key=lambda t: (-t[0], t[1]))[:topn]
    return pa.table({
        "vec_id": pa.array([c[1] for c in cand], pa.int64()),
        "cluster": pa.array([c[2] for c in cand], pa.int64()),
        "d2": pa.array([c[0] for c in cand], pa.int64())})


def sql_kmeans_ctes(k: int = 8, iters: int = 3, seed: int = 42,
                    table: str = "embeddings") -> tuple[list[str], str]:
    """The unrolled k-means CTE list and the name of the final-assignment
    CTE — shared by ``sql_kmeans`` and the exact-IVF mirror
    (queries.sql_ann_ivf)."""
    d2 = ("list_sum(list_transform(list_zip(q.qv, c.qv), "
          "p -> (p[1] - p[2]) * (p[1] - p[2])))")
    ctes = [
        f"q AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE} + 0.5) AS BIGINT)) "
        f"AS qv FROM {table})",
        f"sd AS (SELECT qv, row_number() OVER "
        f"(ORDER BY md5(vec_id || ':{seed}'), vec_id) - 1 AS cl FROM q)",
        f"c0 AS (SELECT cl, qv FROM sd WHERE cl < {k})",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"a{t} AS (SELECT vec_id, cl FROM ("
            f"SELECT q.vec_id, c.cl, row_number() OVER ("
            f"PARTITION BY q.vec_id ORDER BY {d2}, c.cl) AS rn "
            f"FROM q CROSS JOIN c{t-1} c) WHERE rn = 1)")
        if t == iters:
            break
        ctes.append(
            f"cell{t} AS (SELECT a.cl, t.pos, "
            f"CAST(sum(q.qv[t.pos]) AS BIGINT) AS s, count(*) AS n "
            f"FROM a{t} a JOIN q USING (vec_id), "
            f"unnest(generate_series(1, len(q.qv))) AS t(pos) "
            f"GROUP BY 1, 2)")
        ctes.append(
            f"cent{t} AS (SELECT cl, list(ms ORDER BY pos) AS qv FROM ("
            f"SELECT cl, pos, s // n - CASE WHEN s % n <> 0 AND s < 0 "
            f"THEN 1 ELSE 0 END AS ms FROM cell{t}) GROUP BY cl)",)
        ctes.append(
            f"c{t} AS (SELECT c.cl, coalesce(u.qv, c.qv) AS qv "
            f"FROM c{t-1} c LEFT JOIN cent{t} u USING (cl))")
    return ctes, f"a{iters}"


def sql_kmeans(k: int = 8, iters: int = 3, seed: int = 42,
               table: str = "embeddings") -> str:
    """DuckDB mirror of ``kmeans_fixed``: identical quantization, md5 seed
    ranks, integer distances (list_zip lambda), floor-division centroid
    means, lowest-cluster tie-break — unrolled over ``iters`` rounds."""
    ctes, final = sql_kmeans_ctes(k, iters, seed, table)
    return "WITH " + ", ".join(ctes) + f" SELECT vec_id, cl AS cluster FROM {final}"


def sql_kmeans_outliers(k: int = 8, iters: int = 3, seed: int = 42,
                        topn: int = 25, table: str = "embeddings") -> str:
    """DuckDB mirror of ``kmeans_outliers``: the kmeans CTE chain plus one
    distance scan against the final centroids (c{iters-1}) with the
    identical (d2 DESC, vec_id) order."""
    ctes, _final = sql_kmeans_ctes(k, iters, seed, table)
    d2 = ("list_sum(list_transform(list_zip(q.qv, c.qv), "
          "p -> (p[1] - p[2]) * (p[1] - p[2])))")
    return (
        "WITH " + ", ".join(ctes) +
        f", od AS (SELECT vec_id, cl, d2 FROM ("
        f"SELECT q.vec_id, c.cl, {d2} AS d2, row_number() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {d2}, c.cl) AS rn "
        f"FROM q CROSS JOIN c{iters-1} c) WHERE rn = 1) "
        f"SELECT vec_id, cl AS cluster, CAST(d2 AS BIGINT) AS d2 FROM od "
        f"ORDER BY d2 DESC, vec_id LIMIT {topn}")

"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk`` — the exactness baseline: the query matrix is
  broadcast (``ray.put`` once, read per actor), each batch computes cosine
  via one float64 matmul and emits only its LOCAL top-k; the global answer is
  a tiny sort over ``num_batches × k`` partials, so the full score matrix
  never materializes.
* ``lsh_topk`` — the scale path: sign-projection LSH buckets (same hashing as
  extras.dedup.SignLSH); only the query's bucket (and optional neighboring
  probes) is scanned.

Cosine is computed in float64 from the stored float32 values and rounded to 6
decimals at the output boundary so the DuckDB ``list_cosine_similarity``
oracle matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def query_vector(dim: int, seed: int = 123) -> np.ndarray:
    """Deterministic benchmark query vector (unit-norm float64)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


class BatchTopK:
    """Per-batch cosine top-k against a broadcast query vector."""

    def __init__(self, query_ref, k: int):
        self.q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1) * np.linalg.norm(self.q)
        norms[norms == 0] = 1.0
        sims = (vecs @ self.q) / norms
        k = min(self.k, len(ids))
        idx = np.argpartition(-sims, k - 1)[:k] if k > 0 else np.array([], dtype=int)
        return pa.table({
            "vec_id": pa.array(ids[idx], pa.int64()),
            "cosine": pa.array(np.round(sims[idx], 6), pa.float64()),
        })


def brute_force_topk(ds, query: np.ndarray, k: int = 10, concurrency: int = 4):
    """Global cosine top-k: local top-k per batch -> tiny global sort.
    Deterministic tie-break: (-cosine, vec_id)."""
    qref = ray.put(query)
    partials = ds.map_batches(BatchTopK, fn_constructor_args=(qref, k),
                              batch_format="pyarrow", concurrency=(1, concurrency))
    rows = partials.take_all()
    rows.sort(key=lambda r: (-r["cosine"], r["vec_id"]))
    top = rows[:k]
    return pa.table({
        "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
        "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
    })


def query_matrix(m: int, dim: int, seed: int = 123) -> np.ndarray:
    """Deterministic benchmark query matrix (m unit-norm float64 rows)."""
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((m, dim))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


class BatchTopKMulti:
    """Per-batch cosine top-k against a broadcast query MATRIX: one
    (batch x dim) @ (dim x m) matmul scores every query at once; each query
    emits only its local top-k, selected under the FINAL comparator
    (-rounded cosine, vec_id) so the local->global merge is exact even
    through 1e-6 ties at the cut."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qt = q.T                           # (dim, m)
        self.qn = np.linalg.norm(q, axis=1)
        self.qn[self.qn == 0] = 1.0
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        vn = np.linalg.norm(vecs, axis=1)
        vn[vn == 0] = 1.0
        # Norm division AFTER the dot product — the same op order as
        # list_cosine_similarity (dot / (|v|*|q|)), like the single-query path.
        sims = np.round((vecs @ self.qt) / (vn[:, None] * self.qn[None, :]), 6)
        k = min(self.k, len(ids))
        qids, vids, coss = [], [], []
        for j in range(sims.shape[1]):
            order = np.lexsort((ids, -sims[:, j]))[:k]
            qids.extend([j] * k)
            vids.extend(ids[order])
            coss.extend(sims[order, j])
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "vec_id": pa.array(vids, pa.int64()),
                         "cosine": pa.array(coss, pa.float64())})


def brute_force_topk_multi(ds, queries: np.ndarray, k: int = 10,
                           concurrency: int = 4):
    """Batched-query exact cosine top-k: the query matrix is broadcast once
    (``ray.put``), each batch does ONE matmul for all m queries and emits
    m x k local rows; the global answer is a driver sort over
    num_batches x m x k partials (query-count-scale, never corpus-scale).
    Returns (query_id, vec_id, cosine) ordered by (query_id, -cosine,
    vec_id)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(BatchTopKMulti, fn_constructor_args=(qref, k),
                              batch_format="pyarrow", concurrency=(1, concurrency))
    rows = partials.take_all()
    rows.sort(key=lambda r: (r["query_id"], -r["cosine"], r["vec_id"]))
    out = []
    last_q, taken = None, 0
    for r in rows:
        if r["query_id"] != last_q:
            last_q, taken = r["query_id"], 0
        if taken < k:
            out.append(r)
        taken += 1
    return pa.table({
        "query_id": pa.array([r["query_id"] for r in out], pa.int64()),
        "vec_id": pa.array([r["vec_id"] for r in out], pa.int64()),
        "cosine": pa.array([r["cosine"] for r in out], pa.float64()),
    })


class _AssignCentroid:
    """Per-batch nearest-centroid assignment against a broadcast matrix."""

    def __init__(self, cent_ref):
        self.c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.cn = np.linalg.norm(self.c, axis=1)
        self.cn[self.cn == 0] = 1.0

    def _assign(self, batch: pa.Table) -> np.ndarray:
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        sims = (vecs / norms[:, None]) @ (self.c / self.cn[:, None]).T
        return np.argmax(sims, axis=1), vecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cluster", pa.array([], pa.int64()))
        assign, _ = self._assign(batch)
        return batch.append_column("cluster", pa.array(assign.astype(np.int64)))


class _CentroidPartial(_AssignCentroid):
    """Lloyd-step combiner: per-batch (cluster, vector sum, count) partials —
    k rows leave each batch regardless of batch size."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = len(self.c)
        if batch.num_rows == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "vsum": pa.array([], pa.list_(pa.float64())),
                             "n": pa.array([], pa.int64())})
        assign, vecs = self._assign(batch)
        sums = np.zeros((k, vecs.shape[1]))
        np.add.at(sums, assign, vecs)
        cnt = np.bincount(assign, minlength=k)
        keep = cnt > 0
        return pa.table({
            "cluster": pa.array(np.arange(k)[keep], pa.int64()),
            "vsum": pa.array(list(sums[keep]), pa.list_(pa.float64())),
            "n": pa.array(cnt[keep], pa.int64()),
        })


def ivf_build(ds, n_clusters: int = 16, iters: int = 3, concurrency: int = 4):
    """IVF index build: deterministic k-means over the embedding column.

    Init = the vectors with the ``n_clusters`` smallest vec_ids (seed-free
    and reproducible).  Each Lloyd iteration is one streaming pass: centroids
    broadcast via ``ray.put``, per-batch (cluster, sum, count) partials (k
    rows per batch), folded on the driver (k x dim floats — centroid-scale,
    not data-scale).  Returns (centroids ndarray, dataset with an int64
    ``cluster`` column).  At fleet scale the assigned dataset is written as
    cluster-partitioned parquet so a query's nprobe filter becomes a
    partition prune instead of a full scan.
    """
    seed_rows = ds.sort("vec_id").limit(n_clusters).take_all()
    cents = np.array([r["embedding"] for r in seed_rows], dtype=np.float64)

    for _ in range(iters):
        cref = ray.put(cents)
        partials = ds.map_batches(
            _CentroidPartial, fn_constructor_args=(cref,),
            batch_format="pyarrow", concurrency=(1, concurrency)).take_all()
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents))
        for r in partials:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            cnts[r["cluster"]] += r["n"]
        nz = cnts > 0
        cents[nz] = sums[nz] / cnts[nz][:, None]     # empty clusters keep seed

    assigned = ds.map_batches(_AssignCentroid, fn_constructor_args=(ray.put(cents),),
                              batch_format="pyarrow", concurrency=(1, concurrency))
    return cents, assigned


def ivf_topk(assigned, centroids: np.ndarray, query: np.ndarray, k: int = 10,
             nprobe: int = 4, concurrency: int = 4):
    """Scan only the ``nprobe`` clusters nearest the query (recall < 1 — the
    documented IVF trade for a 1/nprobe-of-corpus scan at scale)."""
    cn = np.linalg.norm(centroids, axis=1)
    cn[cn == 0] = 1.0
    sims = (centroids / cn[:, None]) @ (query / np.linalg.norm(query))
    probes = sorted(int(i) for i in np.argsort(-sims)[:nprobe])
    expr = " or ".join(f"cluster == {p}" for p in probes)
    return brute_force_topk(assigned.filter(expr=f"({expr})"), query, k, concurrency)


def lsh_topk(ds, query: np.ndarray, k: int = 10, n_planes: int = 8, seed: int = 11,
             concurrency: int = 4, probes: int = 1):
    """Bucketed variant: scan only rows whose sign-LSH bucket is within the
    probe set (recall < 1; the documented trade for sublinear scan at scale).

    ``probes`` > 1 enables MULTI-PROBE: also scan buckets whose code flips
    the planes the query is least certain about (smallest |margin|) — the
    standard recall recovery at a fraction of another hash table's cost.
    probes = 1 + n means the query bucket plus its n most-likely Hamming-1
    neighbors."""
    from ontoray.extras.dedup import SignLSH

    dim = len(query)
    probe = SignLSH(dim, n_planes, seed)
    margins = query @ probe.planes
    qsigns = margins > 0
    qbucket = int(qsigns.dot(probe.weights))
    buckets = {qbucket}
    # Flip planes in order of increasing |margin| (least-confident first).
    for j in np.argsort(np.abs(margins))[:max(0, probes - 1)]:
        buckets.add(qbucket ^ (1 << int(j)))
    blist = sorted(buckets)

    bucketed = ds.map_batches(SignLSH, fn_constructor_args=(dim, n_planes, seed),
                              batch_format="pyarrow", concurrency=(1, concurrency))
    expr = " or ".join(f"bucket == {b}" for b in blist)
    mine = bucketed.filter(expr=f"({expr})")
    return brute_force_topk(mine, query, k, concurrency)


CENT_SCALE = 10**6


def grouped_centroids(ds, concurrency: int = 4):
    """Per-label embedding centroid — the vector aggregation under k-means /
    class prototypes, in EXACT arithmetic: components quantize to int64
    fixed-point (floor(x*1e6 + 0.5), float64 widening first), per-batch
    partials sum (label, pos) cells, one label×dim-scale exchange finishes.
    Output long-form (label, pos, csum, n, mean_scaled) with
    mean_scaled = floor(csum / n) (numpy floor_divide; the SQL mirror spells
    floor division out since DuckDB's ``//`` truncates toward zero), so the
    result is partitioning-invariant and hash-equal to the SQL mirror.  Float centroid = mean_scaled / 1e6 at the consumer."""
    from ontoray.stages.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "csum": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        labels = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        q = np.floor(vecs * CENT_SCALE + 0.5).astype(np.int64)
        dim = q.shape[1]
        ulabels = np.unique(labels)
        out_l, out_p, out_s, out_n = [], [], [], []
        for lb in ulabels:
            mask = labels == lb
            s = q[mask].sum(axis=0)
            out_l.extend([int(lb)] * dim)
            out_p.extend(range(dim))
            out_s.extend(int(x) for x in s)
            out_n.extend([int(mask.sum())] * dim)
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "pos": pa.array(out_p, pa.int64()),
                         "csum": pa.array(out_s, pa.int64()),
                         "n": pa.array(out_n, pa.int64())})

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "pos"],
        partial_aggs=[("csum", "sum"), ("n", "sum")],
        aggs=[("csum_sum", "sum"), ("n_sum", "sum")],
        rename={"csum_sum_sum": "csum", "n_sum_sum": "n"}, num_buckets=16)

    def finish(batch: pa.Table) -> pa.Table:
        cs = batch.column("csum").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        mean = np.floor_divide(cs, np.where(n == 0, 1, n))
        return batch.append_column("mean_scaled", pa.array(mean, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_grouped_centroids() -> str:
    """DuckDB mirror of grouped_centroids (identical quantization + floor
    division)."""
    qexpr = "CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
    return (
        "SELECT CAST(label AS BIGINT) AS label, CAST(pos - 1 AS BIGINT) AS pos, "
        f"CAST(sum({qexpr}) AS BIGINT) AS csum, count(*) AS n, "
        # DuckDB's BIGINT // truncates toward zero; spell out floor division
        # so negative sums match numpy's floor_divide.
        f"CAST(sum({qexpr}) AS BIGINT) // count(*) "
        f"- CASE WHEN CAST(sum({qexpr}) AS BIGINT) % count(*) <> 0 "
        f"AND sum({qexpr}) < 0 THEN 1 ELSE 0 END AS mean_scaled "
        "FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos) "
        "GROUP BY label, pos")


def ivf_topk_exact(ds, query: np.ndarray, k: int = 10, nprobe: int = 4,
                   n_clusters: int = 16, iters: int = 3, seed: int = 42,
                   concurrency: int = 4):
    """IVF ANN whose WHOLE plan is hash-checkable against a SQL oracle.

    The float k-means of ``ivf_build`` is order-sensitive (driver folds sum
    float partials), so its probe set can differ run to run at the 15th
    digit; here every step is exact:

    * index = ``kmeans_fixed`` (int64 fixed-point Lloyd — the hash-checked
      embed_kmeans kernel) — returns the final integer centroids;
    * probe ranking needs NO float centroids at all: cosine(q, S/c) ==
      cosine(q, S) for cluster sum-vector S (the count cancels), so clusters
      rank by exact integer dot/norms of the per-cluster SUM of quantized
      vectors — one k×dim-bounded aggregate — with the single float64
      division evaluated identically in DuckDB (HUGEINT cast parity; exact
      while |S|²·|q̃|² fits 127 bits ≈ 1e8-vector clusters at dim 64 — past
      that, rescale the quantization);
    * the scan recomputes assignment per batch against the broadcast
      centroids (no join) and keeps only nprobe clusters; top-k uses the
      ann_topk comparator (round-6 cosine, vec_id tie-break).

    Recall < 1 vs brute force is the documented IVF trade; the ORACLE
    computes the identical probe set, so the result is still exact-checked.
    """
    import math

    from ontoray.extras.kmeans import KM_SCALE, _quantize, kmeans_fixed
    from ontoray.stages.agg import hash_aggregate
    from ontoray.util import column_lists

    _, cents, dsm = kmeans_fixed(ds, k=n_clusters, iters=iters, seed=seed,
                                 return_centroids=True)
    dim = cents.shape[1]
    bcast = ray.put(cents)

    def cluster_sums(batch: pa.Table) -> pa.Table:
        C = ray.get(bcast)
        q = _quantize(batch, "embedding")
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        out_c, out_p, out_s = [], [], []
        for c in np.unique(cl):
            s = q[cl == c].sum(axis=0)
            out_c.extend([int(c)] * dim)
            out_p.extend(range(dim))
            out_s.extend(int(x) for x in s)
        return pa.table({"cl": pa.array(out_c, pa.int64()),
                         "pos": pa.array(out_p, pa.int64()),
                         "s": pa.array(out_s, pa.int64())})

    agg = column_lists(
        hash_aggregate(dsm.map_batches(cluster_sums, batch_format="pyarrow"),
                       ["cl", "pos"], partial_aggs=[("s", "sum")],
                       aggs=[("s_sum", "sum")], rename={"s_sum_sum": "s"},
                       num_buckets=8), ["cl", "pos", "s"])
    S: dict[int, list[int]] = {}
    for c, p, s in zip(agg["cl"], agg["pos"], agg["s"]):
        S.setdefault(c, [0] * dim)[p] = int(s)

    qq = [int(x) for x in np.floor(np.asarray(query, dtype=np.float64)
                                   * KM_SCALE + 0.5).astype(np.int64)]
    n1 = sum(v * v for v in qq)          # exact Python int
    scored = []
    for c, sv in S.items():
        dot = sum(a * b for a, b in zip(qq, sv))
        n2 = sum(v * v for v in sv)
        cos = float(dot) / math.sqrt(float(n2 * n1)) if n2 > 0 and n1 > 0 else -2.0
        scored.append((-cos, c))
    probes = sorted(c for _negcos, c in sorted(scored)[:nprobe])
    probe_arr = np.array(probes, dtype=np.int64)

    def scan(batch: pa.Table) -> pa.Table:
        C = ray.get(bcast)
        q = _quantize(batch, "embedding")
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        keep = np.isin(cl, probe_arr)
        return batch.filter(pa.array(keep, pa.bool_()))

    return brute_force_topk(dsm.map_batches(scan, batch_format="pyarrow"),
                            query, k, concurrency)


def sql_lsh_topk(dim: int, k: int = 10, n_planes: int = 8, seed: int = 11,
                 probes: int = 1, table: str = "embeddings",
                 query_seed: int = 123) -> str:
    """DuckDB mirror of ``lsh_topk``: the SAME seeded planes and query are
    re-derived here and embedded as float64 literals; the probe bucket set
    is query-derived (data-independent), so it is computed driver-side
    exactly as the engine computes it and inlined.  Bucket membership uses
    the identical strict `dot > 0` sign rule (the float sums differ only in
    association order — a sign flip needs a dot within ~1e-16 of zero,
    the accepted risk of every plane-literal mirror in this repo); the
    final ranking re-rounds cosine to 6, matching ``brute_force_topk``."""
    from ontoray.extras.dedup import SignLSH

    q = query_vector(dim, seed=query_seed)
    probe = SignLSH(dim, n_planes, seed)
    margins = q @ probe.planes
    qbucket = int((margins > 0).dot(probe.weights))
    buckets = {qbucket}
    for j in np.argsort(np.abs(margins))[:max(0, probes - 1)]:
        buckets.add(qbucket ^ (1 << int(j)))
    blist = ", ".join(str(b) for b in sorted(buckets))

    def dlit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(list_zip(e, "
        f"CAST({dlit(probe.planes[:, j])} AS DOUBLE[])), p -> p[1] * p[2])) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes))
    qlit = dlit(q)
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}
    ), b AS (
      SELECT vec_id, e, ({bits}) AS bucket FROM v
    )
    SELECT vec_id,
           round(list_cosine_similarity(e, CAST({qlit} AS DOUBLE[])), 6) AS cosine
    FROM b WHERE bucket IN ({blist})
    ORDER BY cosine DESC, vec_id LIMIT {k}
    """


# --- exact k-NN graph over an embedding set ------------------------------------

class _KnnGraphBatch:
    """Per-batch exact cosine k-NN against the broadcast embedding matrix.

    Actor-pool state: the (ids, matrix, norms) triple is ``ray.get`` once per
    actor in ``__init__`` (T1-style), every ``__call__`` is one float64
    matmul.  Ranking comparator matches the SQL mirror exactly: round cosine
    to 6 decimals FIRST, then (-cosine, nbr_id); self-pairs are excluded by
    id, not by score.  Boundary ties are resolved exactly: argpartition
    proposes the cut, every row with the cut value joins the candidate set,
    and the final lexsort picks the k winners under the mirror's comparator.
    """

    def __init__(self, mat_ref, k: int):
        ids, mat = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
        self.all_ids = ids                       # (N,) int64
        self.mt = mat.T                          # (dim, N) float64
        self.mn = np.linalg.norm(mat, axis=1)
        self.mn[self.mn == 0] = 1.0
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "nbr_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        vn = np.linalg.norm(vecs, axis=1)
        vn[vn == 0] = 1.0
        # Norm division AFTER the dot, same op order as list_cosine_similarity.
        sims = np.round((vecs @ self.mt) / (vn[:, None] * self.mn[None, :]), 6)
        out_v, out_n, out_c = [], [], []
        for i in range(len(ids)):
            r = sims[i]
            valid = self.all_ids != ids[i]           # exclude self by id
            cand_idx = np.flatnonzero(valid)
            k = min(self.k, len(cand_idx))
            if k == 0:
                continue
            rv = r[cand_idx]
            # cheap cut, then widen to ALL holders of the cut value
            part = np.argpartition(-rv, k - 1)[:k]
            cut = rv[part].min()
            cset = cand_idx[rv >= cut]
            order = np.lexsort((self.all_ids[cset], -r[cset]))[:k]
            sel = cset[order]
            out_v.extend([ids[i]] * k)
            out_n.extend(self.all_ids[sel])
            out_c.extend(r[sel])
        return pa.table({"vec_id": pa.array(out_v, pa.int64()),
                         "nbr_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})


def knn_graph(ds, k: int = 5, concurrency: int = 4):
    """Exact cosine k-NN graph: every vector's top-k neighbors (self
    excluded) — the similarity-graph build behind SemDeDup-style clustering,
    label propagation over embeddings, and kNN-classifier features.

    Scale shape: the embedding set is broadcast ONCE (``ray.put``) and every
    batch scores against it with a single matmul — streaming over the left
    side, no pairwise shuffle.  The broadcast side is the whole vector set,
    so this exact variant serves VOCABULARY-BOUNDED embedding sets (cluster
    representatives, entity vocab, rerank pools — up to ~10^6 x 10^2 floats
    per worker heap); the corpus-scale path is the banded/bucketed family
    (``ivf_topk`` partition pruning, ``embed_neardup`` sign-LSH bands) which
    trades exactness for a bounded candidate set."""
    tables = ray.get(ds.select_columns(["vec_id", "embedding"]).to_arrow_refs())
    t = pa.concat_tables([tb for tb in tables if tb.num_rows],
                         promote_options="permissive")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = t.column("embedding").combine_chunks()
    lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    if len(lens) and (lens == lens[0]).all():    # rectangular: zero-copy path
        mat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(ids), int(lens[0]))
    else:
        mat = np.array(col.to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    mat_ref = ray.put((ids[order], mat[order]))
    return ds.map_batches(_KnnGraphBatch, fn_constructor_args=(mat_ref, k),
                          batch_format="pyarrow", concurrency=(1, concurrency))


def sql_knn_graph(k: int = 5, table: str = "embeddings") -> str:
    """DuckDB mirror of ``knn_graph``: self cross join + per-source
    row_number under the identical (round-6 cosine DESC, nbr_id) comparator."""
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
    ), s AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
             round(list_cosine_similarity(a.v, b.v), 6) AS cosine
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ), r AS (
      SELECT vec_id, nbr_id, cosine,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, nbr_id) AS rn
      FROM s
    )
    SELECT vec_id, nbr_id, cosine FROM r WHERE rn <= {k}
    """


# --- hard-negative / positive mining for contrastive training -------------------

class _HardNegBatch:
    """Per-batch miner against the broadcast (ids, labels, matrix): for every
    anchor, the top same-label neighbor (positive) and top different-label
    neighbor (hard negative) under the round-6 (-cosine, id) comparator.
    Singleton labels yield NULL positives (mask-aware)."""

    def __init__(self, ref):
        ids, labels, mat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.all_ids = ids
        self.labels = labels
        self.mt = mat.T
        self.mn = np.linalg.norm(mat, axis=1)
        self.mn[self.mn == 0] = 1.0

    @staticmethod
    def _pick(r: np.ndarray, ids: np.ndarray, mask: np.ndarray):
        """Best index under (cosine DESC, id ASC) within mask, or None."""
        cand = np.flatnonzero(mask)
        if len(cand) == 0:
            return None
        rv = r[cand]
        best = rv.max()
        holders = cand[rv == best]
        return int(holders[np.argmin(ids[holders])])

    def __call__(self, batch: pa.Table) -> pa.Table:
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        blabels = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
        if len(bids) == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
                "pos_id": pa.array([], pa.int64()),
                "pos_cos": pa.array([], pa.float64()),
                "neg_id": pa.array([], pa.int64()),
                "neg_cos": pa.array([], pa.float64()),
            })
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        vn = np.linalg.norm(vecs, axis=1)
        vn[vn == 0] = 1.0
        sims = np.round((vecs @ self.mt) / (vn[:, None] * self.mn[None, :]), 6)
        pos_id, pos_c, neg_id, neg_c = [], [], [], []
        for i in range(len(bids)):
            r = sims[i]
            not_self = self.all_ids != bids[i]
            same = (self.labels == blabels[i]) & not_self
            diff = (self.labels != blabels[i]) & not_self
            p = self._pick(r, self.all_ids, same)
            n = self._pick(r, self.all_ids, diff)
            pos_id.append(None if p is None else int(self.all_ids[p]))
            pos_c.append(None if p is None else float(r[p]))
            neg_id.append(None if n is None else int(self.all_ids[n]))
            neg_c.append(None if n is None else float(r[n]))
        return pa.table({
            "vec_id": pa.array(bids, pa.int64()),
            "label": pa.array(blabels, pa.int64()),
            "pos_id": pa.array(pos_id, pa.int64()),
            "pos_cos": pa.array(pos_c, pa.float64()),
            "neg_id": pa.array(neg_id, pa.int64()),
            "neg_cos": pa.array(neg_c, pa.float64()),
        })


def hard_negatives(ds, concurrency: int = 4):
    """Contrastive-training pair mining over a labeled embedding set: every
    anchor gets its nearest SAME-label neighbor (positive) and nearest
    DIFFERENT-label neighbor (hard negative) by exact cosine — the batch
    construction step for triplet/InfoNCE training-data pipelines.

    Scale shape: same contract as ``knn_graph`` — one broadcast of the
    labeled vector set, one matmul per batch, anchors stream.  The exact
    variant serves vocabulary-bounded sets; at corpus scale mine within
    IVF cells / LSH bands (the bounded-candidate family) instead."""
    tables = ray.get(
        ds.select_columns(["vec_id", "label", "embedding"]).to_arrow_refs())
    t = pa.concat_tables([tb for tb in tables if tb.num_rows],
                         promote_options="permissive")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    col = t.column("embedding").combine_chunks()
    lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    if len(lens) and (lens == lens[0]).all():
        mat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(ids), int(lens[0]))
    else:
        mat = np.array(col.to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ref = ray.put((ids[order], labels[order], mat[order]))
    return ds.map_batches(_HardNegBatch, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, concurrency))


def sql_hard_negatives(table: str = "embeddings") -> str:
    """DuckDB mirror of ``hard_negatives``: cross join split by label
    equality, row_number under the identical comparator, LEFT joins so
    singleton labels keep NULL positives."""
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
             CAST(embedding AS DOUBLE[]) AS v
      FROM {table}
    ), s AS (
      SELECT a.vec_id AS vec_id, a.label AS label,
             b.vec_id AS o_id, b.label AS o_label,
             round(list_cosine_similarity(a.v, b.v), 6) AS c
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ), p AS (
      SELECT vec_id, o_id, c,
             row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, o_id) AS rn
      FROM s WHERE label = o_label
    ), n AS (
      SELECT vec_id, o_id, c,
             row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, o_id) AS rn
      FROM s WHERE label <> o_label
    )
    SELECT e.vec_id, e.label,
           p.o_id AS pos_id, p.c AS pos_cos,
           n.o_id AS neg_id, n.c AS neg_cos
    FROM e
    LEFT JOIN (SELECT * FROM p WHERE rn = 1) p ON e.vec_id = p.vec_id
    LEFT JOIN (SELECT * FROM n WHERE rn = 1) n ON e.vec_id = n.vec_id
    """

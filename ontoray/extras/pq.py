"""Product-quantization (PQ) code assignment over the embeddings table.

PQ (Jégou et al. 2011) is the memory-scale path for billion-vector ANN:
split each D-dim vector into M subspaces, k-means each subspace
independently, and store each vector as M small codes (here M×3 bits for
k=8) instead of D floats — a 50-100× footprint cut that makes the
billion-vector index fit a cluster's RAM.

This implementation composes the repo's exact fixed-point distributed
Lloyd (``extras/kmeans.kmeans_fixed``) per subspace: the corpus is sliced
per-batch (zero extra shuffle), each subspace trains with its own seed, and
the assignment output is the long-form (vec_id, subspace, code) table.  All
arithmetic inherits kmeans' int64 contract, so the DuckDB mirror
(``sql_pq_codes`` — the kmeans CTE chain unrolled once per subspace with
prefixed CTE names) hash-matches exactly.

Scale note: training cost is M independent kmeans runs over the SLICED
corpus (each pass moves only k×(D/M) ints per exchange); at 10^9 vectors
you would train on an md5-sampled subset and only ASSIGN over the full
corpus — the assignment pass here is already that shape (one broadcast of
k×(D/M) centroids, one streaming argmin pass).
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa


def pq_codes(ds, m: int = 4, k: int = 8, iters: int = 2, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """(vec_id, subspace, code) PQ assignment; subspace s covers dims
    [s*D/M, (s+1)*D/M)."""
    from ontoray.extras.kmeans import kmeans_fixed

    dim = len(ds.take(1)[0][vec_col])
    outs = []
    for mi in range(m):
        lo, hi = mi * dim // m, (mi + 1) * dim // m

        def slice_batch(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
            return pa.table({
                id_col: batch.column(id_col),
                vec_col: pa.array(vecs[:, lo:hi].tolist(),
                                  pa.list_(pa.float64())),
            })

        asg = kmeans_fixed(ds.map_batches(slice_batch, batch_format="pyarrow"),
                           k=k, iters=iters, seed=seed + mi,
                           id_col=id_col, vec_col=vec_col)

        def tag(batch: pa.Table, mi=mi) -> pa.Table:
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "subspace": pa.array([mi] * batch.num_rows, pa.int64()),
                "code": batch.column("cluster"),
            })

        outs.append(asg.map_batches(tag, batch_format="pyarrow"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def sql_pq_subspace_ctes(m: int = 4, k: int = 8, iters: int = 2,
                         seed: int = 42, dim: int = 64,
                         table: str = "embeddings"
                         ) -> tuple[list[str], list[tuple[int, str]]]:
    """The kmeans CTE chain per subspace with CTE names suffixed ``_s{m}``
    (word-boundary rename — inner aliases untouched), over a 1-based
    list-slice of the embedding column.  Returns (all_ctes, [(mi,
    final_assignment_cte_name)]); shared by ``sql_pq_codes`` and the
    ADC-ranking mirrors (queries.sql_ann_refine)."""
    from ontoray.extras.kmeans import sql_kmeans_ctes

    all_ctes: list[str] = []
    finals: list[tuple[int, str]] = []
    for mi in range(m):
        lo, hi = mi * dim // m, (mi + 1) * dim // m
        sub = (f"(SELECT vec_id, embedding[{lo + 1}:{hi}] AS embedding "
               f"FROM {table})")
        ctes, final = sql_kmeans_ctes(k, iters, seed + mi, table=sub)
        names = ["q", "sd"] + [f"{p}{t}" for t in range(iters + 1)
                               for p in ("c", "a", "cell", "cent")]
        for cte_i in range(len(ctes)):
            s = ctes[cte_i]
            for n in sorted(names, key=len, reverse=True):
                s = _re.sub(rf"\b{n}\b", f"{n}_s{mi}", s)
            ctes[cte_i] = s
        for n in sorted(names, key=len, reverse=True):
            final = _re.sub(rf"\b{n}\b", f"{n}_s{mi}", final)
        all_ctes.extend(ctes)
        finals.append((mi, final))
    return all_ctes, finals


def sql_pq_codes(m: int = 4, k: int = 8, iters: int = 2, seed: int = 42,
                 dim: int = 64, table: str = "embeddings") -> str:
    """DuckDB mirror of ``pq_codes`` (see ``sql_pq_subspace_ctes``)."""
    all_ctes, finals = sql_pq_subspace_ctes(m, k, iters, seed, dim, table)
    sel = " UNION ALL ".join(
        f"SELECT vec_id, CAST({mi} AS BIGINT) AS subspace, "
        f"CAST(cl AS BIGINT) AS code FROM {final}"
        for mi, final in finals)
    return "WITH " + ", ".join(all_ctes) + " " + sel

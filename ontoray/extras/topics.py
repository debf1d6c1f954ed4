"""Corpus topic clustering: hashed bag-of-words k-means + top terms.

The classic unsupervised corpus-exploration pipeline (feature hashing as in
Weinberger et al. 2009, Lloyd clustering, per-cluster term profiles), built
from the repo's exact primitives so the whole composition hash-matches its
DuckDB mirror:

1. every doc maps to a ``buckets``-dim RELATIVE-FREQUENCY vector over
   md5-int60 token buckets (ONE float64 division c/n per component — the
   same IEEE op in SQL, so quantization downstream agrees bit-for-bit;
   relative frequencies keep the fixed-point distances inside int64 where
   raw counts at web scale would overflow);
2. ``kmeans_fixed`` clusters the vectors (exact int64 fixed-point Lloyd,
   md5 seeding — the bit-stable distributed k-means);
3. per-cluster top terms: token counts join the assignment on doc_id
   (doc-scale partitioned hash join), fold to (cluster, token) in the
   two-phase combiner plan, and each cluster keeps its ``topn`` by
   (count DESC, token ASC).

Scale shape: the doc->vector pass is per-batch; k-means exchanges only
k x buckets partials per round; the top-term join is the one corpus-scale
exchange (token pairs reduce per-batch before it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ontoray.extras.sketches import _md5_int60, sql_md5_int60
from ontoray.extras.textstats import TOKEN_RE


def doc_hash_vectors(ds, buckets: int = 16, id_col: str = "doc_id",
                     text_col: str = "text"):
    """(doc_id, text) -> (vec_id, embedding): relative token frequency per
    md5-int60 hash bucket.  Token-less docs emit no row."""
    def vecs(batch: pa.Table) -> pa.Table:
        ids, out = [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = TOKEN_RE.findall(t or "")
            if not toks:
                continue
            b = _md5_int60(toks) % buckets
            cnt = np.bincount(b, minlength=buckets).astype(np.float64)
            ids.append(did)
            out.append((cnt / len(toks)).tolist())
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(out, pa.list_(pa.float64())),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        vecs, batch_format="pyarrow")


def docs_topics(ds, k: int = 4, iters: int = 2, seed: int = 42,
                buckets: int = 16, topn: int = 5, id_col: str = "doc_id",
                text_col: str = "text"):
    """Cluster docs by hashed-BoW k-means; return each cluster's top-n
    terms: (cluster, token, n, rank)."""
    from ontoray.extras.kmeans import kmeans_fixed
    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    ds = ds.select_columns([id_col, text_col]).materialize()
    asg = kmeans_fixed(doc_hash_vectors(ds, buckets=buckets, id_col=id_col,
                                        text_col=text_col),
                       k=k, iters=iters, seed=seed)

    def tok_partial(batch: pa.Table) -> pa.Table:
        dids, toks = [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            ws = TOKEN_RE.findall(t or "")
            dids.extend([did] * len(ws))
            toks.extend(ws)
        tbl = pa.table({
            id_col: pa.array(dids, pa.int64()),
            "token": pa.array(toks, pa.string()),
            "c": pa.array(np.ones(len(toks), dtype=np.int64)),
        })
        g = tbl.group_by([id_col, "token"]).aggregate([("c", "sum")])
        return g.rename_columns([id_col, "token", "c"])

    pairs = ds.map_batches(tok_partial, batch_format="pyarrow")
    joined = hash_join(pairs,
                       asg.map_batches(
                           lambda t: t.rename_columns([id_col, "cluster"]),
                           batch_format="pyarrow"),
                       id_col, id_col, how="inner", right_cols=["cluster"])

    ct = hash_aggregate(
        joined.select_columns(["cluster", "token", "c"]),
        ["cluster", "token"],
        partial_aggs=[("c", "sum")],
        aggs=[("c_sum", "sum")], rename={"c_sum_sum": "n"})

    def top(g: pa.Table) -> pa.Table:
        toks = np.asarray(g.column("token").to_pylist(), dtype=object)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -n))[:topn]
        return pa.table({
            "cluster": pa.array([g.column("cluster")[0].as_py()] * len(order),
                                pa.int64()),
            "token": pa.array(list(toks[order]), pa.string()),
            "n": pa.array(n[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return ct.groupby("cluster").map_groups(top, batch_format="pyarrow")


def sql_docs_topics(k: int = 4, iters: int = 2, seed: int = 42,
                    buckets: int = 16, topn: int = 5,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB mirror: hashed-frequency doc vectors as a dense (doc x bucket)
    grid (no correlated lambdas — the repo's documented DuckDB footgun),
    spliced as the source CTE of the unrolled k-means chain, plus the
    top-term join against the final assignment."""
    from ontoray.extras.kmeans import sql_kmeans_ctes

    h = sql_md5_int60("w")
    pre = [
        f"tk AS (SELECT {id_col}, w FROM (SELECT {id_col}, "
        f"unnest(regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+')) "
        f"AS w FROM {table}))",
        f"cntb AS (SELECT {id_col}, {h} % {buckets} AS b, "
        f"CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2)",
        f"tot AS (SELECT {id_col}, CAST(sum(c) AS BIGINT) AS n "
        f"FROM cntb GROUP BY 1)",
        f"grid AS (SELECT t.{id_col}, j.jj, coalesce(c.c, 0) AS c, t.n "
        f"FROM tot t CROSS JOIN (SELECT unnest(generate_series(0, "
        f"{buckets - 1})) AS jj) j "
        f"LEFT JOIN cntb c ON c.{id_col} = t.{id_col} AND c.b = j.jj)",
        f"dv AS (SELECT {id_col} AS vec_id, "
        f"list(CAST(c AS DOUBLE) / n ORDER BY jj) AS embedding "
        f"FROM grid GROUP BY {id_col})",
    ]
    ctes, final = sql_kmeans_ctes(k, iters, seed, table="dv")
    post = [
        f"asg AS (SELECT vec_id AS {id_col}, cl AS cluster FROM {final})",
        f"ct AS (SELECT a.cluster, tk.w AS token, "
        f"CAST(count(*) AS BIGINT) AS n "
        f"FROM tk JOIN asg a USING ({id_col}) GROUP BY 1, 2)",
        "rk AS (SELECT cluster, token, n, row_number() OVER ("
        "PARTITION BY cluster ORDER BY n DESC, token) AS rank FROM ct)",
    ]
    return ("WITH " + ", ".join(pre + ctes + post) +
            f" SELECT CAST(cluster AS BIGINT) AS cluster, token, n, "
            f"CAST(rank AS BIGINT) AS rank FROM rk WHERE rank <= {topn}")

"""Dominant principal direction of the embeddings table via fixed-point
power iteration — distributed iterative linear algebra as a Ray Data
pipeline, hash-checkable against an unrolled-CTE DuckDB mirror.

What it computes: the top right-singular direction of the (uncentered)
vector matrix X — power iteration on the Gram matrix, v ← Xᵀ(Xv), with
max-abs integer normalization per round (the HITS contract — no float
norm) — and every vector's projection onto it.  The training-data use is
1-D embedding triage: sorting/bucketing a corpus along its dominant
semantic axis (the cheap precursor to PCA whitening), plus outlier scans
at the projection tails.

Exact-arithmetic contract (mirrored by ``sql_embed_pca1``): vectors
quantize once to int64 (floor(x·10⁶ + 0.5), the k-means contract);
per row d = Σⱼ qxⱼ·vⱼ, s = ⌊d/10⁶⌋, per-element contribution
c = ⌊qx·s/10⁶⌋ — all floor divisions; partials sum per position; the
round ends with v' = ⌊w·10⁶ / max|w|⌋ (computed in Python bigint on the
dim-bounded fold — exact at any magnitude).  Every step is an integer
sum of per-row integers, so the result is bit-identical under any
partitioning AND equal to the SQL mirror's HUGEINT evaluation.

Scale shape per round: ONE streaming pass over the materialized corpus
with the dim-vector broadcast (ray.put), emitting ONE (pos, partial) row
per position per block, then a dim-bounded exchange.  Overflow headroom:
per-row |c| ≤ 10⁶·max|s| with |s| ≤ dim·10⁶, so a 10⁹-row corpus of
unit-norm embeddings sums to ~10¹⁵ — int64-safe; adversarial max-norm
inputs at extreme row counts would move the partial column to a
per-block driver fold (Python bigint), the same escape hatch the
normalization already uses.

Reference basis: the reference projects concept embeddings to 2-D with
sklearn PCA for its ontology scatter views (reference
src/schema_ontology_visualizer.py:301-319); this is the at-scale
distributed equivalent of its first component, deterministic instead of
LAPACK-dependent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ontoray.extras.kmeans import _quantize

PCA_SCALE = 10**6


def pca1_power(ds, rounds: int = 3, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """(vec_id, proj): projection of every vector onto the dominant
    direction after ``rounds`` power-iteration rounds from the all-ones
    start vector."""
    import ray

    from ontoray.stages.agg import hash_aggregate
    from ontoray.util import column_lists

    ds = ds.select_columns([id_col, vec_col]).materialize()
    first = ds.take(1)
    if not first:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "proj": pa.array([], pa.int64())})
    dim = len(first[0][vec_col])
    v = np.full(dim, PCA_SCALE, np.int64)

    for _ in range(rounds):
        bcast = ray.put(v)

        def partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"pos": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.int64())})
            vv = ray.get(bcast)
            q = _quantize(batch, vec_col)
            d = q @ vv                       # |d| <= dim * 1e6 * 1e6
            s = d // PCA_SCALE               # numpy floor division
            c = (q * s[:, None]) // PCA_SCALE
            w = c.sum(axis=0)
            return pa.table({"pos": pa.array(range(dim), pa.int64()),
                             "w": pa.array(w, pa.int64())})

        rows = column_lists(
            hash_aggregate(ds.map_batches(partials, batch_format="pyarrow"),
                           ["pos"], partial_aggs=[("w", "sum")],
                           aggs=[("w_sum", "sum")], rename={"w_sum_sum": "w"}),
            ["pos", "w"])
        got = dict(zip(rows["pos"], rows["w"]))
        wl = [int(got.get(j, 0)) for j in range(dim)]
        mx = max(abs(x) for x in wl)
        if mx:  # all-zero fold keeps the previous direction (mirrored)
            v = np.array([(x * PCA_SCALE) // mx for x in wl], np.int64)

    bv = ray.put(v)

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "proj": pa.array([], pa.int64())})
        vv = ray.get(bv)
        q = _quantize(batch, vec_col)
        d = q @ vv
        return pa.table({"vec_id": batch.column(id_col),
                         "proj": pa.array(d // PCA_SCALE, pa.int64())})

    return ds.map_batches(project, batch_format="pyarrow")


def _sql_floordiv(x: str, y: str) -> str:
    """Floor (not truncating) integer division — DuckDB ``//`` truncates
    toward zero; numpy/Python floor."""
    return (f"({x}) // ({y}) - CASE WHEN ({x}) % ({y}) <> 0 "
            f"AND ({x}) < 0 THEN 1 ELSE 0 END")


def sql_embed_pca1(rounds: int = 3, table: str = "embeddings") -> str:
    """DuckDB mirror of ``pca1_power``: the identical recurrence unrolled
    as chained MATERIALIZED CTEs (q is read in every round), HUGEINT only
    where the normalization product needs it."""
    S = PCA_SCALE
    ctes = [
        f"q AS MATERIALIZED (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {S} + 0.5) AS BIGINT)) "
        f"AS qv FROM {table})",
        f"pv0 AS (SELECT t.pos, CAST({S} AS BIGINT) AS v "
        f"FROM (SELECT len(qv) AS L FROM q LIMIT 1) l, "
        f"unnest(generate_series(1, l.L)) AS t(pos))",
    ]
    for r in range(1, rounds + 1):
        cs = f"q.qv[t.pos] * s.s"
        nrm = f"CAST(w.w AS HUGEINT) * {S}"
        ctes += [
            f"pd{r} AS MATERIALIZED (SELECT q.vec_id, "
            f"sum(q.qv[v.pos] * v.v) AS d FROM q, pv{r-1} v "
            f"GROUP BY q.vec_id)",
            f"ps{r} AS MATERIALIZED (SELECT vec_id, "
            f"{_sql_floordiv('d', str(S))} AS s FROM pd{r})",
            f"pw{r} AS MATERIALIZED (SELECT t.pos, "
            f"sum({_sql_floordiv(cs, str(S))}) AS w "
            f"FROM q JOIN ps{r} s USING (vec_id), "
            f"unnest(generate_series(1, len(q.qv))) AS t(pos) "
            f"GROUP BY t.pos)",
            f"pm{r} AS (SELECT max(abs(w)) AS mx FROM pw{r})",
            f"pv{r} AS MATERIALIZED (SELECT w.pos, "
            f"CASE WHEN m.mx = 0 THEN vv.v ELSE "
            f"CAST({_sql_floordiv(nrm, 'm.mx')} AS BIGINT) END AS v "
            f"FROM pw{r} w CROSS JOIN pm{r} m "
            f"JOIN pv{r-1} vv ON vv.pos = w.pos)",
        ]
    return ("WITH " + ", ".join(ctes) +
            f", pdf AS (SELECT q.vec_id, sum(q.qv[v.pos] * v.v) AS d "
            f"FROM q, pv{rounds} v GROUP BY q.vec_id) "
            f"SELECT vec_id, CAST({_sql_floordiv('d', str(S))} AS BIGINT) "
            f"AS proj FROM pdf")


def dim_stats(ds, vec_col: str = "embedding"):
    """Per-dimension feature profile of the embedding matrix — the data-
    validation op (TFDV-style) a training pipeline runs before/after every
    embedding-producing stage: n, sum, sum-of-squares, min, max per
    coordinate, all in the exact micro fixed-point contract (floor(x·10⁶ +
    0.5), the k-means quantizer) so any parallelism gives bit-identical
    moments.  Downstream uses: drift detection between snapshots, dead/
    saturated-dimension scans, whitening-stat precompute.

    Scale shape: each batch folds to ONE (dim, n, s, ss, mn, mx) row per
    dimension via numpy column reductions, so the exchange is dim-bounded
    (64 rows per block here), never row-scale.  Overflow headroom: ss per
    row ≤ dim·(10⁶·max|x|)²; unit-scale vectors stay int64-safe to ~3·10⁶
    rows per dimension PER BLOCK partial and ~9·10¹⁸ total — beyond that,
    shard the dim key (the grouped-centroids escape hatch).

    Output: (dim [1-based, matching SQL generate_subscripts], n, sum_micro,
    ssq_micro2, min_micro, max_micro)."""
    from ontoray.stages.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantize(batch, vec_col)            # (rows, dim) int64 micro
        if q.size == 0:
            return pa.table({
                "dim": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            })
        dim = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
            "n": pa.array(np.full(dim, q.shape[0], dtype=np.int64)),
            "s": pa.array(q.sum(axis=0, dtype=np.int64)),
            "ss": pa.array((q * q).sum(axis=0, dtype=np.int64)),
            "mn": pa.array(q.min(axis=0)),
            "mx": pa.array(q.max(axis=0)),
        })

    return hash_aggregate(
        ds.select_columns([vec_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["dim"],
        aggs=[("n", "sum"), ("s", "sum"), ("ss", "sum"),
              ("mn", "min"), ("mx", "max")],
        rename={"n_sum": "n", "s_sum": "sum_micro", "ss_sum": "ssq_micro2",
                "mn_min": "min_micro", "mx_max": "max_micro"},
        num_buckets=8)


def sql_dim_stats(table: str = "embeddings", vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`dim_stats` — unnest + generate_subscripts
    zip into (dim, q) pairs; identical micro quantization."""
    return f"""
    WITH q AS (
      SELECT generate_subscripts({vec_col}, 1) AS dim,
             CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS q
      FROM {table}
    )
    SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS sum_micro,
           CAST(sum(q * q) AS BIGINT) AS ssq_micro2,
           CAST(min(q) AS BIGINT) AS min_micro,
           CAST(max(q) AS BIGINT) AS max_micro
    FROM q GROUP BY 1
    """


def whiten(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Diagonal whitening of the embedding matrix: every coordinate
    standardized by ITS dimension's population mean/std — the preprocessing
    step before cosine/PCA work when dimensions carry wildly different
    scales (z = (q - mean_d) / std_d over the micro-quantized values; a
    zero-variance dimension maps to 0).

    Exactness: the moments come from :func:`dim_stats` (exact int64), and
    mean/std derive in the SAME double expression order as the SQL mirror
    (s/n, sqrt(greatest(ss/n - mean², 0)) — the grouped_zscore contract),
    so both engines land on identical doubles; round(·, 6) output.

    Scale shape: the dim-bounded stats table broadcasts once (ray.put);
    the corpus streams through ONE vectorized pass emitting the unpivoted
    (vec_id, dim, z) rows — dim·rows output, no shuffle.

    Output: (vec_id, dim [1-based], z)."""
    import ray

    stats = {r["dim"]: (r["n"], r["sum_micro"], r["ssq_micro2"])
             for b in dim_stats(ds, vec_col=vec_col).iter_batches(
                 batch_format="pyarrow")
             for r in b.to_pylist()}
    dims = sorted(stats)
    mean = np.array([stats[d][1] / stats[d][0] for d in dims])
    var = np.array([max(stats[d][2] / stats[d][0]
                        - (stats[d][1] / stats[d][0])
                        * (stats[d][1] / stats[d][0]), 0.0) for d in dims])
    std = np.sqrt(var)
    ms_ref = ray.put((mean, std))

    def z_of(batch: pa.Table) -> pa.Table:
        m, s = ray.get(ms_ref)
        q = _quantize(batch, vec_col).astype(np.float64)
        if q.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "z": pa.array([], pa.float64())})
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(s == 0.0, 0.0, (q - m) / s)
        n, d = q.shape
        ids = np.repeat(np.asarray(batch.column(id_col).to_pylist(),
                                   dtype=np.int64), d)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "z": pa.array(np.round(z, 6).ravel(), pa.float64()),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        z_of, batch_format="pyarrow")


def sql_whiten(table: str = "embeddings", id_col: str = "vec_id",
               vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`whiten` — identical micro quantization and
    double expression order."""
    return f"""
    WITH q AS (
      SELECT {id_col}, generate_subscripts({vec_col}, 1) AS dim,
             CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS q
      FROM {table}
    ), stats AS (
      SELECT dim, count(*) AS n, sum(q)::BIGINT AS s,
             sum(q * q)::BIGINT AS ss
      FROM q GROUP BY 1
    ), ms AS (
      SELECT dim, s::DOUBLE / n::DOUBLE AS mean,
             sqrt(greatest(ss::DOUBLE / n::DOUBLE
                           - (s::DOUBLE / n::DOUBLE)
                           * (s::DOUBLE / n::DOUBLE), 0.0)) AS std
      FROM stats
    )
    SELECT q.{id_col}, CAST(q.dim AS BIGINT) AS dim,
           round(CASE WHEN ms.std = 0.0 THEN 0.0
                      ELSE (q.q::DOUBLE - ms.mean) / ms.std END, 6) AS z
    FROM q JOIN ms USING (dim)
    """

"""Distributed exact quantiles via value-histogram compression.

The scale-first plan for exact (non-sketch) quantiles over a huge fact
table: rows are first collapsed to a (group, value) -> count histogram with
the two-phase bucketed ``hash_aggregate`` (per-batch combiner before the
shuffle), so the data that moves is bounded by the DISTINCT-VALUE vocabulary
per group, not the row count.  Each group's histogram is then reduced with a
sorted cumulative walk inside ``groupby(key).map_groups`` — fully
distributed, nothing on the driver.

Quantile definition matches DuckDB/ANSI ``quantile_disc`` exactly: the
smallest value whose 1-based rank in the sorted multiset is >= ceil(q * n),
with q handled as an exact rational (num, den) so integer ceil arithmetic
reproduces DuckDB's boundary behavior bit-for-bit (probed: n=10 q=0.9 -> rank
9, n=100 q=0.99 -> rank 99).

Partitioning assumption (documented per the custom-operator contract): one
group's distinct-value histogram fits in a single ``map_groups`` group.  For
money-typed columns that is the price vocabulary — orders of magnitude
smaller than the row count it summarizes.  For genuinely unbounded
continuous values, quantize at derive time (e.g. cents) — which this
module's callers already do for exact cross-engine money math.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa

from ontoray.stages.agg import hash_aggregate


def grouped_quantiles_disc(ds, key: str, value_col: str,
                           quantiles: dict[str, Fraction],
                           num_buckets: int = 64):
    """Exact per-``key`` discrete quantiles of integer ``value_col``.

    ``quantiles`` maps output column name -> exact Fraction in (0, 1].
    Returns one row per key with one int64 column per requested quantile.
    """
    items = sorted(quantiles.items())

    hist = hash_aggregate(
        ds.select_columns([key, value_col]), [key, value_col],
        partial_aggs=[(value_col, "count")],
        aggs=[(f"{value_col}_count", "sum")],
        rename={f"{value_col}_count_sum": "n"},
        num_buckets=num_buckets)

    def reduce_group(g: pa.Table) -> pa.Table:
        vals = np.asarray(g.column(value_col).to_pylist(), dtype=np.int64)
        cnts = np.asarray(g.column("n").to_pylist(), dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        out = {key: pa.array([g.column(key)[0].as_py()])}
        for name, q in items:
            # ceil(q * n) with exact integer arithmetic.
            target = -((-n * q.numerator) // q.denominator)
            idx = int(np.searchsorted(cum, target, side="left"))
            out[name] = pa.array([int(vals[idx])], pa.int64())
        return pa.table(out)

    return hist.groupby(key).map_groups(reduce_group, batch_format="pyarrow")


def grouped_quantiles_cont(ds, key: str, value_col: str,
                           quantiles: dict[str, float],
                           num_buckets: int = 64):
    """Exact per-``key`` CONTINUOUS (interpolated) quantiles of integer
    ``value_col`` — ANSI ``quantile_cont`` semantics: with the group's sorted
    multiset v[0..n-1], pos = q*(n-1), result = v[floor(pos)]*(1-delta)
    + v[min(floor(pos)+1, n-1)]*delta, delta = pos - floor(pos).

    Same scale contract as :func:`grouped_quantiles_disc`: rows collapse to a
    per-group (value -> count) histogram via the two-phase bucketed
    aggregate, so only distinct-value vocabulary crosses the exchange; the
    interpolation is a sorted cumulative walk per group.

    Cross-engine exactness: every float step (q*(n-1), delta, the two
    products and the sum) is a single IEEE-double operation replicated
    verbatim by the SQL mirror (``queries.SQL_LINEITEM_QUANTILES_CONT``
    spells out the same formula instead of calling DuckDB's builtin, whose
    internal summation differs by ~1 ulp on some inputs).  ``quantiles``
    maps output column name -> q as a Python float.  Returns one float64
    column per quantile."""
    import math

    items = sorted(quantiles.items())

    hist = hash_aggregate(
        ds.select_columns([key, value_col]), [key, value_col],
        partial_aggs=[(value_col, "count")],
        aggs=[(f"{value_col}_count", "sum")],
        rename={f"{value_col}_count_sum": "n"},
        num_buckets=num_buckets)

    def reduce_group(g: pa.Table) -> pa.Table:
        vals = np.asarray(g.column(value_col).to_pylist(), dtype=np.int64)
        cnts = np.asarray(g.column("n").to_pylist(), dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])

        def value_at(rank: int) -> int:
            # 0-based rank in the sorted multiset.
            return int(vals[int(np.searchsorted(cum, rank, side="right"))])

        out = {key: pa.array([g.column(key)[0].as_py()])}
        for name, q in items:
            pos = q * (n - 1)
            lork = math.floor(pos)
            delta = pos - lork
            vlo = float(value_at(lork))
            vhi = float(value_at(min(lork + 1, n - 1)))
            out[name] = pa.array([vlo * (1.0 - delta) + vhi * delta],
                                 pa.float64())
        return pa.table(out)

    return hist.groupby(key).map_groups(reduce_group, batch_format="pyarrow")


# --- grouped z-score normalization --------------------------------------------

def grouped_zscore(ds, key: str = "event_type", value_col: str = "value",
                   id_col: str = "event_id"):
    """Per-group z-score feature normalization: z = (x - mean_g) / std_g
    (population std), computed EXACTLY across any partitioning.

    Scale shape: per-batch integer partials (n, sum_cents, sum_cents^2 —
    int64 cents, the repo's money-math rule: float partial sums are not
    associative across distributed partials, integer sums are) reduce via
    ``hash_aggregate`` to one group-vocabulary-scale stats table, which
    broadcasts back (normalization keys are low-cardinality by nature; swap
    in ``hash_join`` if yours are not).  The corpus streams through twice but
    never shuffles.  Mean/std derive from the SAME integers on both engines
    with the SAME expression order, so ``sql_grouped_zscore`` matches
    bit-for-bit.  int64 bound: |cents| <= 3e5 is safe to ~1e8 rows/group in
    sumsq; shard the group key beyond that."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ontoray.stages.agg import hash_aggregate

    def cents_of(batch: pa.Table):
        return pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column(value_col), pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        c = cents_of(batch)
        t = pa.table({key: batch.column(key), "c": c,
                      "cc": pc.multiply(c, c)})
        g = t.group_by([key]).aggregate([("c", "count"), ("c", "sum"),
                                         ("cc", "sum")])
        return g.rename_columns([key, "n", "s", "ss"])

    stats = hash_aggregate(
        ds.select_columns([key, value_col]).map_batches(partial, batch_format="pyarrow"),
        [key],
        aggs=[("n", "sum"), ("s", "sum"), ("ss", "sum")],
        rename={"n_sum": "n", "s_sum": "s", "ss_sum": "ss"},
        num_buckets=8).take_all()                       # group-vocabulary-scale

    lut = {}
    for r in stats:
        n, s, ss = r["n"], r["s"], r["ss"]
        mean = float(s) / float(n)
        var = max(float(ss) / float(n) - mean * mean, 0.0)
        lut[r[key]] = (mean, var ** 0.5)
    lref = ray.put(lut)

    def zscore(batch: pa.Table) -> pa.Table:
        table = ray.get(lref)
        c = cents_of(batch).to_numpy(zero_copy_only=False).astype(np.float64)
        ks = batch.column(key).to_pylist()
        z = np.empty(len(ks), dtype=np.float64)
        for i, k in enumerate(ks):
            mean, std = table[k]
            z[i] = 0.0 if std == 0.0 else (c[i] - mean) / std
        return pa.table({id_col: batch.column(id_col),
                         key: batch.column(key),
                         "z": pa.array(np.round(z, 6), pa.float64())})

    return ds.select_columns([id_col, key, value_col]).map_batches(
        zscore, batch_format="pyarrow")


def sql_grouped_zscore(table: str = "events", key: str = "event_type",
                       value_col: str = "value", id_col: str = "event_id") -> str:
    """DuckDB mirror of ``grouped_zscore``: identical int64-cents partials and
    the identical double expression order (s::DOUBLE / n::DOUBLE, ss::DOUBLE /
    n::DOUBLE - mean*mean, greatest(., 0), sqrt)."""
    return f"""
    WITH c AS (
      SELECT {id_col}, {key},
             CAST(floor(CAST({value_col} AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c
      FROM {table}
    ), stats AS (
      SELECT {key}, count(*) AS n,
             sum(c)::BIGINT AS s, sum(c * c)::BIGINT AS ss
      FROM c GROUP BY {key}
    ), ms AS (
      SELECT {key},
             s::DOUBLE / n::DOUBLE AS mean,
             sqrt(greatest(ss::DOUBLE / n::DOUBLE
                           - (s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE),
                           0.0)) AS std
      FROM stats
    )
    SELECT c.{id_col}, c.{key},
           round(CASE WHEN ms.std = 0.0 THEN 0.0
                      ELSE (c.c::DOUBLE - ms.mean) / ms.std END, 6) AS z
    FROM c JOIN ms USING ({key})
    """


# --- quantile-bucket assignment (ntile-by-value) -------------------------------

def grouped_quantile_buckets(ds, key: str, value_col: str, id_col: str,
                             n_buckets: int = 10):
    """Assign every row its within-group quantile bucket: bucket = number of
    the group's ``quantile_disc`` cutpoints (q = 1/n .. (n-1)/n) that are
    STRICTLY BELOW the row's value — 0 .. n_buckets-1.

    This is ntile-by-VALUE (equal-value-mass buckets, ties land together),
    the deterministic variant a distributed engine wants: unlike SQL
    ``ntile()`` (equal-COUNT buckets, tie placement depends on row order,
    which no parallel engine reproduces), the assignment is a pure function
    of (value, group cutpoints) — stable across partitionings and engines.

    Scale shape: cutpoints come from :func:`grouped_quantiles_disc` (rows
    collapse to per-group value histograms; only vocabulary crosses the
    exchange), are collected once (group-vocabulary-scale), broadcast via
    ``ray.put``, and each batch assigns buckets with one vectorized
    ``searchsorted`` — the corpus itself streams through untouched."""
    from fractions import Fraction

    import ray

    qs = {f"q{i}": Fraction(i, n_buckets) for i in range(1, n_buckets)}
    names = sorted(qs)
    cut_rows = grouped_quantiles_disc(ds, key, value_col, qs).take_all()
    cuts = {r[key]: np.sort(np.array([r[n] for n in names], dtype=np.int64))
            for r in cut_rows}
    cref = ray.put(cuts)

    def assign(batch: pa.Table) -> pa.Table:
        table = ray.get(cref)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        keys = batch.column(key).to_pylist()
        b = np.empty(len(keys), dtype=np.int64)
        for i, k in enumerate(keys):
            # count of cutpoints strictly below the value
            b[i] = int(np.searchsorted(table[k], vals[i], side="left"))
        return pa.table({id_col: batch.column(id_col),
                         key: batch.column(key),
                         "bucket": pa.array(b, pa.int64())})

    return ds.select_columns([id_col, key, value_col]).map_batches(
        assign, batch_format="pyarrow")


def sql_grouped_quantile_buckets(table: str, key: str, value_col: str,
                                 id_col: str, n_buckets: int = 10) -> str:
    """DuckDB mirror of ``grouped_quantile_buckets``.  Cutpoints are spelled
    out with the engine's own integer rank formula — value at 1-based sorted
    rank ceil(n*i/n_buckets), computed as (n*i + n_buckets-1) // n_buckets in
    integer arithmetic — rather than ``quantile_disc(v, i/n)``, whose float
    q literal can land a hair off an exact rank boundary; the two engines
    then agree bit-for-bit by construction."""
    nb = n_buckets
    return f"""
    WITH ranked AS (
      SELECT {key}, {value_col} AS v,
             row_number() OVER (PARTITION BY {key} ORDER BY {value_col}) AS rn,
             count(*) OVER (PARTITION BY {key}) AS n
      FROM {table}
    ), cuts AS (
      SELECT {key}, q.i, min(v) AS cut
      FROM ranked, (SELECT unnest(range(1, {nb})) AS i) q
      WHERE rn = (n * q.i + {nb - 1}) // {nb}
      GROUP BY {key}, q.i
    )
    SELECT t.{id_col}, t.{key},
           sum(CASE WHEN t.{value_col} > c.cut THEN 1 ELSE 0 END)::BIGINT AS bucket
    FROM {table} t JOIN cuts c USING ({key})
    GROUP BY t.{id_col}, t.{key}
    """


def grouped_corr(ds, key: str, x_col: str, y_col: str):
    """Per-group Pearson correlation (and means) from EXACT integer moment
    partials — the grouped-statistics operator (feature diagnostics /
    leakage checks on training tables).

    Scale shape: one streaming pass folds per-batch integer partials
    (n, sum x, sum y, sum x^2, sum y^2, sum xy over int64 cents — the
    ``grouped_zscore`` money-math rule: float partial sums are not
    associative across distributed partials, integer sums are) through ONE
    vocabulary-scale ``hash_aggregate``; the driver sees only the per-group
    stats rows.  The final float expressions are spelled in ONE fixed order
    (float(num) / sqrt(float(denx) * float(deny))) identically in SQL, so
    the mirror matches bit-for-bit.  int64 bound: |cents| <= 3e5 is safe to
    ~1e8 rows/group in the square sums; shard the group key beyond that
    (same bound as grouped_zscore).

    Output: (key, n, mean_x_cents, mean_y_cents, corr) — corr NULL when
    either variance is zero."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ontoray.stages.agg import hash_aggregate

    def cents(col):
        return pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(col, pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        x = cents(batch.column(x_col))
        y = cents(batch.column(y_col))
        t = pa.table({key: batch.column(key), "x": x, "y": y,
                      "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
                      "xy": pc.multiply(x, y)})
        g = t.group_by([key]).aggregate([
            ("x", "count"), ("x", "sum"), ("y", "sum"),
            ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return g.rename_columns([key, "n", "sx", "sy", "sxx", "syy", "sxy"])

    stats = hash_aggregate(
        ds.select_columns([key, x_col, y_col])
          .map_batches(partial, batch_format="pyarrow"),
        [key],
        aggs=[("n", "sum"), ("sx", "sum"), ("sy", "sum"),
              ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")],
        rename={"n_sum": "n", "sx_sum": "sx", "sy_sum": "sy",
                "sxx_sum": "sxx", "syy_sum": "syy", "sxy_sum": "sxy"},
        num_buckets=8).take_all()                   # group-vocabulary-scale

    ks, ns, mxs, mys, cs = [], [], [], [], []
    for r in sorted(stats, key=lambda r: str(r[key])):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
        num = n * sxy - sx * sy                     # exact Python bigint
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        ks.append(r[key])
        ns.append(n)
        mxs.append(float(sx) / float(n))
        mys.append(float(sy) / float(n))
        cs.append(None if denx == 0 or deny == 0 else
                  float(num) / math.sqrt(float(denx) * float(deny)))
    return rd.from_arrow(pa.table({
        key: pa.array(ks),
        "n": pa.array(ns, pa.int64()),
        "mean_x_cents": pa.array(mxs, pa.float64()),
        "mean_y_cents": pa.array(mys, pa.float64()),
        "corr": pa.array(cs, pa.float64()),
    }))


def sql_grouped_corr(table: str, key: str, x_col: str, y_col: str) -> str:
    """DuckDB mirror of ``grouped_corr``: identical cents quantization,
    HUGEINT moment algebra, and the identical float expression order
    (CAST each factor to DOUBLE, multiply, sqrt, divide)."""
    return f"""
    WITH c AS (
      SELECT {key} AS k,
             CAST(floor(CAST({x_col} AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(CAST({y_col} AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS y
      FROM {table}
    ), s AS (
      SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
      FROM c GROUP BY k
    )
    SELECT k AS {key}, CAST(n AS BIGINT) AS n,
           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x_cents,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y_cents,
           CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
                ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
                     sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
                          CAST(n*syy - sy*sy AS DOUBLE)) END AS corr
    FROM s
    """


def grouped_gini(ds, key: str, value_col: str, num_buckets: int = 64):
    """Exact per-group Gini coefficient of integer ``value_col`` (inequality
    of spend / length / degree — the concentration diagnostic for per-host
    caps and mixture design).

    gini_micro = 1e6 * Σ_i (2i - n - 1)·x_(i) // (n · Σ x)  (x sorted asc,
    1-based i) — the classic mean-difference form; runs of equal values make
    it tie-order invariant, so it is a pure function of the VALUE HISTOGRAM.
    That is the scale hook: rows collapse to (group, value) -> count partials
    first (the quantiles-module plan), and the per-group fold walks the
    sorted histogram with a closed form per run:
    Σ over a run (count c after m rows) of (2i - n - 1) = 2cm + c(c+1) - c(n+1).

    Returns one row per group: (key, n, total, gini_micro), all int64."""
    hist = hash_aggregate(
        ds.select_columns([key, value_col]), [key, value_col],
        partial_aggs=[(value_col, "count")],
        aggs=[(f"{value_col}_count", "sum")],
        rename={f"{value_col}_count_sum": "cnt"},
        num_buckets=num_buckets)

    def reduce_group(g: pa.Table) -> pa.Table:
        vals = np.asarray(g.column(value_col).to_pylist(), dtype=np.int64)
        cnts = np.asarray(g.column("cnt").to_pylist(), dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        n = int(cnts.sum())
        total = int((vals.astype(object) * cnts.astype(object)).sum())
        num = 0
        m = 0
        for v, c in zip(vals.tolist(), cnts.tolist()):
            num += v * (2 * c * m + c * (c + 1) - c * (n + 1))
            m += c
        gini = 1_000_000 * num // (n * total) if total else 0
        return pa.table({
            key: pa.array([g.column(key)[0].as_py()]),
            "n": pa.array([n], pa.int64()),
            "total": pa.array([total], pa.int64()),
            "gini_micro": pa.array([gini], pa.int64()),
        })

    return hist.groupby(key).map_groups(reduce_group, batch_format="pyarrow")


def grouped_winsorize(ds, key: str, value_col: str, id_col: str,
                      lo: "Fraction | None" = None,
                      hi: "Fraction | None" = None):
    """Per-group winsorization: clip ``value_col`` to the group's exact
    [p_lo, p_hi] quantile_disc cutpoints — the standard outlier-robust
    preprocessing pass before per-group statistics.

    Same scale shape as ``grouped_quantile_buckets``: the two cutpoints per
    group come from the histogram-compressed exact quantiles, broadcast
    once; the corpus streams through one vectorized clip.  Output:
    (id, key, value, clipped)."""
    from fractions import Fraction as _F

    import ray

    lo = lo if lo is not None else _F(1, 100)
    hi = hi if hi is not None else _F(99, 100)
    cut_rows = grouped_quantiles_disc(ds, key, value_col,
                                      {"lo": lo, "hi": hi}).take_all()
    cuts = {r[key]: (r["lo"], r["hi"]) for r in cut_rows}
    cref = ray.put(cuts)

    def clip(batch: pa.Table) -> pa.Table:
        table = ray.get(cref)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = batch.column(key).to_pylist()
        out = np.empty(len(keys), dtype=np.int64)
        for i, k in enumerate(keys):
            l, h = table[k]
            v = vals[i]
            out[i] = l if v < l else (h if v > h else v)
        return pa.table({id_col: batch.column(id_col),
                         key: batch.column(key),
                         value_col: pa.array(vals, pa.int64()),
                         "clipped": pa.array(out, pa.int64())})

    return ds.select_columns([id_col, key, value_col]).map_batches(
        clip, batch_format="pyarrow")


def sql_grouped_winsorize(table: str, key: str, value_col: str, id_col: str,
                          lo_num: int = 1, lo_den: int = 100,
                          hi_num: int = 99, hi_den: int = 100) -> str:
    """DuckDB mirror — cutpoint = value at 1-based rank ceil(q*n), spelled
    as (n*num + den - 1) // den integer arithmetic like the buckets mirror."""
    return f"""
    WITH ranked AS (
      SELECT {key}, {value_col} AS v,
             row_number() OVER (PARTITION BY {key} ORDER BY {value_col}) AS rn,
             count(*) OVER (PARTITION BY {key}) AS n
      FROM {table}
    ), cuts AS (
      SELECT {key},
        min(CASE WHEN rn = (n * {lo_num} + {lo_den} - 1) // {lo_den} THEN v END) AS lo,
        min(CASE WHEN rn = (n * {hi_num} + {hi_den} - 1) // {hi_den} THEN v END) AS hi
      FROM ranked GROUP BY {key}
    )
    SELECT t.{id_col}, t.{key}, t.{value_col},
           CAST(least(greatest(t.{value_col}, c.lo), c.hi) AS BIGINT) AS clipped
    FROM {table} t JOIN cuts c USING ({key})
    """


def grouped_mad(ds, key: str, value_col: str, num_buckets: int = 64):
    """Per-group median absolute deviation (the robust spread statistic for
    outlier detection where variance is poisoned by the outliers
    themselves): med = quantile_disc(v, 1/2); mad = quantile_disc(|v - med|,
    1/2).

    Two histogram-compressed passes: pass 1 is the standard (group, value)
    -> count exchange + per-group median; pass 2 re-streams the corpus with
    the medians BROADCAST (ray.put once), folds |v - med| histograms the
    same way.  Nothing corpus-scale ever shuffles; both medians use the
    exact ceil(n/2) rank contract shared with the quantile mirrors.

    Output: (key, n, med, mad), all int64."""
    from fractions import Fraction as _F

    import ray

    half = {"med": _F(1, 2)}
    med_rows = grouped_quantiles_disc(ds, key, value_col, half).take_all()
    meds = {r[key]: r["med"] for r in med_rows}
    mref = ray.put(meds)

    def absdev(batch: pa.Table) -> pa.Table:
        table = ray.get(mref)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = batch.column(key).to_pylist()
        dev = np.empty(len(keys), dtype=np.int64)
        for i, k in enumerate(keys):
            dev[i] = abs(int(vals[i]) - table[k])
        return pa.table({key: batch.column(key),
                         "dev": pa.array(dev, pa.int64())})

    dev_ds = ds.select_columns([key, value_col]).map_batches(
        absdev, batch_format="pyarrow")
    mad_rows = grouped_quantiles_disc(dev_ds, key, "dev",
                                      {"mad": _F(1, 2)}).take_all()
    mads = {r[key]: r["mad"] for r in mad_rows}

    counts = hash_aggregate(
        ds.select_columns([key]), [key],
        partial_aggs=[(key, "count")], aggs=[(f"{key}_count", "sum")],
        rename={f"{key}_count_sum": "n"}, num_buckets=num_buckets).take_all()
    ns = {r[key]: r["n"] for r in counts}

    ks = sorted(meds)
    return pa.table({
        key: pa.array(ks, pa.string()),
        "n": pa.array([ns[k] for k in ks], pa.int64()),
        "med": pa.array([meds[k] for k in ks], pa.int64()),
        "mad": pa.array([mads[k] for k in ks], pa.int64()),
    })


def sql_grouped_mad(table: str, key: str, value_col: str) -> str:
    """DuckDB mirror of ``grouped_mad`` — the same ceil(n/2) rank median on
    both passes."""
    return f"""
    WITH r1 AS (
      SELECT {key}, {value_col} AS v,
             row_number() OVER (PARTITION BY {key} ORDER BY {value_col}) AS rn,
             count(*) OVER (PARTITION BY {key}) AS n
      FROM {table}
    ), med AS (
      SELECT {key}, max(n) AS n,
             min(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
      FROM r1 GROUP BY {key}
    ), r2 AS (
      SELECT t.{key}, abs(t.{value_col} - m.med) AS dev,
             row_number() OVER (PARTITION BY t.{key}
                                ORDER BY abs(t.{value_col} - m.med)) AS rn,
             count(*) OVER (PARTITION BY t.{key}) AS n
      FROM {table} t JOIN med m USING ({key})
    )
    SELECT m.{key}, CAST(m.n AS BIGINT) AS n, CAST(m.med AS BIGINT) AS med,
           CAST(min(CASE WHEN r2.rn = (r2.n + 1) // 2 THEN r2.dev END) AS BIGINT) AS mad
    FROM med m JOIN r2 USING ({key})
    GROUP BY m.{key}, m.n, m.med
    """

"""Bucketed hash aggregation — vectorized groupby for high-cardinality keys.

Ray Data's built-in ``groupby().aggregate(...)`` accumulates per group in
Python on the reduce side, which collapses at open-vocabulary key counts
(~50µs × millions of groups).  ``hash_aggregate`` keeps the shuffle but makes
the reduce vectorized: rows are bucketed by a stable hash of the key columns
(one small-int groupby → B groups total), and each bucket is aggregated with
``pyarrow.Table.group_by`` (C++).  Combined with a per-batch partial
pre-aggregation this is the standard two-phase combiner plan:

    map_batches(partial group_by)  →  bucket shuffle  →  group_by per bucket

Skew note: a hot KEY still lands in one bucket, but after the partial phase
each key contributes at most one row per upstream block, so bucket sizes are
bounded by (#keys-in-bucket × #blocks) — the salting happens at the partial
phase, not the reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _with_bucket(batch: pa.Table, keys: list[str], num_buckets: int) -> pa.Table:
    if batch.num_rows == 0:
        return batch.append_column("__bucket", pa.array([], pa.int64()))
    if len(keys) == 1:
        key_col = pc.cast(batch.column(keys[0]), pa.string())
    else:
        key_col = pc.binary_join_element_wise(
            *[pc.cast(batch.column(k), pa.string()) for k in keys], "\x1f")
    h = pd.util.hash_pandas_object(key_col.to_pandas().astype("string").fillna(""),
                                   index=False).to_numpy()
    return batch.append_column("__bucket",
                               pa.array((h % num_buckets).astype(np.int64), pa.int64()))


def hash_aggregate(ds, keys: list[str], aggs: list[tuple[str, str]],
                   rename: dict[str, str] | None = None,
                   partial_aggs: list[tuple[str, str]] | None = None,
                   num_buckets: int = 64):
    """Grouped aggregation with a vectorized reduce.

    ``aggs``: pyarrow group_by specs [(column, fn)] applied per bucket on the
    reduce side; output columns are pyarrow's ``col_fn`` names unless mapped
    via ``rename``.  ``partial_aggs``: optional per-batch combiner specs run
    BEFORE the shuffle (their output columns feed ``aggs``).
    """
    rename = rename or {}

    if partial_aggs:
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.group_by(keys).aggregate(partial_aggs)
            out_cols = keys + [f"{c}_{f}" for c, f in partial_aggs]
            return g.select(out_cols)
        ds = ds.map_batches(partial, batch_format="pyarrow")

    def bucketize(batch: pa.Table) -> pa.Table:
        return _with_bucket(batch, keys, num_buckets)

    agg_out = [f"{c}_{f}" for c, f in aggs]
    final_cols = keys + [rename.get(c, c) for c in agg_out]

    def reduce_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        out = g.group_by(keys).aggregate(aggs)
        out = out.select(keys + agg_out)
        return out.rename_columns(final_cols)

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(reduce_bucket, batch_format="pyarrow"))

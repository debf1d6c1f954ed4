"""Manual two-wave hash exchange for METADATA-BOUNDED aggregations.

Ray Data's sort-based shuffle pays a latency floor that is super-linear in
input block count and flat in CPUs (measured on this box: the url-winner
aggregation over 7.3M combiner rows costs ~3.4 s through
``repartition + groupby.map_groups`` at 8 CPUs regardless of payload width —
coordination, not bytes).  For exchanges whose input is already
combiner-compressed metadata (url winner rows, edge-vocabulary partials,
degree tables) the classic two-wave MR shuffle expressed as raw Ray tasks is
~3x faster (1.1 s for the same aggregation): wave 1 runs the per-block
combiner and splits its output into ``num_buckets`` hash partitions
(``num_returns`` object refs each); wave 2 runs one reduce task per bucket
over its slice refs.  Plasma moves the same bytes a Dataset shuffle would
move between nodes — this only bypasses the streaming executor's sort
machinery, not the object transfer.

SCOPE — this is the documented raw-Ray escape hatch, used ONLY where the
Dataset API can't express the semantics at the needed latency:

* input must be a MATERIALIZED Dataset (we consume its block refs);
* per-bucket reduce output must fit one worker's heap (rows/num_buckets) —
  i.e. vocabulary/metadata-bounded exchanges, never corpus text;
* streaming backpressure does not apply (two discrete waves), so callers
  keep corpus-scale exchanges on ``hash_aggregate``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    import pandas as pd
    if isinstance(block, pd.DataFrame):
        return pa.Table.from_pandas(block, preserve_index=False)
    raise TypeError(f"unsupported block type {type(block)}")


def manual_hash_exchange(mat_ds, keys: list[str], reduce_fn,
                         partial_fn=None, num_buckets: int = 16):
    """Two-wave hash exchange over a MATERIALIZED Dataset's blocks.

    ``partial_fn`` (optional): per-block combiner, pa.Table -> pa.Table (must
    retain ``keys``).  Split hashes on ``keys`` (polars fixed-seed xxhash via
    ``stable_hash_column``; multi-key via '\\x1f' join) so every row of one
    key lands in exactly one bucket.  ``reduce_fn``: pa.Table -> pa.Table,
    applied once per bucket over the concatenated slices.  Returns a Dataset
    over the reduce outputs (refs stay in the object store — no driver
    fetch).
    """
    import ray
    import ray.data as rd

    @ray.remote(num_returns=num_buckets)
    def split_block(block):
        import pyarrow.compute as pc

        from ontoray.stages.agg import stable_hash_column
        t = _as_arrow(block)
        if partial_fn is not None and t.num_columns:
            t = partial_fn(t)
        if t.num_rows == 0:
            empty = t.slice(0, 0)
            return tuple(empty for _ in range(num_buckets)) \
                if num_buckets > 1 else empty
        if len(keys) == 1:
            kc = t.column(keys[0])
        else:
            kc = pc.binary_join_element_wise(
                *[pc.cast(t.column(k), pa.string()) for k in keys], "\x1f")
        h = stable_hash_column(kc) % num_buckets
        order = np.argsort(h, kind="stable")
        hs = h[order]
        ts = t.take(pa.array(order, pa.int64()))
        bounds = np.searchsorted(hs, np.arange(num_buckets + 1))
        parts = [ts.slice(bounds[i], bounds[i + 1] - bounds[i])
                 for i in range(num_buckets)]
        return tuple(parts) if num_buckets > 1 else parts[0]

    @ray.remote
    def reduce_bucket(*parts):
        live = [p for p in parts if p.num_rows]
        if live:
            return reduce_fn(pa.concat_tables(live, promote_options="default"))
        # All-empty bucket (tiny inputs / skewed keys): reduce an empty
        # slice that CARRIES the combiner schema — a zero-column empty
        # block (Ray emits those for empty upstream arms) would make the
        # reduce_fn's group_by fail on its key columns.
        base = next((p for p in parts if p.num_columns), None)
        return reduce_fn(base.slice(0, 0)) if base is not None else pa.table({})

    block_refs = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    if not block_refs:
        return mat_ds
    splits = [split_block.remote(r) for r in block_refs]
    if num_buckets == 1:
        splits = [[s] for s in splits]
    out_refs = [reduce_bucket.remote(*[s[i] for s in splits])
                for i in range(num_buckets)]
    return rd.from_arrow_refs(out_refs)

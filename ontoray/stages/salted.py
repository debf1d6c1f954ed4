"""Salted aggregation for list-valued collectors.

Count-like aggregations defuse head-entity skew with the per-batch combiner
(one row per key per batch — see stages/agg.py).  COLLECT-style aggregations
(e.g. "sample of source urls per mention") cannot fully combine in the
partial phase: a hot key's value list still concentrates on one reducer.
The classic fix is key salting:

    (key, value) → (key ⊕ salt = hash(value) % S, values…)   # S-way split
    → per-salt-bucket distinct + cap                          # phase 1 shuffle
    → (key) → merge the ≤ S capped lists, cap again           # phase 2 shuffle

The hot key's work is spread over S reducers in phase 1; phase 2 sees at most
S rows per key.  ``salt_buckets`` is the ``PipelineConfig.salt_buckets`` knob.
"""

from __future__ import annotations

import zlib

import pyarrow as pa


def collect_distinct_sample(ds, key: str, value: str, per_key_cap: int = 10,
                            salt_buckets: int = 16):
    """(key, values: list<string>, n_distinct_capped) — deterministic sample
    (lexicographically smallest ``per_key_cap`` distinct values per key)."""

    def add_salt(batch: pa.Table) -> pa.Table:
        vals = batch.column(value).to_pylist()
        salts = [zlib.crc32(v.encode()) % salt_buckets for v in vals]
        return pa.table({
            key: batch.column(key),
            value: batch.column(value),
            "__salt": pa.array(salts, pa.int32()),
        })

    def partial_distinct(batch: pa.Table) -> pa.Table:
        # Per-batch distinct + cap inside each (key, salt) — bounds what the
        # phase-1 shuffle moves for the hot key to cap × batches × buckets.
        seen: dict[tuple, list] = {}
        for k, v, s in zip(batch.column(key).to_pylist(),
                           batch.column(value).to_pylist(),
                           batch.column("__salt").to_pylist()):
            bucket = seen.setdefault((k, s), [])
            if v not in bucket:
                bucket.append(v)
        ks, vs, ss = [], [], []
        for (k, s), values in seen.items():
            for v in sorted(values)[:per_key_cap]:
                ks.append(k)
                vs.append(v)
                ss.append(s)
        return pa.table({key: pa.array(ks, pa.string()),
                         value: pa.array(vs, pa.string()),
                         "__salt": pa.array(ss, pa.int32())})

    import pandas as pd

    def reduce_salted(g: pd.DataFrame) -> pa.Table:
        out_k, out_v = [], []
        for k, grp in g.groupby(key, sort=True):
            vals = sorted(set(grp[value]))[:per_key_cap]
            out_k.append(k)
            out_v.append(vals)
        return pa.table({key: pa.array(out_k, pa.string()),
                         value + "s": pa.array(out_v, pa.list_(pa.string()))})

    def merge_final(g: pd.DataFrame) -> pa.Table:
        out_k, out_v, out_n = [], [], []
        for k, grp in g.groupby(key, sort=True):
            merged = sorted({v for lst in grp[value + "s"] for v in lst})
            out_k.append(k)
            out_v.append(merged[:per_key_cap])
            out_n.append(len(merged[:per_key_cap]))
        return pa.table({key: pa.array(out_k, pa.string()),
                         value + "s": pa.array(out_v, pa.list_(pa.string())),
                         "n_distinct_capped": pa.array(out_n, pa.int64())})

    from ontoray.stages.agg import _with_bucket

    salted = (ds.select_columns([key, value])
              .map_batches(add_salt, batch_format="pyarrow")
              .map_batches(partial_distinct, batch_format="pyarrow"))
    # Phase 1: group by (key, salt) — the hot key spreads over S reducers.
    phase1 = (salted.map_batches(lambda b: _with_bucket(b, [key, "__salt"], 64),
                                 batch_format="pyarrow")
              .groupby("__bucket").map_groups(
                  lambda g: reduce_salted(g.drop(columns=["__bucket", "__salt"])),
                  batch_format="pandas"))
    # Phase 2: unsalt — at most S capped rows per key remain.
    return (phase1.map_batches(lambda b: _with_bucket(b, [key], 64),
                               batch_format="pyarrow")
            .groupby("__bucket").map_groups(
                lambda g: merge_final(g.drop(columns=["__bucket"])),
                batch_format="pandas"))

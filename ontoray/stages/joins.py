"""Explicit partitioned hash join.

Ray 2.49's native ``Dataset.join`` proved unreliable when chained (the second
join intermittently fails schema resolution), so wide joins use the portable
pattern: add ``bucket = stable_hash(key) % B`` to both sides, tag each side,
union, ``groupby(bucket)`` (one hash shuffle), and pandas-merge each bucket in
``map_groups``.  Deterministic (fixed-key siphash via
``pd.util.hash_pandas_object``), skew-safe for the bucket count chosen, and
exactly the strategy a multi-node shuffle would use.
"""

from __future__ import annotations

import pandas as pd


def _bucketize(df: pd.DataFrame, key: str, num_partitions: int, side: str) -> pd.DataFrame:
    df = df.copy()
    h = pd.util.hash_pandas_object(df[key].astype("string").fillna(""), index=False)
    df["__bucket"] = (h % num_partitions).astype("int64")
    df["__side"] = side
    return df


def hash_join(left_ds, right_ds, left_on: str, right_on: str, how: str = "inner",
              num_partitions: int = 16, right_cols: list[str] | None = None,
              suffix: str = "_r"):
    """Join two Datasets on a single key column.

    Returns a Dataset with the left columns plus the right side's
    ``right_cols`` (default: all non-key columns), suffixed on collision.
    ``how`` ∈ {inner, left} (left = left_outer).
    """
    left_schema = left_ds.schema().names
    right_schema = right_ds.schema().names
    rcols = right_cols if right_cols is not None else [c for c in right_schema if c != right_on]
    rename = {c: (c + suffix if c in left_schema else c) for c in rcols}
    out_cols = left_schema + [rename[c] for c in rcols]
    pd_how = {"inner": "inner", "left": "left"}[how]

    lmap = lambda df: _bucketize(df, left_on, num_partitions, "L")  # noqa: E731

    def rmap(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[right_on] + rcols].rename(columns=rename)
        return _bucketize(df, right_on, num_partitions, "R")

    l_tagged = left_ds.map_batches(lmap, batch_format="pandas")
    r_tagged = right_ds.map_batches(rmap, batch_format="pandas")

    # Union needs a shared schema: pad each side with the other's columns.
    all_cols = out_cols + ([right_on] if right_on not in out_cols else []) + ["__bucket", "__side"]

    def pad(df: pd.DataFrame) -> pd.DataFrame:
        return df.reindex(columns=all_cols)

    unioned = l_tagged.map_batches(pad, batch_format="pandas").union(
        r_tagged.map_batches(pad, batch_format="pandas"))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == "L"][left_schema]
        rf = g[g["__side"] == "R"][[right_on] + [rename[c] for c in rcols]]
        merged = lf.merge(rf, how=pd_how, left_on=left_on, right_on=right_on)
        return merged.reindex(columns=out_cols)

    return unioned.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")

"""Distributed set operations: INTERSECT / EXCEPT (distinct semantics).

Mirrors ANSI ``INTERSECT`` / ``EXCEPT`` over one key column from each side
(the reference's gold-vs-generated set comparisons — reference
src/evaluation/metrics-style set ops — generalized to table scale).

Scale shape: each side collapses to its per-batch DISTINCT values tagged
with a side flag BEFORE any exchange, so the single two-phase
``hash_aggregate`` moves vocabulary-scale rows (each batch emits a value at
most once per side), never data-scale.  The reduce is a vectorized
pyarrow ``max`` of the side flags per value; membership filtering is an
Arrow compute kernel.  No driver materialization, no Python-per-group.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ontoray.stages.agg import hash_aggregate


def _tagged(ds, col: str, flag_l: int, flag_r: int):
    """Per-batch distinct values of ``col`` tagged (in_l, in_r)."""
    def tag(batch: pa.Table) -> pa.Table:
        vals = pc.unique(batch.column(col).combine_chunks()
                         if isinstance(batch.column(col), pa.ChunkedArray)
                         else batch.column(col))
        n = len(vals)
        return pa.table({
            "val": vals,
            "in_l": pa.array([flag_l] * n, pa.int64()),
            "in_r": pa.array([flag_r] * n, pa.int64()),
        })
    return ds.select_columns([col]).map_batches(tag, batch_format="pyarrow")


def _membership(left_ds, right_ds, left_col: str, right_col: str,
                num_buckets: int):
    """One row per distinct value with (in_l, in_r) membership flags."""
    tagged = _tagged(left_ds, left_col, 1, 0).union(
        _tagged(right_ds, right_col, 0, 1))
    return hash_aggregate(
        tagged, ["val"],
        partial_aggs=[("in_l", "max"), ("in_r", "max")],
        aggs=[("in_l_max", "max"), ("in_r_max", "max")],
        rename={"in_l_max_max": "in_l", "in_r_max_max": "in_r"},
        num_buckets=num_buckets)


def _select(members, predicate, out_col: str):
    def pick(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        return pa.table({out_col: batch.column("val").filter(mask)})
    return members.map_batches(pick, batch_format="pyarrow")


def intersect_distinct(left_ds, right_ds, left_col: str, right_col: str,
                       out_col: str | None = None, num_buckets: int = 32):
    """ANSI ``INTERSECT``: distinct values present in BOTH sides.

    Output: one column (named ``out_col``, default the left column name),
    one row per qualifying distinct value, unordered.
    """
    members = _membership(left_ds, right_ds, left_col, right_col, num_buckets)
    return _select(
        members,
        lambda b: pc.and_(pc.equal(b.column("in_l"), 1),
                          pc.equal(b.column("in_r"), 1)),
        out_col or left_col)


def except_distinct(left_ds, right_ds, left_col: str, right_col: str,
                    out_col: str | None = None, num_buckets: int = 32):
    """ANSI ``EXCEPT``: distinct left values absent from the right side."""
    members = _membership(left_ds, right_ds, left_col, right_col, num_buckets)
    return _select(
        members,
        lambda b: pc.and_(pc.equal(b.column("in_l"), 1),
                          pc.equal(b.column("in_r"), 0)),
        out_col or left_col)

"""Small driver-side helpers."""

from __future__ import annotations


def column_lists(ds, cols: list[str]) -> dict[str, list]:
    """Collect selected columns as Python lists via Arrow batches — avoids
    ``take_all``'s per-row dict materialization (~5-10x faster at 10^5+ rows)."""
    out: dict[str, list] = {c: [] for c in cols}
    for b in ds.select_columns(cols).iter_batches(batch_size=None, batch_format="pyarrow"):
        for c in cols:
            out[c].extend(b.column(c).to_pylist())
    return out


def collect_table(ds, cols: list[str]):
    """Collect selected columns as ONE pyarrow Table (stays Arrow — feeds
    vectorized driver folds without a per-value Python materialization)."""
    import pyarrow as pa
    batches = list(ds.select_columns(cols).iter_batches(
        batch_size=None, batch_format="pyarrow"))
    if not batches:
        return None
    return pa.concat_tables(batches)

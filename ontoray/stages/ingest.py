"""Ingest stages: pages → cleaned docs.

Replaces the reference's file loader + ``_preprocess_text``
(src/data_loader.py:50-92, :13-47) with vectorized Ray ``map_batches`` over
Arrow batches: language filter (M21) → text derivation from ``html`` when the
``text`` column is empty → the byte-identical cleaner (M1) → early projection
dropping the wide ``html`` binary column → per-url first-wins dedup keyed on
``min(warc_ts)`` (the deterministic replacement for the reference's
arrival-order MERGE semantics, SURVEY O8/A6).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ontoray.text.clean import clean_many
from ontoray.text.html import html_to_text


def filter_lang(batch: pa.Table, lang: str = "en") -> pa.Table:
    return batch.filter(pc.equal(batch.column("lang"), lang))


def clean_batch(batch: pa.Table) -> pa.Table:
    """(…, text[, html]) -> (url[, warc_ts], doc_text); drops html early."""
    texts = batch.column("text").to_pylist()
    if "html" in batch.column_names:
        # Only touch html bytes for rows with empty pre-extracted text.
        need = [i for i, t in enumerate(texts) if not t]
        if need:
            html_col = batch.column("html")
            for i in need:
                texts[i] = html_to_text(html_col[i].as_py())
    cleaned = clean_many(texts)
    cols: dict = {"url": batch.column("url")}
    if "warc_ts" in batch.column_names:
        cols["warc_ts"] = batch.column("warc_ts")
    cols["doc_text"] = pa.array(cleaned, pa.string())
    return pa.table(cols)


def _first_by_ts(g: pd.DataFrame) -> pd.DataFrame:
    # Deterministic first-wins: min warc_ts, then lexicographic doc_text.
    cols = [c for c in ("warc_ts", "doc_text") if c in g.columns]
    return g.sort_values(cols, kind="mergesort").head(1)


def extract_docs(pages_ds, *, lang: str = "en", dedup_urls: bool | None = None):
    """pages Dataset -> docs Dataset (url[, warc_ts], doc_text)."""
    ds = pages_ds.map_batches(filter_lang, batch_format="pyarrow",
                              fn_kwargs={"lang": lang}, zero_copy_batch=True)
    ds = ds.map_batches(clean_batch, batch_format="pyarrow")
    if dedup_urls is None:
        schema = pages_ds.schema()
        dedup_urls = "warc_ts" in schema.names
    if dedup_urls:
        # Hash-shuffle on url; duplicate rate is low so groups are tiny.
        ds = ds.groupby("url").map_groups(_first_by_ts, batch_format="pandas")
    return ds

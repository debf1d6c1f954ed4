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


# First-wins dedup encodes (warc_ts, doc_text) into ONE lexicographically
# ordered string so the whole dedup is a vectorized min-aggregate — a
# per-group Python callback at one-group-per-url granularity is ~100x slower.
_TS_WIDTH = 20


def _encode_key(batch: pa.Table) -> pa.Table:
    ts = pc.cast(batch.column("warc_ts"), pa.int64()).to_pylist()
    texts = batch.column("doc_text").to_pylist()
    keys = [f"{t:0{_TS_WIDTH}d}\x1f{x}" for t, x in zip(ts, texts)]
    return pa.table({"url": batch.column("url"), "k": pa.array(keys, pa.string())})


def _decode_key(batch: pa.Table) -> pa.Table:
    text = pc.utf8_slice_codeunits(batch.column("k"), _TS_WIDTH + 1, 2**31 - 1)
    return pa.table({"url": batch.column("url"), "doc_text": text})


def extract_docs(pages_ds, *, lang: str = "en", dedup_urls: bool | None = None):
    """pages Dataset -> docs Dataset (url, doc_text).

    Per-url first-wins (min warc_ts, then lexicographic text) runs as a
    two-phase min-aggregate: per-batch pyarrow combiner, then one hash
    groupby over the (url, key) partials — fully vectorized, skew-proof."""
    ds = pages_ds.map_batches(filter_lang, batch_format="pyarrow",
                              fn_kwargs={"lang": lang}, zero_copy_batch=True)
    ds = ds.map_batches(clean_batch, batch_format="pyarrow")
    if dedup_urls is None:
        schema = pages_ds.schema()
        dedup_urls = "warc_ts" in schema.names
    if dedup_urls:
        from ontoray.stages.agg import hash_aggregate
        ds = hash_aggregate(
            ds.map_batches(_encode_key, batch_format="pyarrow"), ["url"],
            partial_aggs=[("k", "min")],
            aggs=[("k_min", "min")],
            rename={"k_min_min": "k"},
        ).map_batches(_decode_key, batch_format="pyarrow")
    else:
        ds = ds.select_columns(["url", "doc_text"])
    return ds

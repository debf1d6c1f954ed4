"""Ingest stages: pages → cleaned docs.

Replaces the reference's file loader + ``_preprocess_text``
(src/data_loader.py:50-92, :13-47) with vectorized Ray ``map_batches`` over
Arrow batches: language filter (M21) → text derivation from ``html`` when the
``text`` column is empty → the byte-identical cleaner (M1) → early projection
dropping the wide ``html`` binary column → per-url first-wins dedup (the
deterministic replacement for the reference's arrival-order MERGE semantics,
SURVEY O8/A6).

First-wins dedup is SHUFFLE-FREE on the corpus: a side pass aggregates only
(url, 40-char order key) rows — key = (warc_ts, crc32(text), len(text)),
text-only so the pass reads four skinny columns and never the wide ``html``
one — and keeps just the urls with duplicates (dup-rate-bounded, tiny); that
winner map is broadcast and the main text pipeline filters locally.  The
corpus text never enters an all-to-all.  At 10^12 urls the winner map stays
dup-bounded;
if even that outgrows broadcast, the same winner table semi-joins via
stages/joins.hash_join, or the corpus is laid out hash-partitioned by url at
ingest making dedup partition-local.  Rows that TIE on the winning key
(byte-identical duplicate records, or a ~2^-32 crc collision) are routed
through a tiny keyed min-aggregate so exactly one row survives per url.
"""

from __future__ import annotations

import zlib

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


def _winner_keys(batch: pa.Table) -> pa.Table:
    """40-char order key over the pre-extracted TEXT bytes:
    (warc_ts, crc32(text), len(text)).  Deliberately text-only so the winner
    pass never touches the wide ``html`` column — its read prunes to four
    skinny columns (at web scale ``html`` dominates the corpus bytes).  Rows
    that tie on this key (e.g. several empty-text captures of one url with
    different html) route through the keyed tie aggregate, whose
    min(doc_text) break is deterministic and mirrored by the oracle."""
    ts = pc.cast(batch.column("warc_ts"), pa.int64()).to_pylist()
    texts = batch.column("text").to_pylist()
    keys = []
    for t, x in zip(ts, texts):
        raw = x.encode() if x else b""
        keys.append(f"{t:020d}{zlib.crc32(raw):010d}{len(raw):010d}")
    return pa.table({"url": batch.column("url"), "k": pa.array(keys, pa.string())})


def compute_dup_winners(pages_ds, lang: str = "en") -> tuple[dict[str, str], dict[str, str]]:
    """(winners, ties) for urls with MORE THAN ONE row (tiny, dup-bounded).

    ``winners`` maps url -> winning 40-char key; ``ties`` is the subset whose
    winning key is shared by >= 2 rows (byte-identical duplicate records, e.g.
    the same crawl record stored twice) — those urls cannot be deduplicated by
    a batch-local key filter and are routed through a keyed min-aggregate
    instead.  Aggregates only (url, key) rows — no corpus text all-to-all."""
    from ontoray.stages.agg import hash_aggregate
    from ontoray.util import column_lists

    cols = [c for c in ("url", "warc_ts", "text", "lang")
            if c in pages_ds.schema().names]
    keyed = (pages_ds.select_columns(cols)
             .map_batches(filter_lang, batch_format="pyarrow",
                          fn_kwargs={"lang": lang}, zero_copy_batch=True)
             .map_batches(_winner_keys, batch_format="pyarrow"))
    # Per (url, key) multiplicity first so the per-url reduce can carry the
    # winner key's own count (the tie detector) alongside the url total.
    per_key = hash_aggregate(keyed, ["url", "k"],
                             partial_aggs=[("k", "count")],
                             aggs=[("k_count", "sum")], rename={"k_count_sum": "nk"})

    def enc(batch: pa.Table) -> pa.Table:
        v = [f"{k}{n:010d}" for k, n in zip(batch.column("k").to_pylist(),
                                            batch.column("nk").to_pylist())]
        return pa.table({"url": batch.column("url"),
                         "v": pa.array(v, pa.string()),
                         "nk": batch.column("nk")})

    agg = hash_aggregate(per_key.map_batches(enc, batch_format="pyarrow"), ["url"],
                         partial_aggs=[("v", "min"), ("nk", "sum")],
                         aggs=[("v_min", "min"), ("nk_sum", "sum")],
                         rename={"v_min_min": "v", "nk_sum_sum": "n"})
    dups = agg.filter(expr="n >= 2")
    cl = column_lists(dups, ["url", "v"])
    winners: dict[str, str] = {}
    ties: dict[str, str] = {}
    for u, v in zip(cl["url"], cl["v"]):
        k, nk = v[:40], int(v[40:])
        winners[u] = k
        if nk >= 2:
            ties[u] = k
    return winners, ties


def _shuffle_dedup(docs_ds):
    """Alternative first-wins path: encode (warc_ts, crc, len, text) into one
    lexicographically ordered key and min-aggregate — shuffles the cleaned
    text once.  Wins when the corpus re-read for the winner pass is more
    expensive than one text shuffle (fast local object store, cold storage)."""
    from ontoray.stages.agg import hash_aggregate

    def encode(batch: pa.Table) -> pa.Table:
        keyed = _winner_keys(batch)
        cleaned = clean_batch(batch)
        ks = [f"{k}\x1f{t}" for k, t in zip(keyed.column("k").to_pylist(),
                                            cleaned.column("doc_text").to_pylist())]
        return pa.table({"url": batch.column("url"), "k": pa.array(ks, pa.string())})

    def decode(batch: pa.Table) -> pa.Table:
        text = pc.utf8_slice_codeunits(batch.column("k"), 41, 2**31 - 1)
        return pa.table({"url": batch.column("url"), "doc_text": text})

    return hash_aggregate(
        docs_ds.map_batches(encode, batch_format="pyarrow"), ["url"],
        partial_aggs=[("k", "min")],
        aggs=[("k_min", "min")], rename={"k_min_min": "k"},
    ).map_batches(decode, batch_format="pyarrow")


def extract_docs(pages_ds, *, lang: str = "en", dedup_urls: bool | None = None,
                 dedup_strategy: str = "broadcast_winners"):
    """pages Dataset -> docs Dataset (url, doc_text).

    Per-url first-wins = min (warc_ts, crc32(raw), len(raw)).  Default
    strategy 'broadcast_winners' is shuffle-free: a side aggregate over tiny
    key rows finds winners for DUPLICATED urls only and the broadcast winner
    map filters locally (no corpus bytes cross the network — the multi-node
    choice).  'shuffle' min-aggregates the cleaned text in one all-to-all
    (single read; can win on a single node's shm object store)."""
    import ray

    if dedup_urls is None:
        dedup_urls = "warc_ts" in pages_ds.schema().names

    if not dedup_urls:
        ds = pages_ds.map_batches(filter_lang, batch_format="pyarrow",
                                  fn_kwargs={"lang": lang}, zero_copy_batch=True)
        return ds.map_batches(clean_batch, batch_format="pyarrow").select_columns(
            ["url", "doc_text"])

    if dedup_strategy == "shuffle":
        ds = pages_ds.map_batches(filter_lang, batch_format="pyarrow",
                                  fn_kwargs={"lang": lang}, zero_copy_batch=True)
        return _shuffle_dedup(ds)

    winners, ties = compute_dup_winners(pages_ds, lang)
    winners_ref = ray.put(winners)

    def filter_clean(batch: pa.Table) -> pa.Table:
        wmap = ray.get(winners_ref)
        batch = filter_lang(batch, lang)
        if wmap:
            urls = batch.column("url").to_pylist()
            dup_idx = [i for i, u in enumerate(urls) if u in wmap]
            if dup_idx:
                # Key computation only for rows of duplicated urls (~dup rate).
                sub = batch.take(pa.array(dup_idx, pa.int64()))
                keys = _winner_keys(sub).column("k").to_pylist()
                keep = [True] * batch.num_rows
                for i, k in zip(dup_idx, keys):
                    # Tied urls (byte-identical duplicate records) are dropped
                    # entirely here and re-emitted exactly once by the keyed
                    # aggregate below — a batch-local filter cannot pick one
                    # of several rows with the SAME winning key.
                    if wmap[urls[i]] != k or urls[i] in ties:
                        keep[i] = False
                batch = batch.filter(pa.array(keep, pa.bool_()))
        out = clean_batch(batch)
        return out.select(["url", "doc_text"])

    main = pages_ds.map_batches(filter_clean, batch_format="pyarrow")
    if not ties:
        return main

    # Tie path (rare: identical records stored twice): winner rows of tied
    # urls are byte-identical, so a per-url min-aggregate over just those rows
    # keeps exactly one.  Tie-bounded extra read, guarded to zero cost when no
    # ties exist.
    from ontoray.stages.agg import hash_aggregate
    ties_ref = ray.put(ties)
    tie_urls_arr = pa.array(sorted(ties))
    _EMPTY_DOCS = pa.table({"url": pa.array([], pa.string()),
                            "doc_text": pa.array([], pa.string())})

    def tied_clean(batch: pa.Table) -> pa.Table:
        b = filter_lang(batch, lang)
        b = b.filter(pc.is_in(b.column("url"), value_set=tie_urls_arr))
        if b.num_rows == 0:
            return _EMPTY_DOCS
        tmap = ray.get(ties_ref)
        keys = _winner_keys(b).column("k").to_pylist()
        urls = b.column("url").to_pylist()
        mask = pa.array([tmap.get(u) == k for u, k in zip(urls, keys)], pa.bool_())
        b = b.filter(mask)
        if b.num_rows == 0:
            return _EMPTY_DOCS
        return clean_batch(b).select(["url", "doc_text"])

    tie_docs = hash_aggregate(
        pages_ds.map_batches(tied_clean, batch_format="pyarrow"), ["url"],
        partial_aggs=[("doc_text", "min")],
        aggs=[("doc_text_min", "min")], rename={"doc_text_min_min": "doc_text"})
    return main.union(tie_docs)

"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword-profile heuristic), quality scoring (length / token /
stopword ratios), token counting (whitespace + BPE-ish regex), and rolling-hash
document fingerprinting.  All vectorized-enough per-batch transforms over the
``documents`` table; the SQL-mirrorable ones use only RE2 + integer math so a
DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

import re

import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")
# BPE-ish word/number/punct splitter (GPT-2-style contractions omitted —
# lowercase corpora): runs of letters, runs of digits, single punctuation.
BPE_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
STOP_PROFILES = {
    "en": {"the", "a", "and", "of", "to", "is", "in", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que"},
}


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text, …) -> per-doc quality stats.  Integer counts + one
    final division (rounded to 6) so the DuckDB mirror matches exactly."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    n_chars, n_tokens, n_stop, n_bpe = [], [], [], []
    stop = STOP_PROFILES["en"]
    for t in texts:
        toks = TOKEN_RE.findall(t)
        n_chars.append(len(t))
        n_tokens.append(len(toks))
        n_stop.append(sum(1 for w in toks if w in stop))
        n_bpe.append(len(BPE_RE.findall(t)))
    stop_ratio = [round(s / n, 6) if n else 0.0 for s, n in zip(n_stop, n_tokens)]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
    })


def sql_doc_stats(table: str = "documents") -> str:
    stopw = ", ".join(f"'{w}'" for w in sorted(STOP_PROFILES["en"]))
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
           CAST(length(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
           CASE WHEN length(regexp_extract_all(text, '[a-z0-9]+')) = 0 THEN 0.0
                ELSE round(CAST(length(list_filter(regexp_extract_all(text, '[a-z0-9]+'),
                                                    w -> w IN ({stopw}))) AS DOUBLE)
                           / length(regexp_extract_all(text, '[a-z0-9]+')), 6) END AS stopword_ratio
    FROM {table}
    """


class LangId:
    """Stopword-profile language identifier — an actor-pool stage: profiles
    are built once per actor in ``__init__`` (T1-style state)."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in STOP_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            toks = TOKEN_RE.findall(t)
            best, best_n = "und", 0
            for lang in sorted(self.profiles):
                n = sum(1 for w in toks if w in self.profiles[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lang_pred": pa.array(preds, pa.string()),
        })


def _concat_aranges(lens: "np.ndarray") -> "np.ndarray":
    """concatenate([arange(l) for l in lens]) without the Python loop."""
    import numpy as np
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    out[ends[:-1][lens[:-1] > 0]] = -(lens[:-1][lens[:-1] > 0] - 1)
    return np.cumsum(out)


def _md5_32(s: str) -> int:
    """First 32 bits of md5 — chosen over crc32 because DuckDB ships md5()
    (and not crc32), so the SQL oracle reproduces the hash bit-for-bit."""
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def fingerprint_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Rolling-hash (Rabin-Karp over token md5-32s) document fingerprint:
    min-hash of all ``window``-token windows — stable int64 per doc."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    fps = []
    B, M = 1_000_003, (1 << 61) - 1
    # ONE vectorized exact-md5 pass over every token in the batch; the
    # sequential Rabin-Karp recurrence is replaced by its closed form
    # h(win) = sum_j hs[win+j] * B^(window-1-j) mod M — identical values
    # (both are the canonical residue), computed as `window` exact
    # mulmod-2^61-1 folds over a sliding-window view.
    from ontoray.extras.dedup import _mulmod61
    from ontoray.extras.fastmd5 import md5_first32
    import numpy as np
    toks_per = [TOKEN_RE.findall(t) for t in texts]
    # One concatenated hash array with per-doc zero padding to >= window,
    # so ALL docs' windows fold in `window` vectorized mulmod passes
    # (per-doc numpy calls are overhead-bound on short web docs).
    n_tok = np.array([len(ts) for ts in toks_per], dtype=np.int64)
    n_pad = np.maximum(n_tok, window)
    pad_ends = np.cumsum(n_pad)
    pad_starts = pad_ends - n_pad
    total = int(pad_ends[-1]) if len(texts) else 0
    hv = np.zeros(total, dtype=np.uint64)
    flat = [w.encode() for ts in toks_per for w in ts]
    if flat:
        src = np.repeat(pad_starts, n_tok) + _concat_aranges(n_tok)
        hv[src] = md5_first32(flat).astype(np.uint64)
    pows = [np.array([pow(B, window - 1 - j, M)], dtype=np.uint64)
            for j in range(window)]
    if total:
        W = np.lib.stride_tricks.sliding_window_view(hv, window)
        # valid window start positions: per doc, pad_start .. pad_end-window
        n_win = n_pad - window + 1
        wstarts = np.repeat(pad_starts, n_win) + _concat_aranges(n_win)
        acc = np.zeros(len(wstarts), dtype=np.uint64)
        for j in range(window):
            acc = acc + _mulmod61(pows[j], W[wstarts, j])[0]  # each term < M
            acc = np.where(acc >= M, acc - M, acc)
        doc_starts = np.concatenate(([0], np.cumsum(n_win)[:-1]))
        fps = np.minimum.reduceat(acc, doc_starts).astype(np.int64).tolist()
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fingerprint": pa.array(fps, pa.int64()),
    })


def sql_text_fingerprint(table: str = "documents", window: int = 8) -> str:
    """DuckDB mirror of ``fingerprint_batch``: token md5-32s, zero-padded to
    ``window``, Rabin-Karp fold per window via list_reduce in HUGEINT mod
    2^61-1, min across windows."""
    M = (1 << 61) - 1
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS l FROM {table}
    ), hashed AS (
      SELECT doc_id,
             [('0x' || substr(md5(l[i]), 1, 8))::UBIGINT
              for i in range(1, len(l) + 1)] AS hl0
      FROM toks
    ), padded AS (
      SELECT doc_id,
             CASE WHEN len(hl0) >= {window} THEN hl0
                  ELSE hl0 || [0::UBIGINT for i in range(1, {window} - len(hl0) + 1)]
             END AS hl
      FROM hashed
    ), wins AS (
      SELECT doc_id,
             [list_reduce(hl[i:i + {window - 1}],
                          (a, b) -> ((a::HUGEINT * 1000003 + b) % {M})::UBIGINT)
              for i in range(1, len(hl) - {window} + 2)] AS ws
      FROM padded
    )
    SELECT doc_id, CAST(list_aggregate(ws, 'min') AS BIGINT) AS fingerprint
    FROM wins
    """


# --- deterministic stratified sampling --------------------------------------

def stratified_sample(ds, rates: dict[str, float], key_col: str = "lang",
                      id_col: str = "doc_id", default_rate: float = 0.0,
                      salt: str = "strat1"):
    """Per-stratum deterministic hash sampling: row kept iff
    md5_32(salt:key:id) / 2^32 < rates[key].  The classic training-data
    downsampler ("keep 10% of en, 50% of de, ...") — embarrassingly parallel,
    no shuffle, no RNG state, reproducible across runs/cluster sizes, and
    exactly DuckDB-mirrorable (sql_stratified_sample).

    Rates are compared against a 32-bit uniform, so a rate r keeps
    floor-accurate ~r of each stratum regardless of partitioning."""
    import hashlib

    import pyarrow as pa

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        mask = []
        for k, i in zip(keys, ids):
            r = rates.get(k, default_rate)
            h = int(hashlib.md5(f"{salt}:{k}:{i}".encode()).hexdigest()[:8], 16)
            mask.append(h < r * 4294967296.0)
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def sql_stratified_sample(rates: dict[str, float], table: str = "documents",
                          key_col: str = "lang", id_col: str = "doc_id",
                          default_rate: float = 0.0, salt: str = "strat1",
                          cols: str = "doc_id, lang") -> str:
    """DuckDB mirror of ``stratified_sample``: identical md5-32 threshold
    per (stratum, id).  The comparison runs in DOUBLE on both sides."""
    cases = " ".join(
        f"WHEN {key_col} = '{k}' THEN {r!r}" for k, r in sorted(rates.items()))
    return f"""
    SELECT {cols} FROM {table}
    WHERE ('0x' || substr(md5('{salt}:' || {key_col} || ':' || {id_col}), 1, 8))::UBIGINT
          < (CASE {cases} ELSE {default_rate!r} END) * 4294967296.0
    """


def per_group_cap(ds, n: int, key_col: str = "source", id_col: str = "doc_id",
                  salt: str = "cap1"):
    """Keep at most ``n`` rows per group, chosen deterministically — the
    web-corpus "domain cap" curation step (at most n docs per host / source /
    near-dup cluster).  Every row gets a uniform rank md5(salt:key:id); a
    group's ``n`` lexicographically-smallest ranks survive.

    Scale shape: the per-batch combiner keeps <= n rows per (group, batch)
    BEFORE the exchange, so the shuffle moves at most n x groups x blocks
    rows — never the corpus; the final per-group head-n runs in one
    ``groupby(key).map_groups`` over those bounded groups.  Deterministic
    across runs, cluster sizes and partitionings (rank depends only on row
    identity), and exactly DuckDB-mirrorable (``sql_per_group_cap``:
    row_number() over the same md5 rank).  Returns (key, id, rn) with
    rn = 1..n in rank order."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    def local_topn(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        ranks = [hashlib.md5(f"{salt}:{k}:{i}".encode()).hexdigest()
                 for k, i in zip(keys, ids)]
        t = pa.table({key_col: pa.array(keys, batch.schema.field(key_col).type),
                      id_col: pa.array(ids, batch.schema.field(id_col).type),
                      "__rank": pa.array(ranks, pa.string())})
        idx = pc.sort_indices(t, sort_keys=[(key_col, "ascending"),
                                            ("__rank", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        kept, seen, count = [], None, 0
        for i, k in enumerate(t.column(key_col).to_pylist()):
            if k != seen:
                seen, count = k, 0
            if count < n:
                kept.append(i)
            count += 1
        return t.take(pa.array(kept, pa.int64()))

    def head_n(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("__rank", "ascending"),
                                            (id_col, "ascending")])
        g = g.take(idx[:n]).drop_columns(["__rank"])
        return g.append_column("rn", pa.array(range(1, g.num_rows + 1),
                                              pa.int64()))

    from ontoray.stages.agg import default_coalesce
    return (ds.select_columns([key_col, id_col])
            .map_batches(local_topn, batch_format="pyarrow")
            .repartition(default_coalesce())
            .groupby(key_col).map_groups(head_n, batch_format="pyarrow"))


def sql_per_group_cap(n: int, table: str = "documents", key_col: str = "source",
                      id_col: str = "doc_id", salt: str = "cap1") -> str:
    """DuckDB mirror of ``per_group_cap``: identical md5 rank (hex-string
    compare ≡ VARCHAR compare, both ASCII-lexicographic), id tiebreak,
    row_number() head-n."""
    return f"""
    SELECT {key_col}, {id_col}, rn FROM (
      SELECT {key_col}, {id_col},
             row_number() OVER (
               PARTITION BY {key_col}
               ORDER BY md5('{salt}:' || {key_col} || ':' || {id_col}), {id_col}
             ) AS rn
      FROM {table})
    WHERE rn <= {n}
    """


# --- tf-idf keyword extraction ----------------------------------------------

def tfidf_top_terms(ds, k: int = 3, num_partitions: int = 16):
    """Per-document top-``k`` terms by tf·idf — distributed keyword
    extraction: (doc, term, tf) rows from an in-batch Counter combiner, a
    vocabulary-scale df aggregate, a partitioned hash join (df never
    broadcasts — the 100-TB vocabulary does not fit a driver dict), and a
    per-doc top-k group sort.  score = round(tf * ln(N/df), 6), ties broken
    by term asc — deterministic, and exactly mirrored by ``sql_tfidf_top``.
    """
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    n_docs = ds.count()

    def term_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter
        ids, ws, tfs = [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            for w, n in Counter(TOKEN_RE.findall(t or "")).items():
                ids.append(did)
                ws.append(w)
                tfs.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w": pa.array(ws, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    tf = ds.select_columns(["doc_id", "text"]).map_batches(
        term_counts, batch_format="pyarrow").materialize()

    # df = docs containing the term (each (doc, term) appears once in tf).
    df = hash_aggregate(tf.select_columns(["w"]), ["w"],
                        partial_aggs=[("w", "count")],
                        aggs=[("w_count", "sum")], rename={"w_count_sum": "df"},
                        num_buckets=num_partitions)

    joined = hash_join(tf, df, "w", "w", how="inner",
                       num_partitions=num_partitions, right_cols=["df"])

    def score(batch: pa.Table) -> pa.Table:
        tfs = batch.column("tf").to_pylist()
        dfs = batch.column("df").to_pylist()
        sc = [round(t * math.log(n_docs / d), 6) for t, d in zip(tfs, dfs)]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "term": batch.column("w"),
                         "score": pa.array(sc, pa.float64())})

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("score", "descending"),
                                            ("term", "ascending")])
        return g.take(idx[:k])

    return (joined.map_batches(score, batch_format="pyarrow")
            .groupby("doc_id").map_groups(topk, batch_format="pyarrow"))


def sql_tfidf_top(table: str = "documents", k: int = 3) -> str:
    """DuckDB mirror of ``tfidf_top_terms``: identical tokenization, tf/df
    counts, round(tf*ln(N/df), 6) scoring and (score desc, term asc) top-k."""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '[a-z0-9]+')) AS w
      FROM {table}
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w
    ), df AS (
      SELECT w, count(*) AS df FROM tf GROUP BY w
    ), n AS (SELECT count(*) AS n FROM {table}),
    scored AS (
      SELECT tf.doc_id, tf.w AS term,
             round(tf.tf * ln(n.n::DOUBLE / df.df), 6) AS score
      FROM tf JOIN df USING (w) CROSS JOIN n
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, score FROM ranked WHERE rn <= {k}
    """


# --- weighted (probability-proportional-to-size) sampling --------------------

def weighted_sample(ds, rate: float, weight_col: str = "n_chars",
                    id_col: str = "doc_id", salt: str = "wsamp1"):
    """Deterministic Poisson sampling with per-row inclusion probability
    proportional to ``weight_col``: row kept iff
    md5_32(salt:id) < min(1, weight * rate) * 2^32.

    The length-weighted variant of :func:`stratified_sample` (sample docs
    proportionally to their token/char mass so the SAMPLE's token budget is
    unbiased, not its doc count).  Embarrassingly parallel: no shuffle, no
    RNG state, reproducible across runs/cluster sizes/partitionings, and
    exactly DuckDB-mirrorable (``sql_weighted_sample`` — every float step is
    the same single IEEE op on both engines: weight*rate, min, *2^32)."""
    import hashlib

    import pyarrow as pa

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ws = batch.column(weight_col).to_pylist()
        mask = []
        for i, w in zip(ids, ws):
            h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
            p = w * rate
            if p > 1.0:
                p = 1.0
            mask.append(h < p * 4294967296.0)
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def sql_weighted_sample(rate: float, table: str = "documents",
                        weight_col: str = "n_chars", id_col: str = "doc_id",
                        salt: str = "wsamp1",
                        cols: str = "doc_id, n_chars") -> str:
    """DuckDB mirror of ``weighted_sample``: identical md5-32 uniform and
    identical double ops (w*rate, LEAST with 1.0, *2^32)."""
    return f"""
    SELECT {cols} FROM {table}
    WHERE ('0x' || substr(md5('{salt}:' || {id_col}), 1, 8))::UBIGINT
          < LEAST({weight_col} * {rate!r}, 1.0) * 4294967296.0
    """


# --- deterministic train/val/test split --------------------------------------

def hash_split(ds, fractions: list[tuple[str, float]] | None = None,
               id_col: str = "doc_id", salt: str = "split1"):
    """Assign every row a train/val/test split label deterministically:
    u = md5_32(salt:id) / 2^32, label = first split whose cumulative fraction
    exceeds u.  The split a row lands in depends only on its identity — stable
    across runs, cluster sizes, partitionings, and INCREMENTAL corpus growth
    (a new shard never reshuffles old rows between splits, the property a
    training pipeline needs for reproducible eval sets).  Embarrassingly
    parallel, no shuffle; exactly mirrored by ``sql_hash_split``."""
    import hashlib

    import pyarrow as pa

    fractions = fractions or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    labels = [l for l, _ in fractions]
    cums = []
    c = 0.0
    for _, f in fractions:
        c += f
        cums.append(c * 4294967296.0)
    cums[-1] = float(2 ** 64)          # last split absorbs fp residue

    def assign(batch: pa.Table) -> pa.Table:
        out = []
        for i in batch.column(id_col).to_pylist():
            h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
            for lbl, cut in zip(labels, cums):
                if h < cut:
                    out.append(lbl)
                    break
        return batch.append_column("split", pa.array(out, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def sql_hash_split(fractions: list[tuple[str, float]] | None = None,
                   table: str = "documents", id_col: str = "doc_id",
                   salt: str = "split1", cols: str = "doc_id, source") -> str:
    """DuckDB mirror of ``hash_split``: identical md5-32 uniform and the same
    DOUBLE cumulative thresholds (computed here, embedded as repr literals,
    so both engines compare the same IEEE values)."""
    fractions = fractions or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    whens, c = [], 0.0
    for lbl, f in fractions[:-1]:
        c += f
        whens.append(f"WHEN u < {c * 4294967296.0!r} THEN '{lbl}'")
    default = fractions[-1][0]
    return f"""
    SELECT {cols}, CASE {' '.join(whens)} ELSE '{default}' END AS split FROM (
      SELECT *, ('0x' || substr(md5('{salt}:' || {id_col}), 1, 8))::UBIGINT::DOUBLE AS u
      FROM {table})
    """


# --- PII redaction ------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Python re and
# DuckDB's RE2 (no lookaround, no backrefs; ASCII \b and \d agree).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
]


def redact_pii(ds, text_col: str = "text"):
    """Scrub emails / IPv4s / phone-shaped numbers from ``text_col`` (the
    standard pre-training privacy pass).  Per-batch compiled-regex
    substitution over the text column — embarrassingly parallel, no shuffle;
    emits the redacted text plus ``n_redactions`` so downstream audits can
    aggregate redaction rates without re-scanning.  Pattern-for-pattern
    mirrored by ``sql_redact_pii`` (RE2-compatible subset only)."""
    import re as _re

    import pyarrow as pa

    compiled = [(_re.compile(p), tok) for _, p, tok in PII_PATTERNS]

    def scrub(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out, counts = [], []
        for t in texts:
            t = t or ""
            # Counts run per-pattern on the ORIGINAL text (a phone inside an
            # email match still counts once as a phone); replacements chain in
            # pattern order — both exactly as the SQL mirror computes them.
            n = sum(len(rx.findall(t)) for rx, _ in compiled)
            for rx, tok in compiled:
                t = rx.sub(tok, t)
            out.append(t)
            counts.append(n)
        batch = batch.drop_columns([text_col])
        return (batch.append_column(text_col, pa.array(out, pa.string()))
                     .append_column("n_redactions", pa.array(counts, pa.int64())))

    return ds.map_batches(scrub, batch_format="pyarrow")


def sql_redact_pii(table: str = "documents", text_col: str = "text",
                   cols: str = "doc_id") -> str:
    """DuckDB mirror of ``redact_pii``: the same chained regexp_replace
    (global) and per-pattern match counts."""
    expr = f"coalesce({text_col}, '')"
    n_terms = []
    for _, p, tok in PII_PATTERNS:
        pat = p.replace("'", "''")
        # Counts per pattern on the ORIGINAL text; replacements chain (each
        # regexp_replace wraps the previous) — both identical to the engine.
        n_terms.append(f"len(regexp_extract_all({expr}, '{pat}'))")
    rep = expr
    for _, p, tok in PII_PATTERNS:
        pat = p.replace("'", "''")
        rep = f"regexp_replace({rep}, '{pat}', '{tok}', 'g')"
    return (f"SELECT {cols}, {rep} AS {text_col}, "
            f"({' + '.join(n_terms)})::BIGINT AS n_redactions FROM {table}")


# --- Gopher-style repetition quality signals ----------------------------------

def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals from the Gopher quality rules
    (Rae et al. 2021, A.1.1): the character fraction claimed by the single
    most frequent word n-gram (n = 2, 3) and the duplicate-occurrence
    fraction of word n-grams (n = 2, 5).

    Definitions (identical on both engines, documented because Gopher leaves
    tie-breaks unspecified):

    - tokens = lowercase-alnum runs ``[a-z0-9]+`` (the repo's tokenizer);
      ``total_chars`` = length of the space-joined token string.
    - ``top{n}gram_frac`` = (count * len(gram_string)) / total_chars for the
      most frequent n-gram; ties broken by (count, len, gram) descending.
      0.0 when the doc has < n tokens or no characters.
    - ``dup{n}gram_frac`` = 1 - distinct/total over the doc's n-gram
      OCCURRENCES (Gopher's char-weighted variant needs overlap attribution;
      the occurrence ratio is the standard simplification).  0.0 when < n
      tokens.

    Embarrassingly parallel per-batch transform — no shuffle; a Python loop
    over docs is fine here because each doc does Counter work proportional
    to its own token count (same cost class as tfidf's per-doc pass)."""
    from collections import Counter

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        out = {"top2gram_frac": [], "top3gram_frac": [],
               "dup2gram_frac": [], "dup5gram_frac": []}
        for t in batch.column(text_col).to_pylist():
            ws = TOKEN_RE.findall(t or "")
            tc = len(" ".join(ws))
            for n, col in ((2, "top2gram_frac"), (3, "top3gram_frac")):
                if len(ws) < n or tc == 0:
                    out[col].append(0.0)
                    continue
                c = Counter(" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1))
                g, cnt = max(c.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))
                out[col].append((cnt * len(g)) / tc)
            for n, col in ((2, "dup2gram_frac"), (5, "dup5gram_frac")):
                total = len(ws) - n + 1
                if total <= 0:
                    out[col].append(0.0)
                    continue
                nd = len({" ".join(ws[i:i + n]) for i in range(total)})
                out[col].append((total - nd) / total)
        return pa.table({id_col: ids,
                         **{k: pa.array(v, pa.float64()) for k, v in out.items()}})

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow")


def sql_repetition_stats(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """DuckDB mirror of ``repetition_stats``: identical tokenization, gram
    join, tie-break ordering, and single-division IEEE arithmetic (raw
    doubles — no rounding — match bit-for-bit because both engines compute
    one int/int division)."""
    def grams(n: int) -> str:
        return (f"SELECT {id_col}, array_to_string(ws[i:i+{n - 1}], ' ') AS g "
                f"FROM (SELECT {id_col}, ws, "
                f"unnest(range(1, greatest(nw-{n - 1},0)+1)) AS i FROM base)")

    def top(n: int) -> str:
        return (f"SELECT {id_col}, cnt, gl FROM ("
                f"SELECT {id_col}, count(*) AS cnt, length(g) AS gl, "
                f"row_number() OVER (PARTITION BY {id_col} "
                f"ORDER BY count(*) DESC, length(g) DESC, g DESC) AS rn "
                f"FROM g{n} GROUP BY {id_col}, g) t WHERE rn = 1")

    def dup(n: int) -> str:
        return (f"SELECT {id_col}, count(DISTINCT g) AS nd, count(*) AS nt "
                f"FROM g{n} GROUP BY {id_col}")

    return f"""
    WITH toks AS (
      SELECT {id_col}, regexp_extract_all(coalesce({text_col},''), '[a-z0-9]+') AS ws
      FROM {table}
    ), base AS (
      SELECT {id_col}, ws, len(ws) AS nw, length(array_to_string(ws, ' ')) AS tc
      FROM toks
    ), g2 AS ({grams(2)}), g3 AS ({grams(3)}), g5 AS ({grams(5)}),
    top2 AS ({top(2)}), top3 AS ({top(3)}),
    dup2 AS ({dup(2)}), dup5 AS ({dup(5)})
    SELECT b.{id_col},
      CASE WHEN t2.cnt IS NULL OR b.tc = 0 THEN 0.0
           ELSE (t2.cnt * t2.gl)::DOUBLE / b.tc::DOUBLE END AS top2gram_frac,
      CASE WHEN t3.cnt IS NULL OR b.tc = 0 THEN 0.0
           ELSE (t3.cnt * t3.gl)::DOUBLE / b.tc::DOUBLE END AS top3gram_frac,
      CASE WHEN d2.nt IS NULL OR d2.nt = 0 THEN 0.0
           ELSE (d2.nt - d2.nd)::DOUBLE / d2.nt::DOUBLE END AS dup2gram_frac,
      CASE WHEN d5.nt IS NULL OR d5.nt = 0 THEN 0.0
           ELSE (d5.nt - d5.nd)::DOUBLE / d5.nt::DOUBLE END AS dup5gram_frac
    FROM base b LEFT JOIN top2 t2 USING ({id_col}) LEFT JOIN top3 t3 USING ({id_col})
    LEFT JOIN dup2 d2 USING ({id_col}) LEFT JOIN dup5 d5 USING ({id_col})
    """


# --- LM sequence packing --------------------------------------------------------

def pack_sequences(ds, seq_len: int = 512, id_col: str = "doc_id",
                   text_col: str = "text", salt: str = "pack1"):
    """Assign every document its training-sequence slot: documents are laid
    out in a DETERMINISTIC pseudo-random order (md5 of the id — the
    training-order shuffle an LM pipeline wants, stable across runs and
    cluster sizes), token counts prefix-sum along that order, and each doc
    lands in ``seq_id = tok_start // seq_len`` (the sequence where it
    STARTS; the trainer's reader splits stragglers at the boundary).

    Scale shape — a distributed ordered prefix sum with NO global sort: the
    md5 order key's top byte forms 256 naturally-balanced ORDERED buckets;
    per-bucket token sums cross one two-phase metadata exchange, the driver
    cumsums 256 rows and broadcasts exclusive offsets, and each bucket sorts
    locally by (hash, id) and adds its offset (the ``running_total``
    composition, keyed by hash instead of time).

    Output: (id_col, n_tokens, tok_start, seq_id) — exactly mirrored by
    :func:`sql_pack_sequences` via a window cumsum over ``ORDER BY md5``."""
    import hashlib

    import numpy as np
    import ray

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = np.array([int.from_bytes(
            hashlib.md5(f"{salt}:{i}".encode()).digest()[:8], "big")
            for i in ids], dtype=np.uint64)
        nt = [len(TOKEN_RE.findall(t or ""))
              for t in batch.column(text_col).to_pylist()]
        return pa.table({
            id_col: batch.column(id_col),
            "h": pa.array(hs, pa.uint64()),
            "hb": pa.array((hs >> np.uint64(56)).astype(np.int64), pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
        })

    derived = ds.select_columns([id_col, text_col]).map_batches(
        derive, batch_format="pyarrow")

    sums = hash_aggregate(
        derived.select_columns(["hb", "n_tokens"]), ["hb"],
        partial_aggs=[("n_tokens", "sum")],
        aggs=[("n_tokens_sum", "sum")], rename={"n_tokens_sum_sum": "s"},
        num_buckets=16).take_all()                       # <= 256 rows
    sums.sort(key=lambda r: r["hb"])
    offsets, acc = {}, 0
    for r in sums:
        offsets[r["hb"]] = acc
        acc += r["s"]
    off_ref = ray.put(offsets)

    def scan(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[g.column("hb")[0].as_py()]
        ids = np.array(g.column(id_col).to_pylist(), dtype=np.int64)
        h = g.column("h").to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        starts = np.cumsum(nt[order]) - nt[order] + off
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        starts = starts[inv]
        return pa.table({
            id_col: g.column(id_col),
            "n_tokens": pa.array(nt, pa.int64()),
            "tok_start": pa.array(starts, pa.int64()),
            "seq_id": pa.array(starts // seq_len, pa.int64()),
        })

    return (derived.repartition(default_coalesce())
            .groupby("hb").map_groups(scan, batch_format="pyarrow"))


def sql_pack_sequences(seq_len: int = 512, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text",
                       salt: str = "pack1") -> str:
    """DuckDB mirror of ``pack_sequences``: the window cumsum over the same
    md5 order (16-hex-char prefix comparison == the engine's uint64 prefix
    comparison, both big-endian)."""
    return f"""
    WITH t AS (
      SELECT {id_col},
             CAST(len(regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             substr(md5('{salt}:' || {id_col}), 1, 16) AS h
      FROM {table}
    )
    SELECT {id_col}, n_tokens,
           (sum(n_tokens) OVER (ORDER BY h, {id_col} ROWS UNBOUNDED PRECEDING)
            - n_tokens)::BIGINT AS tok_start,
           ((sum(n_tokens) OVER (ORDER BY h, {id_col} ROWS UNBOUNDED PRECEDING)
             - n_tokens) // {seq_len})::BIGINT AS seq_id
    FROM t
    """


# --- n-gram language-model counts --------------------------------------------

def bigram_counts(ds, text_col: str = "text", min_count: int = 1,
                  num_partitions: int = 16):
    """Corpus bigram table (w1, w2, n, n_w1, p_micro) — the LM-data count
    step (KenLM-style n-gram estimation): per-batch Counter combiner over
    token windows (bigram rows never leave the batch unaggregated), two-phase
    bucketed count, prefix totals derived FROM the bigram table itself (one
    vocabulary-scale aggregate, no second corpus pass), partitioned
    hash_join (the 100-TB bigram vocabulary fits no driver dict), exact
    integer fixed-point conditional probability
    p_micro = (n * 10**6) // n_w1 — integer floor division on both engines,
    so no float-rounding-mode divergence (Python round() is banker's
    rounding, DuckDB round() is half-away-from-zero; they disagree on exact
    binary ties like 1/128 — r2 ADVICE)."""
    from collections import Counter

    import pyarrow as pa

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    def pairs(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = TOKEN_RE.findall(t or "")
            cnt.update(zip(toks, toks[1:]))
        w1, w2, c = [], [], []
        for (a, b), n in cnt.items():
            w1.append(a)
            w2.append(b)
            c.append(n)
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "c": pa.array(c, pa.int64())})

    bg = hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"), ["w1", "w2"],
        partial_aggs=[("c", "sum")], aggs=[("c_sum", "sum")],
        rename={"c_sum_sum": "n"}, num_buckets=num_partitions).materialize()

    pref = hash_aggregate(
        bg.select_columns(["w1", "n"]), ["w1"],
        partial_aggs=[("n", "sum")], aggs=[("n_sum", "sum")],
        rename={"n_sum_sum": "n_w1"}, num_buckets=num_partitions)

    joined = hash_join(bg, pref, "w1", "w1", how="inner",
                       num_partitions=num_partitions, right_cols=["n_w1"])

    def prob(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("n_w1").to_numpy(zero_copy_only=False).astype(np.int64)
        p = pa.array(n * 1_000_000 // d, pa.int64())
        out = batch.append_column("p_micro", p)
        if min_count > 1:
            out = out.filter(pc.greater_equal(out.column("n"), min_count))
        return out

    return joined.map_batches(prob, batch_format="pyarrow")


def sql_bigram_counts(min_count: int = 1, table: str = "documents",
                      text_col: str = "text") -> str:
    """DuckDB mirror of ``bigram_counts`` (identical tokenization, counts,
    prefix totals and integer fixed-point probability — floor division on
    both engines, no float-rounding-mode dependence)."""
    return f"""
    WITH t AS (SELECT regexp_extract_all(coalesce({text_col}, ''),
                                         '[a-z0-9]+') AS l FROM {table}),
    bg AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
           FROM t WHERE len(l) >= 2),
    c AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS n FROM bg GROUP BY 1, 2),
    u AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_w1 FROM c GROUP BY w1)
    SELECT c.w1, c.w2, c.n, u.n_w1,
           CAST(c.n * 1000000 // u.n_w1 AS BIGINT) AS p_micro
    FROM c JOIN u USING (w1) WHERE c.n >= {min_count}
    """


def lm_score_docs(ds, id_col: str = "doc_id", text_col: str = "text",
                  min_count: int = 3, num_partitions: int = 16):
    """Per-document fluency under the corpus bigram LM — the classic
    LM-filter step of a training-data pipeline (score every document by how
    well the corpus model predicts it; low scorers are boilerplate/garble).

    Two passes over the corpus: (1) train the bigram table
    (``bigram_counts`` — Counter combiner, two-phase count, integer
    micro-probabilities), (2) per-doc bigram multisets LEFT-joined to the LM
    on the bigram key (partitioned hash join — the bigram vocabulary fits no
    driver dict at web scale) and aggregated per document.  All arithmetic
    is int64 (sum of c*p_micro, floor-divided by the bigram count), so the
    DuckDB mirror hash-checks despite the two-pass, join-heavy plan.

    Returns (doc_id, n_bigrams, n_known, sum_p_micro, fluency_micro) with a
    row for EVERY document (zeroes for docs with < 2 tokens)."""
    from collections import Counter

    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    lm = bigram_counts(ds, text_col=text_col, min_count=min_count,
                       num_partitions=num_partitions)

    def lm_key(batch: pa.Table) -> pa.Table:
        bk = pc.binary_join_element_wise(batch.column("w1"),
                                         batch.column("w2"), "\x1f")
        return pa.table({"bk": bk, "p_micro": batch.column("p_micro")})

    def doc_pairs(batch: pa.Table) -> pa.Table:
        ids, keys, cs = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = TOKEN_RE.findall(t or "")
            for (a, b), n in Counter(zip(toks, toks[1:])).items():
                ids.append(did)
                keys.append(a + "\x1f" + b)
                cs.append(n)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bk": pa.array(keys, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    joined = hash_join(ds.map_batches(doc_pairs, batch_format="pyarrow"),
                       lm.map_batches(lm_key, batch_format="pyarrow"),
                       "bk", "bk", how="left", right_cols=["p_micro"],
                       num_partitions=num_partitions)

    def contrib(batch: pa.Table) -> pa.Table:
        import numpy as np
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch.column("p_micro").to_pylist()
        known = np.array([v is not None for v in p], dtype=bool)
        pv = np.array([v or 0 for v in p], dtype=np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "nb": pa.array(c, pa.int64()),
            "nk": pa.array(np.where(known, c, 0), pa.int64()),
            "sp": pa.array(c * pv, pa.int64()),
        })

    scores = hash_aggregate(
        joined.map_batches(contrib, batch_format="pyarrow"), [id_col],
        partial_aggs=[("nb", "sum"), ("nk", "sum"), ("sp", "sum")],
        aggs=[("nb_sum", "sum"), ("nk_sum", "sum"), ("sp_sum", "sum")],
        rename={"nb_sum_sum": "n_bigrams", "nk_sum_sum": "n_known",
                "sp_sum_sum": "sum_p_micro"}, num_buckets=num_partitions)

    out = hash_join(ds.select_columns([id_col]), scores, id_col, id_col,
                    how="left", right_cols=["n_bigrams", "n_known", "sum_p_micro"],
                    num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np
        nb = np.array([v or 0 for v in batch.column("n_bigrams").to_pylist()],
                      dtype=np.int64)
        nk = np.array([v or 0 for v in batch.column("n_known").to_pylist()],
                      dtype=np.int64)
        sp = np.array([v or 0 for v in batch.column("sum_p_micro").to_pylist()],
                      dtype=np.int64)
        flu = np.where(nb > 0, sp // np.maximum(nb, 1), 0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(nb, pa.int64()),
            "n_known": pa.array(nk, pa.int64()),
            "sum_p_micro": pa.array(sp, pa.int64()),
            "fluency_micro": pa.array(flu, pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _sql_lm_ctes(min_count: int, table: str, id_col: str, text_col: str) -> str:
    """CTE chain shared by the lm-score mirrors: train the corpus bigram LM
    and score per-doc bigram multisets, ending in ``sc``."""
    return f"""t0 AS (SELECT regexp_extract_all(coalesce({text_col}, ''),
                                          '[a-z0-9]+') AS l FROM {table}),
    bg AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
           FROM t0 WHERE len(l) >= 2),
    c0 AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS n FROM bg GROUP BY 1, 2),
    u AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_w1 FROM c0 GROUP BY w1),
    lm AS (SELECT c0.w1, c0.w2, CAST(c0.n * 1000000 // u.n_w1 AS BIGINT) AS p_micro
           FROM c0 JOIN u USING (w1) WHERE c0.n >= {min_count}),
    d AS (SELECT {id_col}, regexp_extract_all(coalesce({text_col}, ''),
                                              '[a-z0-9]+') AS l FROM {table}),
    db AS (SELECT {id_col}, p[1] AS w1, p[2] AS w2, count(*) AS c
           FROM (SELECT {id_col}, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
                 FROM d WHERE len(l) >= 2)
           GROUP BY 1, 2, 3),
    sc AS (SELECT db.{id_col},
             CAST(sum(db.c) AS BIGINT) AS n_bigrams,
             CAST(coalesce(sum(CASE WHEN lm.p_micro IS NOT NULL THEN db.c END), 0)
                  AS BIGINT) AS n_known,
             CAST(coalesce(sum(db.c * lm.p_micro), 0) AS BIGINT) AS sum_p_micro
           FROM db LEFT JOIN lm ON lm.w1 = db.w1 AND lm.w2 = db.w2
           GROUP BY db.{id_col})"""


def sql_lm_score_docs(min_count: int = 3, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of ``lm_score_docs`` — identical LM, join and integer
    fixed-point arithmetic."""
    return f"""
    WITH {_sql_lm_ctes(min_count, table, id_col, text_col)}
    SELECT doc.{id_col},
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(sc.n_known, 0) AS BIGINT) AS n_known,
           CAST(coalesce(sc.sum_p_micro, 0) AS BIGINT) AS sum_p_micro,
           CAST(CASE WHEN coalesce(sc.n_bigrams, 0) > 0
                THEN sc.sum_p_micro // sc.n_bigrams ELSE 0 END AS BIGINT)
             AS fluency_micro
    FROM {table} doc LEFT JOIN sc USING ({id_col})
    """


# --- BM25 retrieval ------------------------------------------------------------

def bm25_topk(ds, terms: list[str], k: int = 10, id_col: str = "doc_id",
              text_col: str = "text"):
    """Okapi BM25 top-k over the corpus for a fixed term list, in EXACT
    integer arithmetic (k1 = 6/5, b = 3/4 as rationals; idf is the rational
    core (N - df + 1/2)/(df + 1/2) WITHOUT the log — a strictly monotone
    transform of classic idf, so rankings for single-term queries are
    identical and multi-term scores are a documented integer variant that
    hash-matches the SQL mirror exactly; no float sum-order anywhere).

    Per-(doc, term) contribution, everything integer (T = total corpus
    tokens, N = docs, dl = doc length, all multiplied out by 10*T):

        c_micro = (1e6 * (2N - 2*df + 1) * 22*T*tf)
                  // ((2*df + 1) * (10*T*tf + 3*T + 9*dl*N))

    Scale shape: pass 1 streams the corpus once folding (N, T, df[term])
    per-batch partials (a handful of ints reach the driver); pass 2 scores
    each batch locally against the broadcast constants and keeps a per-batch
    top-k; the global winner merge sorts only k x num_blocks rows.  The
    corpus text never shuffles.

    Output: (doc_id, score_micro, n_terms) — top ``k`` by (score desc, id).
    """
    from collections import Counter

    terms = list(terms)

    def stats_part(batch: pa.Table) -> pa.Table:
        tls = [TOKEN_RE.findall(t or "")
               for t in batch.column(text_col).to_pylist()]
        sets = [set(x) for x in tls]
        return pa.table({
            "nd": pa.array([len(tls)], pa.int64()),
            "nt": pa.array([sum(len(x) for x in tls)], pa.int64()),
            "df": pa.array([[sum(1 for s in sets if tm in s)
                             for tm in terms]], pa.list_(pa.int64())),
        })

    parts = (ds.select_columns([text_col])
             .map_batches(stats_part, batch_format="pyarrow").take_all())
    N = sum(r["nd"] for r in parts)
    T = sum(r["nt"] for r in parts)
    df = [sum(r["df"][i] for r in parts) for i in range(len(terms))]
    if N == 0 or T == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score_micro": pa.array([], pa.int64()),
            "n_terms": pa.array([], pa.int64())}))

    def score(batch: pa.Table) -> pa.Table:
        rows = []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = TOKEN_RE.findall(t or "")
            dl = len(toks)
            cnt = Counter(toks)
            s, ntm = 0, 0
            for ti, term in enumerate(terms):
                tf = cnt.get(term, 0)
                if tf == 0:
                    continue
                ntm += 1
                s += ((10**6 * (2 * N - 2 * df[ti] + 1) * 22 * T * tf)
                      // ((2 * df[ti] + 1) * (10 * T * tf + 3 * T + 9 * dl * N)))
            if ntm:
                rows.append((did, s, ntm))
        rows.sort(key=lambda r: (-r[1], r[0]))
        rows = rows[:k]
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "score_micro": pa.array([r[1] for r in rows], pa.int64()),
            "n_terms": pa.array([r[2] for r in rows], pa.int64()),
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pyarrow")
            .sort(["score_micro", "doc_id"], descending=[True, False])
            .limit(k))


def sql_bm25_topk(terms: list[str], k: int = 10, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of ``bm25_topk``: identical tokenization, identical
    multiplied-out integer formula in HUGEINT, identical tie-break."""
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
    WITH d AS (
      SELECT {id_col} AS doc_id,
             regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+') AS l
      FROM {table}
    ), s AS (
      SELECT count(*) AS n, CAST(coalesce(sum(len(l)), 0) AS BIGINT) AS t FROM d
    ), q(term) AS (VALUES {vals}),
    tf AS (
      SELECT d.doc_id, q.term, len(list_filter(d.l, x -> x = q.term)) AS tf,
             len(d.l) AS dl
      FROM d CROSS JOIN q
    ), dfs AS (
      SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term
    ), contrib AS (
      SELECT f.doc_id,
             CAST((1000000::HUGEINT * (2*s.n - 2*dfs.df + 1) * 22 * s.t * f.tf)
                  // ((2*dfs.df + 1)::HUGEINT *
                      (10*s.t*f.tf + 3*s.t + 9*f.dl*s.n)) AS BIGINT) AS c_micro
      FROM tf f JOIN dfs USING (term) CROSS JOIN s
      WHERE f.tf > 0
    )
    SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro,
           count(*) AS n_terms
    FROM contrib GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id LIMIT {k}
    """


# --- collocation mining (PMI-style lift) ------------------------------------------

def collocations_topk(ds, k: int = 20, min_count: int = 5,
                      text_col: str = "text", num_partitions: int = 16):
    """Top-``k`` bigram collocations by integer LIFT — the Church & Hanks
    PMI association measure with the (monotone) log dropped so ranking stays
    in exact integer arithmetic:

        lift_micro = (1e6 * n_ab * U^2) // (B * n_a * n_b)

    (U = total tokens, B = total bigrams, n_a/n_b unigram counts, n_ab the
    bigram count).  PMI = log(lift) — same order, no float log divergence.

    Scale shape: per-batch Counter combiners for unigram AND bigram counts
    (corpus text never shuffles — only vocabulary-scale count partials);
    totals are driver scalars; two partitioned hash joins decorate the
    bigram table with its endpoint unigram counts; per-batch local top-k +
    a k x num_blocks global merge.  ``min_count`` prunes the long noise
    tail before the joins."""
    from collections import Counter

    import pyarrow.compute as pc

    from ontoray.stages.agg import hash_aggregate
    from ontoray.stages.joins import hash_join

    def uni(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            cnt.update(TOKEN_RE.findall(t or ""))
        return pa.table({"w": pa.array(list(cnt.keys()), pa.string()),
                         "c": pa.array(list(cnt.values()), pa.int64())})

    def pairs(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = TOKEN_RE.findall(t or "")
            cnt.update(zip(toks, toks[1:]))
        return pa.table({
            "w1": pa.array([a for a, _ in cnt.keys()], pa.string()),
            "w2": pa.array([b for _, b in cnt.keys()], pa.string()),
            "c": pa.array(list(cnt.values()), pa.int64()),
        })

    txt = ds.select_columns([text_col])
    ug = hash_aggregate(txt.map_batches(uni, batch_format="pyarrow"), ["w"],
                        partial_aggs=[("c", "sum")], aggs=[("c_sum", "sum")],
                        rename={"c_sum_sum": "n_w"},
                        num_buckets=num_partitions).materialize()
    bc = hash_aggregate(txt.map_batches(pairs, batch_format="pyarrow"),
                        ["w1", "w2"], partial_aggs=[("c", "sum")],
                        aggs=[("c_sum", "sum")], rename={"c_sum_sum": "n"},
                        num_buckets=num_partitions).materialize()
    U = int(ug.sum("n_w") or 0)
    B = int(bc.sum("n") or 0)
    if U == 0 or B == 0:
        return bc.limit(0)

    kept = bc.filter(expr=f"n >= {min_count}")
    j1 = hash_join(kept, ug.rename_columns(["w", "n_a"]), "w1", "w",
                   right_cols=["n_a"], num_partitions=num_partitions)
    j2 = hash_join(j1, ug.rename_columns(["w", "n_b"]), "w2", "w",
                   right_cols=["n_b"], num_partitions=num_partitions)

    def lift(batch: pa.Table) -> pa.Table:
        rows = []
        for w1, w2, n, na, nb in zip(batch.column("w1").to_pylist(),
                                     batch.column("w2").to_pylist(),
                                     batch.column("n").to_pylist(),
                                     batch.column("n_a").to_pylist(),
                                     batch.column("n_b").to_pylist()):
            rows.append((w1, w2, n,
                         (10**6 * n * U * U) // (B * na * nb)))
        rows.sort(key=lambda r: (-r[3], r[0], r[1]))
        rows = rows[:k]
        return pa.table({
            "w1": pa.array([r[0] for r in rows], pa.string()),
            "w2": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "lift_micro": pa.array([r[3] for r in rows], pa.int64()),
        })

    return (j2.map_batches(lift, batch_format="pyarrow")
            .sort(["lift_micro", "w1", "w2"],
                  descending=[True, False, False]).limit(k))


def sql_collocations(k: int = 20, min_count: int = 5,
                     table: str = "documents", text_col: str = "text") -> str:
    """DuckDB mirror of ``collocations_topk`` — identical counts, identical
    HUGEINT lift formula, identical tie-break."""
    return f"""
    WITH t AS (
      SELECT regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+') AS l
      FROM {table}
    ), uc AS (
      SELECT w, count(*) AS n_w FROM (SELECT unnest(l) AS w FROM t) GROUP BY w
    ), ut AS (SELECT CAST(sum(n_w) AS BIGINT) AS u FROM uc),
    bc AS (
      SELECT p[1] AS w1, p[2] AS w2, count(*) AS n
      FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
            FROM t WHERE len(l) >= 2)
      GROUP BY 1, 2
    ), bt AS (SELECT CAST(sum(n) AS BIGINT) AS b FROM bc)
    SELECT bc.w1, bc.w2, CAST(bc.n AS BIGINT) AS n,
           CAST((1000000::HUGEINT * bc.n * ut.u * ut.u)
                // (bt.b::HUGEINT * a.n_w * b2.n_w) AS BIGINT) AS lift_micro
    FROM bc JOIN uc a ON a.w = bc.w1 JOIN uc b2 ON b2.w = bc.w2
    CROSS JOIN ut CROSS JOIN bt
    WHERE bc.n >= {min_count}
    ORDER BY lift_micro DESC, bc.w1, bc.w2 LIMIT {k}
    """


# --- DSIR-style hashed-feature importance scoring -----------------------------------

DSIR_BUCKETS = 8192


def dsir_scores(ds, id_col: str = "doc_id", text_col: str = "text",
                target_col: str = "is_target", n_buckets: int = DSIR_BUCKETS):
    """Data-selection importance score in the DSIR feature space (Xie et
    al. 2023, arXiv:2302.03169): hashed word-bigram counts over a FIXED
    ``n_buckets`` feature space, one bucket-unigram LM per side (target vs
    raw, add-1 smoothed), and a per-document contrast score.

    Deviation from the paper, documented: DSIR's importance weight is the
    log-probability ratio; log is not exactly reproducible across engines,
    so the score here is the integer surrogate
    ``sum_g (pt_micro[b(g)] - pr_micro[b(g)])`` — micro-probability
    CONTRAST per gram occurrence, monotone in the same direction per
    feature, hash-exact on both engines.

    Scale shape: the feature space is fixed-size, so the count exchange is
    <= n_buckets rows of partials and the two LMs broadcast as two flat
    int64 arrays (the whole point of hashed features at 100 TB); the corpus
    streams twice (count pass, score pass) and never shuffles.

    ``target_col`` is a boolean column the caller derives (the target
    distribution membership).  Output: (doc_id, n_grams, score_micro) for
    EVERY doc (zeros under 2 tokens)."""
    from collections import Counter

    import numpy as np
    import ray

    from ontoray.extras.fastmd5 import md5_int60
    from ontoray.stages.agg import hash_aggregate

    def gram_buckets(text: str) -> "np.ndarray":
        ws = TOKEN_RE.findall(text or "")
        if len(ws) < 2:
            return np.empty(0, dtype=np.int64)
        grams = [(ws[i] + " " + ws[i + 1]).encode() for i in range(len(ws) - 1)]
        return md5_int60(grams) % n_buckets

    def count_part(batch: pa.Table) -> pa.Table:
        ct: Counter = Counter()
        cr: Counter = Counter()
        for t, tgt in zip(batch.column(text_col).to_pylist(),
                          batch.column(target_col).to_pylist()):
            (ct if tgt else cr).update(gram_buckets(t).tolist())
        bs = sorted(set(ct) | set(cr))
        return pa.table({"b": pa.array(bs, pa.int64()),
                         "ct": pa.array([ct.get(b, 0) for b in bs], pa.int64()),
                         "cr": pa.array([cr.get(b, 0) for b in bs], pa.int64())})

    cb = hash_aggregate(
        ds.select_columns([text_col, target_col])
          .map_batches(count_part, batch_format="pyarrow"),
        ["b"], aggs=[("ct", "sum"), ("cr", "sum")],
        rename={"ct_sum": "ct", "cr_sum": "cr"}, num_buckets=8).take_all()
    tt = sum(r["ct"] for r in cb)
    tr = sum(r["cr"] for r in cb)
    pt = np.full(n_buckets, 1_000_000 // (tt + n_buckets), dtype=np.int64)
    pr = np.full(n_buckets, 1_000_000 // (tr + n_buckets), dtype=np.int64)
    for r in cb:
        pt[r["b"]] = (r["ct"] + 1) * 1_000_000 // (tt + n_buckets)
        pr[r["b"]] = (r["cr"] + 1) * 1_000_000 // (tr + n_buckets)
    lref = ray.put((pt, pr))

    def score(batch: pa.Table) -> pa.Table:
        pt_, pr_ = ray.get(lref)
        ids = batch.column(id_col)
        ngs, scs = [], []
        for t in batch.column(text_col).to_pylist():
            bs = gram_buckets(t)
            ngs.append(len(bs))
            scs.append(int((pt_[bs] - pr_[bs]).sum()) if len(bs) else 0)
        return pa.table({id_col: ids,
                         "n_grams": pa.array(ngs, pa.int64()),
                         "score_micro": pa.array(scs, pa.int64())})

    return (ds.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pyarrow"))


def sql_dsir_scores(target_pred: str = "doc_id % 13 = 0",
                    n_buckets: int = DSIR_BUCKETS,
                    table: str = "documents") -> str:
    """DuckDB mirror of ``dsir_scores`` with target membership
    ``target_pred``: identical tokenization, md5-int60 bucket hash,
    add-1-smoothed integer micro-probabilities, contrast sum."""
    return f"""
    WITH d AS (
      SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[a-z0-9]+') AS l,
             ({target_pred}) AS tgt
      FROM {table}
    ), g AS (
      SELECT doc_id, tgt,
             ('0x' || substr(md5(p[1] || ' ' || p[2]), 1, 15))::BIGINT
               % {n_buckets} AS b
      FROM (SELECT doc_id, tgt, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
            FROM d WHERE len(l) >= 2)
    ), cb AS (
      SELECT b, count(*) FILTER (tgt) AS ct, count(*) FILTER (NOT tgt) AS cr
      FROM g GROUP BY b
    ), tot AS (
      SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS tt,
             CAST(coalesce(sum(cr), 0) AS BIGINT) AS tr FROM cb
    ), lm AS (
      SELECT b, CAST((ct + 1) * 1000000 // (tot.tt + {n_buckets}) AS BIGINT) AS pt,
             CAST((cr + 1) * 1000000 // (tot.tr + {n_buckets}) AS BIGINT) AS pr
      FROM cb CROSS JOIN tot
    ), sc AS (
      SELECT g.doc_id, count(*) AS n_grams,
             CAST(sum(lm.pt - lm.pr) AS BIGINT) AS score_micro
      FROM g JOIN lm USING (b) GROUP BY g.doc_id
    )
    SELECT doc.doc_id, CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(sc.score_micro, 0) AS BIGINT) AS score_micro
    FROM {table} doc LEFT JOIN sc USING (doc_id)
    """


# --- source-mixture sampling under per-source token budgets -------------------

def mixture_sample(ds, budget_tokens: int = 1000, id_col: str = "doc_id",
                   text_col: str = "text", source_col: str = "source",
                   salt: str = "mix1"):
    """Per-source data-mixture cut: lay each source's documents out in a
    deterministic pseudo-random order (md5 of the id — the same stable
    shuffle ``pack_sequences`` uses) and keep documents while the source's
    running token total stays under ``budget_tokens`` — the "sample N tokens
    of web, M tokens of code" mixture step every LM training pipeline runs
    (cf. Pile/LLaMA-style source weighting).  A document is kept iff its
    EXCLUSIVE prefix (tok_start) is < budget, so every kept source has at
    least one doc and overshoot is at most one document.

    Scale shape: identical to :func:`pack_sequences` — a distributed ordered
    prefix sum with no global sort.  The md5 top byte forms 256 ordered
    buckets per source; per-(source, bucket) token sums cross one two-phase
    metadata exchange (source vocabulary × 256 rows — sources are a bounded
    vocabulary, a few thousand at web scale), the driver cumsums per source
    and broadcasts exclusive offsets, and each (source, bucket) group sorts
    locally and filters.  Output: (id_col, source, n_tokens, tok_start),
    kept rows only — mirrored by :func:`sql_mixture_sample` via a window
    cumsum PARTITION BY source ORDER BY md5."""
    import hashlib

    import numpy as np
    import ray

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = np.array([int.from_bytes(
            hashlib.md5(f"{salt}:{i}".encode()).digest()[:8], "big")
            for i in ids], dtype=np.uint64)
        nt = [len(TOKEN_RE.findall(t or ""))
              for t in batch.column(text_col).to_pylist()]
        srcs = batch.column(source_col).to_pylist()
        return pa.table({
            id_col: batch.column(id_col),
            "src": batch.column(source_col),
            "h": pa.array(hs, pa.uint64()),
            "gk": pa.array([f"{s}\x1f{int(h >> np.uint64(56)):03d}"
                            for s, h in zip(srcs, hs)], pa.string()),
            "n_tokens": pa.array(nt, pa.int64()),
        })

    derived = ds.select_columns([id_col, text_col, source_col]).map_batches(
        derive, batch_format="pyarrow")

    sums = hash_aggregate(
        derived.select_columns(["gk", "n_tokens"]), ["gk"],
        partial_aggs=[("n_tokens", "sum")],
        aggs=[("n_tokens_sum", "sum")], rename={"n_tokens_sum_sum": "s"},
        num_buckets=16).take_all()               # sources × 256 rows, bounded
    sums.sort(key=lambda r: r["gk"])             # (source, bucket) order
    offsets, acc, cur_src = {}, 0, None
    for r in sums:
        src = r["gk"].rsplit("\x1f", 1)[0]
        if src != cur_src:
            cur_src, acc = src, 0
        offsets[r["gk"]] = acc
        acc += r["s"]
    off_ref = ray.put(offsets)

    def scan(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[g.column("gk")[0].as_py()]
        ids = np.array(g.column(id_col).to_pylist(), dtype=np.int64)
        h = g.column("h").to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        starts = np.cumsum(nt[order]) - nt[order] + off
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        starts = starts[inv]
        out = pa.table({
            id_col: g.column(id_col),
            source_col: g.column("src"),
            "n_tokens": pa.array(nt, pa.int64()),
            "tok_start": pa.array(starts, pa.int64()),
        })
        return out.filter(pa.array(starts < budget_tokens, pa.bool_()))

    return (derived.repartition(default_coalesce())
            .groupby("gk").map_groups(scan, batch_format="pyarrow"))


def sql_mixture_sample(budget_tokens: int = 1000, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text",
                       source_col: str = "source", salt: str = "mix1") -> str:
    """DuckDB mirror of ``mixture_sample``: window cumsum partitioned by
    source over the identical md5 order (16-hex prefix == uint64 prefix)."""
    return f"""
    WITH t AS (
      SELECT {id_col}, {source_col},
             CAST(len(regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             substr(md5('{salt}:' || {id_col}), 1, 16) AS h
      FROM {table}
    ), c AS (
      SELECT {id_col}, {source_col}, n_tokens,
             (sum(n_tokens) OVER (PARTITION BY {source_col}
                                  ORDER BY h, {id_col} ROWS UNBOUNDED PRECEDING)
              - n_tokens)::BIGINT AS tok_start
      FROM t
    )
    SELECT {id_col}, {source_col}, n_tokens, tok_start
    FROM c WHERE tok_start < {budget_tokens}
    """


# --- tokenizer-vocabulary build (contiguous ids, frequency-ranked) -----------

def build_vocab(ds, min_count: int = 2, text_col: str = "text",
                num_partitions: int = 16):
    """Corpus token vocabulary with CONTIGUOUS frequency-ranked ids — the
    tokenizer-training count step: token_id 0 is the most frequent token,
    ties broken lexicographically, tokens below ``min_count`` dropped.

    Scale shape — a distributed dense rank with NO global sort: token counts
    come from the standard per-batch-Counter + two-phase bucketed aggregate
    (tokens never leave a batch unaggregated); ranking buckets by
    floor(log2(n)) — 64 ordered frequency bands — so one metadata-only
    exchange counts each band, the driver cumsums 64 rows into exclusive
    offsets, and each band sorts its own (bounded, Zipf-thin) slice locally
    by (n DESC, token).  Output: (token, n, token_id), mirrored by
    :func:`sql_build_vocab` via row_number() OVER (ORDER BY n DESC, token)."""
    from collections import Counter

    import numpy as np
    import ray

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    def toks(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            cnt.update(TOKEN_RE.findall(t or ""))
        return pa.table({"token": pa.array(list(cnt.keys()), pa.string()),
                         "c": pa.array(list(cnt.values()), pa.int64())})

    counts = hash_aggregate(
        ds.select_columns([text_col]).map_batches(toks, batch_format="pyarrow"),
        ["token"], partial_aggs=[("c", "sum")], aggs=[("c_sum", "sum")],
        rename={"c_sum_sum": "n"}, num_buckets=num_partitions,
    ).filter(expr=f"n >= {min_count}").materialize()

    def band_of(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        band = (63 - np.floor(np.log2(n)).astype(np.int64))  # high freq = low band
        return batch.append_column("band", pa.array(band, pa.int64()))

    banded = counts.map_batches(band_of, batch_format="pyarrow")
    sizes = hash_aggregate(
        banded.select_columns(["band", "n"]), ["band"],
        partial_aggs=[("n", "count")],
        aggs=[("n_count", "sum")], rename={"n_count_sum": "s"},
        num_buckets=8).take_all()                              # <= 64 rows
    sizes.sort(key=lambda r: r["band"])
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["band"]] = acc
        acc += r["s"]
    off_ref = ray.put(offsets)

    def rank_band(g: pa.Table) -> pa.Table:
        import numpy as np
        off = ray.get(off_ref)[g.column("band")[0].as_py()]
        n = g.column("n").to_numpy(zero_copy_only=False)
        tok = np.array(g.column("token").to_pylist(), dtype=object)
        order = np.lexsort((tok, -n))
        ids = np.empty(len(order), dtype=np.int64)
        ids[order] = np.arange(off, off + len(order))
        return pa.table({"token": g.column("token"), "n": g.column("n"),
                         "token_id": pa.array(ids, pa.int64())})

    return (banded.repartition(default_coalesce())
            .groupby("band").map_groups(rank_band, batch_format="pyarrow"))


def sql_build_vocab(min_count: int = 2, table: str = "documents",
                    text_col: str = "text") -> str:
    return f"""
    WITH c AS (
      SELECT t AS token, count(*) AS n
      FROM (SELECT unnest(regexp_extract_all(coalesce({text_col}, ''),
                                             '[a-z0-9]+')) AS t FROM {table})
      GROUP BY t HAVING count(*) >= {min_count}
    )
    SELECT token, CAST(n AS BIGINT) AS n,
           (row_number() OVER (ORDER BY n DESC, token) - 1)::BIGINT AS token_id
    FROM c
    """


# --- inverted-index (postings-list) build -------------------------------------

def build_postings(ds, min_df: int = 2, max_df: int = 100, cap: int = 20,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int = 16):
    """Search-index build: token → (document frequency, capped posting list).
    Postings are the ``cap`` SMALLEST doc ids (deterministic truncation — the
    impact-ordering analog); ``df`` counts ALL docs.  Tokens outside
    [min_df, max_df] are dropped (singletons are noise, stop-tokens explode
    the lists).

    Scale shape: per-batch DISTINCT (token, doc) pairs (per-doc set — token
    multiplicity never shuffles), ONE token-bucketed exchange, per-bucket
    vectorized fold (sort + group boundaries, no per-token Python).  Output:
    (token, df, postings) with postings comma-joined — mirrored exactly by
    :func:`sql_build_postings`."""
    import numpy as np

    from ontoray.stages.agg import _with_bucket, default_coalesce

    def pairs(batch: pa.Table) -> pa.Table:
        toks, ids = [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            for w in set(TOKEN_RE.findall(t or "")):
                toks.append(w)
                ids.append(did)
        return pa.table({"token": pa.array(toks, pa.string()),
                         id_col: pa.array(ids, pa.int64())})

    def fold(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        tok = np.array(g.column("token").to_pylist(), dtype=object)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tok))
        tok, ids = tok[order], ids[order]
        bounds = np.flatnonzero(np.concatenate(([True], tok[1:] != tok[:-1])))
        ends = np.concatenate((bounds[1:], [len(tok)]))
        out_t, out_df, out_p = [], [], []
        for s, e in zip(bounds, ends):
            df = int(e - s)
            if min_df <= df <= max_df:
                out_t.append(tok[s])
                out_df.append(df)
                out_p.append(",".join(str(i) for i in ids[s:s + min(cap, df)]))
        return pa.table({"token": pa.array(out_t, pa.string()),
                         "df": pa.array(out_df, pa.int64()),
                         "postings": pa.array(out_p, pa.string())})

    return (ds.select_columns([id_col, text_col])
            .map_batches(pairs, batch_format="pyarrow")
            .map_batches(lambda b: _with_bucket(b, ["token"], num_partitions),
                         batch_format="pyarrow")
            .repartition(default_coalesce())
            .groupby("__bucket").map_groups(fold, batch_format="pyarrow"))


def sql_build_postings(min_df: int = 2, max_df: int = 100, cap: int = 20,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    return f"""
    WITH p AS (
      SELECT DISTINCT token, {id_col} FROM (
        SELECT {id_col}, unnest(regexp_extract_all(coalesce({text_col}, ''),
                                                   '[a-z0-9]+')) AS token
        FROM {table})
    )
    SELECT token, CAST(count(*) AS BIGINT) AS df,
           array_to_string(list_slice(list_sort(list({id_col})), 1, {cap}), ',')
             AS postings
    FROM p GROUP BY token
    HAVING count(*) BETWEEN {min_df} AND {max_df}
    """


# --- winnowing fingerprints (Schleimer et al. 2003, the MOSS selector) --------

def winnow_fingerprints(ds, k: int = 3, w: int = 4, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Winnowing: per doc, hash every k-gram of tokens, slide a window of
    ``w`` consecutive hashes, select each window's MINIMUM — the guarantee-
    preserving fingerprint subset used for plagiarism/overlap detection
    (selected set is deterministic and shared-substring-stable, unlike a
    random sample).  Summarized per doc as (n_fp, fp_min, fp_max) over the
    DISTINCT selected hashes so the result hashes stably.

    Scale shape: fully batch-local (no shuffle at all) — k-gram md5-int60
    hashes via the vectorized exact md5, window minima via a numpy sliding
    view, distinct via np.unique.  Docs with fewer than k+w-1 tokens emit no
    row (no complete window), mirroring the SQL's ``i >= w`` predicate."""
    import numpy as np

    from ontoray.extras.sketches import _md5_int60

    def fp(batch: pa.Table) -> pa.Table:
        ids, nfp, fmin, fmax = [], [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = TOKEN_RE.findall(t or "")
            n_g = len(toks) - k + 1
            if n_g < w:
                continue
            grams = [" ".join(toks[i:i + k]) for i in range(n_g)]
            h = _md5_int60(grams)
            win = np.lib.stride_tricks.sliding_window_view(h, w)
            sel = np.unique(win.min(axis=1))
            ids.append(did)
            nfp.append(len(sel))
            fmin.append(int(sel[0]))
            fmax.append(int(sel[-1]))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_fp": pa.array(nfp, pa.int64()),
                         "fp_min": pa.array(fmin, pa.int64()),
                         "fp_max": pa.array(fmax, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        fp, batch_format="pyarrow")


def sql_winnow_fingerprints(k: int = 3, w: int = 4, table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    from ontoray.extras.sketches import sql_md5_int60
    gram = " || ' ' || ".join(f"l[i + {j}]" for j in range(k))
    return f"""
    WITH d AS (
      SELECT {id_col}, regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+') AS l
      FROM {table}
    ), ix AS (
      SELECT {id_col}, l, unnest(generate_series(1, len(l) - {k - 1})) AS i
      FROM d
    ), g AS (
      SELECT {id_col}, i, {sql_md5_int60(gram)} AS h FROM ix
    ), wmin AS (
      SELECT {id_col}, i,
             min(h) OVER (PARTITION BY {id_col} ORDER BY i
                          ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS mh
      FROM g
    ), sel AS (
      SELECT DISTINCT {id_col}, mh FROM wmin WHERE i >= {w}
    )
    SELECT {id_col}, count(*) AS n_fp, min(mh) AS fp_min, max(mh) AS fp_max
    FROM sel GROUP BY {id_col}
    """


# --- CCNet-style per-language fluency buckets -----------------------------------

def ccnet_buckets(ds, min_count: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", lang_col: str = "lang"):
    """CCNet-style head/middle/tail split (Wenzek et al. 2020): every doc is
    bucketed WITHIN ITS LANGUAGE by corpus-LM fluency terciles — the classic
    quality partition of a Common-Crawl curation pipeline (train on head,
    sample middle, drop tail).

    Composition of two scale-shaped operators: ``lm_score_docs`` (two-pass
    bigram LM, partitioned joins, int64 micro-prob arithmetic) and
    ``grouped_quantile_buckets`` (per-lang value-histogram terciles,
    cutpoints broadcast once, one vectorized searchsorted per batch).
    ntile-by-VALUE semantics: ties share a bucket, so the split is a pure
    function of (value, lang cutpoints) — deterministic across partitionings
    and identical in the SQL mirror.

    Output: (doc_id, lang, bucket, ccnet_bucket) with bucket 2 = head
    (most fluent), 1 = middle, 0 = tail."""
    import numpy as np

    from ontoray.extras.quantiles import grouped_quantile_buckets
    from ontoray.stages.joins import hash_join

    scores = lm_score_docs(ds, id_col=id_col, text_col=text_col,
                           min_count=min_count)
    withlang = hash_join(
        scores.select_columns([id_col, "fluency_micro"]),
        ds.select_columns([id_col, lang_col]), id_col, id_col,
        how="inner", right_cols=[lang_col])
    buckets = grouped_quantile_buckets(withlang, lang_col, "fluency_micro",
                                       id_col, n_buckets=3)

    _LABELS = np.array(["tail", "middle", "head"])

    def label(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "ccnet_bucket", pa.array(_LABELS[b], pa.string()))

    return buckets.map_batches(label, batch_format="pyarrow")


def sql_ccnet_buckets(min_count: int = 3, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text",
                      lang_col: str = "lang") -> str:
    """DuckDB mirror of ``ccnet_buckets`` — same LM CTEs, same integer
    tercile rank formula (value at 1-based rank ceil(n*i/3))."""
    return f"""
    WITH {_sql_lm_ctes(min_count, table, id_col, text_col)},
    flu AS (SELECT doc.{id_col}, doc.{lang_col} AS lang,
              CAST(CASE WHEN coalesce(sc.n_bigrams, 0) > 0
                   THEN sc.sum_p_micro // sc.n_bigrams ELSE 0 END AS BIGINT) AS v
            FROM {table} doc LEFT JOIN sc USING ({id_col})),
    ranked AS (SELECT lang, v,
                 row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n FROM flu),
    cuts AS (SELECT lang, q.i, min(v) AS cut
             FROM ranked, (SELECT unnest(range(1, 3)) AS i) q
             WHERE rn = (n * q.i + 2) // 3 GROUP BY 1, 2),
    bk AS (SELECT t.{id_col}, t.lang,
             CAST(sum(CASE WHEN t.v > c.cut THEN 1 ELSE 0 END) AS BIGINT) AS bucket
           FROM flu t JOIN cuts c USING (lang) GROUP BY 1, 2)
    SELECT {id_col}, lang, bucket,
           CASE bucket WHEN 0 THEN 'tail' WHEN 1 THEN 'middle'
                ELSE 'head' END AS ccnet_bucket FROM bk
    """


# --- model-based quality filter (integer logit surrogate) -----------------------

ALPHA_RE = re.compile(r"[a-z]")

# Fixed "trained-offline" weights (micro-units).  The sigmoid of a logistic
# quality classifier is monotone, so the keep/drop decision is the SIGN of
# the linear logit — which keeps the whole operator in exact int64 and lets
# the DuckDB mirror hash-match a "model-scored" filter.
_QL_BIAS = -2_800_000
_QL_W_STOP = 6          # x stopword-ratio micro
_QL_W_ALPHA = 3         # x alpha-char-ratio micro
_QL_W_TOK = 2_000       # x min(n_tokens, 500)
_QL_MEANLEN_KNEE = 8_000_000   # mean-token-chars micro above this is penalized
_QL_PEN_DIV = 2


def quality_logit(ds, id_col: str = "doc_id", text_col: str = "text"):
    """fasttext-style model-based quality filter, as an exact integer logit:

        logit_micro = bias + 6*stop_micro + 3*alpha_micro
                      + 2000*min(n_tokens, 500)
                      - max(meanlen_micro - 8e6, 0) // 2
        keep = logit_micro >= 0

    where stop_micro / alpha_micro / meanlen_micro are floor-divided micro
    ratios.  One stateless ``map_batches`` pass — no shuffle, no driver
    state; at 100 TB this is the cheapest kind of stage there is.

    Output: (doc_id, logit_micro, keep)."""
    stop = STOP_PROFILES["en"]

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        logits = []
        for t in batch.column(text_col).to_pylist():
            t = t or ""
            toks = TOKEN_RE.findall(t)
            n_tok = len(toks)
            n_chars = len(t)
            stop_micro = 1_000_000 * sum(1 for w in toks if w in stop) // max(n_tok, 1)
            alpha_micro = 1_000_000 * len(ALPHA_RE.findall(t)) // max(n_chars, 1)
            meanlen_micro = 1_000_000 * sum(len(w) for w in toks) // max(n_tok, 1)
            logit = (_QL_BIAS + _QL_W_STOP * stop_micro
                     + _QL_W_ALPHA * alpha_micro
                     + _QL_W_TOK * min(n_tok, 500)
                     - max(meanlen_micro - _QL_MEANLEN_KNEE, 0) // _QL_PEN_DIV)
            logits.append(logit)
        return pa.table({
            id_col: ids,
            "logit_micro": pa.array(logits, pa.int64()),
            "keep": pa.array([v >= 0 for v in logits], pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def sql_quality_logit(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """DuckDB mirror of ``quality_logit`` — identical integer arithmetic.
    NB ``array_to_string([], '')`` is NULL in DuckDB: coalesce the
    token-char total."""
    stopw = ", ".join(f"'{w}'" for w in sorted(STOP_PROFILES["en"]))
    toks = f"regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+')"
    return f"""
    WITH f AS (
      SELECT {id_col},
        length({toks}) AS n_tok,
        length(coalesce({text_col}, '')) AS n_chars,
        length(list_filter({toks}, w -> w IN ({stopw}))) AS n_stop,
        length(regexp_replace(coalesce({text_col}, ''), '[^a-z]', '', 'g')) AS n_alpha,
        coalesce(length(array_to_string({toks}, '')), 0) AS tok_chars
      FROM {table}
    ), m AS (
      SELECT {id_col},
        1000000 * n_stop // greatest(n_tok, 1) AS stop_micro,
        1000000 * n_alpha // greatest(n_chars, 1) AS alpha_micro,
        1000000 * tok_chars // greatest(n_tok, 1) AS meanlen_micro,
        n_tok
      FROM f
    )
    SELECT {id_col},
      CAST({_QL_BIAS} + {_QL_W_STOP} * stop_micro + {_QL_W_ALPHA} * alpha_micro
           + {_QL_W_TOK} * least(n_tok, 500)
           - greatest(meanlen_micro - {_QL_MEANLEN_KNEE}, 0) // {_QL_PEN_DIV}
           AS BIGINT) AS logit_micro,
      ({_QL_BIAS} + {_QL_W_STOP} * stop_micro + {_QL_W_ALPHA} * alpha_micro
       + {_QL_W_TOK} * least(n_tok, 500)
       - greatest(meanlen_micro - {_QL_MEANLEN_KNEE}, 0) // {_QL_PEN_DIV}) >= 0 AS keep
    FROM m
    """


# --- fixed-size uniform sample (no shuffle) -------------------------------------

def sample_k(ds, k: int = 100, id_col: str = "doc_id", salt: str = "ksample"):
    """Exactly-k uniform sample: the k rows with the smallest
    md5(salt:id) rank — the distributed replacement for reservoir sampling
    (a reservoir is inherently sequential; the md5 order statistic gives the
    same uniform-without-replacement guarantee as a pure function of row
    identity).  Per-batch local top-k, then a (k x blocks)-row driver merge;
    deterministic across runs, partitionings, and incremental corpus growth.
    Output: (id, rank_hex), the k winners sorted by rank."""
    import hashlib

    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ranks = [hashlib.md5(f"{salt}:{i}".encode()).hexdigest() for i in ids]
        order = sorted(range(len(ids)), key=lambda j: (ranks[j], ids[j]))[:k]
        return pa.table({id_col: pa.array([ids[j] for j in order]),
                         "rank_hex": pa.array([ranks[j] for j in order],
                                              pa.string())})

    cand = sorted(((r["rank_hex"], r[id_col]) for r in
                   ds.select_columns([id_col]).map_batches(
                       local, batch_format="pyarrow").take_all()))[:k]
    return pa.table({id_col: pa.array([c[1] for c in cand], pa.int64()),
                     "rank_hex": pa.array([c[0] for c in cand], pa.string())})


def sql_sample_k(k: int = 100, table: str = "documents",
                 id_col: str = "doc_id", salt: str = "ksample") -> str:
    return (f"SELECT {id_col}, md5('{salt}:' || {id_col}) AS rank_hex "
            f"FROM {table} ORDER BY rank_hex, {id_col} LIMIT {k}")


# --- Rényi-2 (collision) concentration per source --------------------------------

def renyi2_by_source(ds, id_col: str = "doc_id", text_col: str = "text",
                     src_col: str = "source"):
    """Per-source token-distribution concentration: n_tokens (T), n_distinct
    (V), sum of squared token counts (S = sum c_w^2) and the EXACT integer
    collision probability ppb = (S * 10^9) // T^2 — the Renyi-2 entropy's
    argument with the monotone -log dropped (the repo's standard integer
    surrogate: same ordering, no float).  High collision ppb = repetitive /
    low-diversity source; the corpus-mix diagnostic next to tfidf/lm_bigrams.

    Scale shape: round 1 reduces rows to (source, token) counts (per-batch
    combiner + one vocabulary-bounded exchange); round 2 folds per-source
    moments from those counts (second tiny exchange).  The ppb division runs
    driver-side-free in a map_batches over the ~|sources| rows with Python
    bigints (T^2 overflows int64 at web scale; SQL mirrors with HUGEINT)."""
    from ontoray.stages.agg import hash_aggregate

    def tok_partial(batch: pa.Table) -> pa.Table:
        srcs, toks = [], []
        for s, t in zip(batch.column(src_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            ws = TOKEN_RE.findall(t or "")
            toks.extend(ws)
            srcs.extend([s] * len(ws))
        tbl = pa.table({src_col: pa.array(srcs, pa.string()),
                        "token": pa.array(toks, pa.string())})
        g = tbl.append_column("c", pa.array([1] * len(toks), pa.int64())) \
               .group_by([src_col, "token"]).aggregate([("c", "sum")])
        return g.rename_columns([src_col, "token", "c"])

    counts = hash_aggregate(
        ds.select_columns([src_col, text_col]).map_batches(
            tok_partial, batch_format="pyarrow"),
        [src_col, "token"], aggs=[("c", "sum")], rename={"c_sum": "c"})

    def moment_partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        c = batch.column("c").to_numpy(zero_copy_only=False)
        tbl = pa.table({src_col: batch.column(src_col),
                        "t": pa.array(c, pa.int64()),
                        "sq": pa.array(c * c, pa.int64()),
                        "v": pa.array(np.ones(len(c), dtype=np.int64))})
        g = tbl.group_by([src_col]).aggregate(
            [("t", "sum"), ("sq", "sum"), ("v", "sum")])
        return g.rename_columns([src_col, "t", "sq", "v"])

    moments = hash_aggregate(
        counts.map_batches(moment_partial, batch_format="pyarrow"),
        [src_col], aggs=[("t", "sum"), ("sq", "sum"), ("v", "sum")],
        rename={"t_sum": "n_tokens", "sq_sum": "sum_sq", "v_sum": "n_distinct"})

    def finish(batch: pa.Table) -> pa.Table:
        ts = batch.column("n_tokens").to_pylist()
        ss = batch.column("sum_sq").to_pylist()
        ppb = [(s * 10**9) // (t * t) if t else 0 for s, t in zip(ss, ts)]
        return pa.table({
            src_col: batch.column(src_col),
            "n_tokens": batch.column("n_tokens"),
            "n_distinct": batch.column("n_distinct"),
            "sum_sq": batch.column("sum_sq"),
            "collision_ppb": pa.array(ppb, pa.int64()),
        })

    return moments.map_batches(finish, batch_format="pyarrow")


def sql_renyi2_by_source(table: str = "documents", text_col: str = "text",
                         src_col: str = "source") -> str:
    return f"""
    WITH tok AS (
      SELECT {src_col},
             unnest(regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+')) AS w
      FROM {table}
    ), c AS (
      SELECT {src_col}, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY {src_col}, w
    )
    SELECT {src_col},
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(c * c) AS BIGINT) AS sum_sq,
           CAST((CAST(sum(c * c) AS HUGEINT) * 1000000000)
                // (CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS HUGEINT))
                AS BIGINT) AS collision_ppb
    FROM c GROUP BY {src_col}
    """


def readability(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Flesch-reading-ease-shaped readability score per document, in the
    exact int64 micro contract: with w = token count ([a-z0-9]+ runs),
    s = max(sentence-marker runs [.!?]+, 1), y = vowel-group runs [aeiou]+
    (the standard cheap syllable surrogate),

        flesch_micro = 206_835_000 - (1_015_000 * w) // s
                                   - (84_600_000 * y) // w

    — Flesch's 206.835 - 1.015(w/s) - 84.6(y/w) with both divisions floored
    in integer space so distributed and single-pass evaluation agree bit
    for bit.  Docs with zero tokens are dropped.  On punctuation-free
    corpora s clamps to 1 (each doc = one sentence) — documented, exact.

    Scale shape: one fully vectorized map_batches (three
    pyarrow count_substring_regex kernels, RE2 — no Python per row), no
    shuffle.  Output: (doc_id, n_words, n_sents, n_syll, flesch_micro)."""
    import numpy as np
    import pyarrow.compute as pc

    def score(batch: pa.Table) -> pa.Table:
        txt = pc.coalesce(batch.column(text_col), pa.scalar(""))
        w = pc.count_substring_regex(txt, pattern="[a-z0-9]+")\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(txt, pattern="[.!?]+")\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.count_substring_regex(txt, pattern="[aeiou]+")\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.maximum(s, 1)
        keep = w > 0
        w, s, y = w[keep], s[keep], y[keep]
        f = 206_835_000 - (1_015_000 * w) // s - (84_600_000 * y) // w
        k = pa.array(keep)
        return pa.table({
            id_col: batch.column(id_col).filter(k),
            "n_words": pa.array(w, pa.int64()),
            "n_sents": pa.array(s, pa.int64()),
            "n_syll": pa.array(y, pa.int64()),
            "flesch_micro": pa.array(f, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def sql_readability(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    return f"""
    WITH f AS (
      SELECT {id_col},
        CAST(length(regexp_extract_all(coalesce({text_col}, ''),
                                       '[a-z0-9]+')) AS BIGINT) AS w,
        greatest(CAST(length(regexp_extract_all(coalesce({text_col}, ''),
                                                '[.!?]+')) AS BIGINT), 1) AS s,
        CAST(length(regexp_extract_all(coalesce({text_col}, ''),
                                       '[aeiou]+')) AS BIGINT) AS y
      FROM {table}
    )
    SELECT {id_col}, w AS n_words, s AS n_sents, y AS n_syll,
           206835000 - (1015000 * w) // s - (84600000 * y) // w
             AS flesch_micro
    FROM f WHERE w > 0
    """

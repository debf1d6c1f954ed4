"""BPE merge learning — the tokenizer-training core of an LLM data pipeline.

Learns the first ``k`` byte-pair-encoding merges over the corpus token
stream, exactly the Sennrich et al. (2016) greedy procedure every production
tokenizer trainer (HF tokenizers, sentencepiece BPE mode) runs:

1. ONE distributed pass folds the corpus to word-type counts (the classic
   trainer shape — after this pass the working set is the word VOCABULARY,
   Heaps-law bounded, not the token stream; ``min_count`` bounds it further).
2. A driver loop over the vocabulary repeats ``k`` times: count adjacent
   symbol pairs weighted by word count, pick the most frequent pair (ties →
   lexicographically smallest (left, right)), merge it greedily
   left-to-right non-overlapping inside every word.

Exactness contract with the SQL mirror (:func:`sql_bpe_merges`): word state
is rendered with each symbol wrapped in its OWN spaces (``'cat'`` →
``' c  a  t '``), so a merge is a plain non-overlapping left-to-right
``replace(state, ' a  b ', ' ab ')`` — Python ``str.replace`` and DuckDB
``replace`` have identical semantics, and the exclusive space guards make
all occurrences disjoint (verified on the adversarial ``'aaa'``/``'abab'``
overlap cases).  The driver loop uses the equivalent list-walk form.

100-TB note: only step 1 touches the corpus (per-batch Counter → two-phase
bucketed aggregate; tokens never leave a batch unaggregated).  The driver
fold is vocabulary-bounded — the same trade every real BPE trainer makes.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ontoray.extras.textstats import TOKEN_RE


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of pair (a, b) — the
    classic BPE application; equals the space-guarded ``str.replace``."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_merges(ds, k: int = 6, min_count: int = 2, text_col: str = "text",
               num_partitions: int = 16) -> pa.Table:
    """First ``k`` BPE merges over ``ds[text_col]``.

    Returns (step, left_sym, right_sym, pair_count), step 1-based; fewer
    than ``k`` rows when the corpus runs out of repeated pairs."""
    from ontoray.stages.agg import hash_aggregate

    def toks(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            cnt.update(TOKEN_RE.findall(t or ""))
        return pa.table({"word": pa.array(list(cnt.keys()), pa.string()),
                         "c": pa.array(list(cnt.values()), pa.int64())})

    counts = hash_aggregate(
        ds.select_columns([text_col]).map_batches(toks, batch_format="pyarrow"),
        ["word"], partial_aggs=[("c", "sum")], aggs=[("c_sum", "sum")],
        rename={"c_sum_sum": "n"}, num_buckets=num_partitions,
    ).filter(expr=f"n >= {min_count}")

    vocab = [(list(r["word"]), r["n"]) for r in counts.take_all()]

    steps, lefts, rights, cnts = [], [], [], []
    for step in range(1, k + 1):
        pairs: Counter = Counter()
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        steps.append(step)
        lefts.append(a)
        rights.append(b)
        cnts.append(cnt)
        vocab = [(_merge_word(s, a, b) if a in s else s, n) for s, n in vocab]

    return pa.table({"step": pa.array(steps, pa.int64()),
                     "left_sym": pa.array(lefts, pa.string()),
                     "right_sym": pa.array(rights, pa.string()),
                     "pair_count": pa.array(cnts, pa.int64())})


def _sql_bpe_train_ctes(k: int = 6, min_count: int = 2,
                        table: str = "documents",
                        text_col: str = "text") -> str:
    """The WITH-chain shared by the train and encode mirrors: wc/s0 plus,
    per step i, p{i} (pair counts) → b{i} (best pair) → s{i} (merge applied),
    and bb{i} — b{i} padded with a never-matching sentinel row so encode's
    apply chain survives pair exhaustion (cross join with an empty b{i}
    would wipe the corpus; the engine just stops merging)."""
    parts = [f"""
WITH wc AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(coalesce({text_col}, ''),
                                         '[a-z0-9]+')) AS w FROM {table})
  GROUP BY w HAVING count(*) >= {min_count}
), s0 AS (
  SELECT word, n, regexp_replace(word, '(.)', ' \\1 ', 'g') AS st FROM wc
)"""]
    for i in range(1, k + 1):
        parts.append(f""", p{i} AS (
  SELECT pr[1] AS a, pr[2] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT n, unnest(list_zip(l, l[2:])) AS pr
        FROM (SELECT n, string_split(trim(st), '  ') AS l FROM s{i - 1}))
  WHERE pr[2] IS NOT NULL GROUP BY 1, 2
), b{i} AS (
  SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1
), bb{i} AS (
  SELECT a, b FROM b{i}
  UNION ALL SELECT chr(1), chr(1)
  WHERE NOT EXISTS (SELECT 1 FROM b{i})
), s{i} AS (
  SELECT w.word, w.n,
         replace(w.st, ' ' || b.a || '  ' || b.b || ' ',
                 ' ' || b.a || b.b || ' ') AS st
  FROM s{i - 1} w, b{i} b
)""")
    return "".join(parts)


def sql_bpe_merges(k: int = 6, min_count: int = 2, table: str = "documents",
                   text_col: str = "text") -> str:
    """Unrolled-CTE mirror: step i = pair counts over state i-1 → best pair
    (ORDER BY cnt DESC, a, b LIMIT 1) → replace-applied state i."""
    sel = " UNION ALL ".join(
        f"SELECT {i} AS step, a AS left_sym, b AS right_sym, "
        f"cnt AS pair_count FROM b{i}" for i in range(1, k + 1))
    return (_sql_bpe_train_ctes(k, min_count, table, text_col)
            + f" SELECT * FROM ({sel}) ORDER BY step")


def bpe_encode(ds, k: int = 6, min_count: int = 2, id_col: str = "doc_id",
               text_col: str = "text"):
    """Apply the ``k`` learned merges back to the corpus — the tokenizer
    ENCODE step, closing the train→apply loop: per document,

        n_words      = [a-z0-9]+ token count,
        n_chars_tok  = total characters inside those tokens,
        n_bpe_tokens = symbol count after all merges,
        ratio_micro  = 1_000_000 * n_bpe_tokens // n_chars_tok

    (the achieved compression vs character-level).  Zero-token docs emit no
    row.  Scale shape: training is :func:`bpe_merges` (one distributed
    word-count pass + the vocabulary-bounded trainer loop); the merge list
    (<= k pairs) is broadcast into a stateless vectorized-enough
    map_batches that memoizes merged forms per UNIQUE word within the
    batch (Zipf makes the per-batch word set far smaller than the token
    stream)."""
    merges_tbl = bpe_merges(ds, k=k, min_count=min_count, text_col=text_col)
    merges = list(zip(merges_tbl.column("left_sym").to_pylist(),
                      merges_tbl.column("right_sym").to_pylist()))

    def encode(batch: pa.Table) -> pa.Table:
        cache: dict[str, int] = {}
        ids, nw, nc, nb = [], [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = TOKEN_RE.findall(t or "")
            if not toks:
                continue
            total = 0
            for w in toks:
                got = cache.get(w)
                if got is None:
                    syms = list(w)
                    for a, b in merges:
                        if a in syms:
                            syms = _merge_word(syms, a, b)
                    got = cache[w] = len(syms)
                total += got
            chars = sum(len(w) for w in toks)
            ids.append(did)
            nw.append(len(toks))
            nc.append(chars)
            nb.append(total)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
            "n_chars_tok": pa.array(nc, pa.int64()),
            "n_bpe_tokens": pa.array(nb, pa.int64()),
            "ratio_micro": pa.array(
                [1_000_000 * b // c for b, c in zip(nb, nc)], pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        encode, batch_format="pyarrow")


def sql_bpe_encode(k: int = 6, min_count: int = 2, table: str = "documents",
                   text_col: str = "text", id_col: str = "doc_id") -> str:
    """Encode mirror: the training chain's bb{i} merges applied to every
    corpus token occurrence, symbol counts folded per document."""
    parts = [_sql_bpe_train_ctes(k, min_count, table, text_col)]
    parts.append(f""", tok AS (
  SELECT {id_col}, unnest(regexp_extract_all(coalesce({text_col}, ''),
                                             '[a-z0-9]+')) AS w
  FROM {table}
), a0 AS (
  SELECT {id_col}, w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS st FROM tok
)""")
    for i in range(1, k + 1):
        parts.append(f""", a{i} AS (
  SELECT {id_col}, w,
         replace(st, ' ' || b.a || '  ' || b.b || ' ',
                 ' ' || b.a || b.b || ' ') AS st
  FROM a{i - 1}, bb{i} b
)""")
    parts.append(f""", enc AS (
  SELECT {id_col}, CAST(length(w) AS BIGINT) AS nch,
         CAST(length(string_split(trim(st), '  ')) AS BIGINT) AS nsym
  FROM a{k}
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(nch) AS BIGINT) AS n_chars_tok,
       CAST(sum(nsym) AS BIGINT) AS n_bpe_tokens,
       CAST(1000000 * sum(nsym) // sum(nch) AS BIGINT) AS ratio_micro
FROM enc GROUP BY {id_col}""")
    return "".join(parts)

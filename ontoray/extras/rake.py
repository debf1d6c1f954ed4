"""RAKE-style keyword scoring (Rose et al. 2010) over the documents table.

Rapid Automatic Keyword Extraction: token streams are segmented into
candidate phrases at STOPWORD boundaries (the classic simplification —
punctuation never survives the ``[a-z0-9]+`` tokenizer, so stopwords are the
only delimiter class here, documented), every content word accumulates
  freq(w)  = number of occurrences,
  deg(w)   = sum over occurrences of its phrase's length
             (a word in longer phrases scores higher),
and the keyword score is the classic deg/freq ratio carried as an EXACT
integer: score_micro = (deg * 10**6) // freq — same floor division in the
DuckDB mirror, so the oracle hashes bit-for-bit.

Scale shape: phrase segmentation + (token -> freq, deg) partials are
per-batch (numpy cumsum over the stopword mask, np.unique fold — no Python
dict per row), so the only exchange is the vocabulary-bounded token
aggregate (``hash_aggregate`` two-phase combiner plan).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ontoray.extras.textstats import STOP_PROFILES, TOKEN_RE


def rake_words(ds, min_freq: int = 3, id_col: str = "doc_id",
               text_col: str = "text"):
    """(doc_id, text) -> (token, freq, deg, score_micro) for content words
    with corpus frequency >= min_freq, RAKE deg/freq scoring."""
    from ontoray.stages.agg import hash_aggregate

    stop = frozenset(STOP_PROFILES["en"])

    def partial(batch: pa.Table) -> pa.Table:
        toks_all, deg_all = [], []
        for t in batch.column(text_col).to_pylist():
            toks = TOKEN_RE.findall(t or "")
            if not toks:
                continue
            is_stop = np.fromiter((w in stop for w in toks), dtype=np.int64,
                                  count=len(toks))
            pid = np.cumsum(is_stop)            # phrase id per position
            keep = is_stop == 0
            if not keep.any():
                continue
            pids = pid[keep]
            uniq, inv, counts = np.unique(pids, return_inverse=True,
                                          return_counts=True)
            plen = counts[inv]                  # phrase length per occurrence
            kept = [w for w, k in zip(toks, keep) if k]
            toks_all.extend(kept)
            deg_all.append(plen)
        if not toks_all:
            return pa.table({"token": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        tbl = pa.table({
            "token": pa.array(toks_all, pa.string()),
            "freq": pa.array(np.ones(len(toks_all), dtype=np.int64)),
            "deg": pa.array(np.concatenate(deg_all)),
        })
        # in-batch combiner: one group_by before the exchange
        g = tbl.group_by(["token"]).aggregate([("freq", "sum"), ("deg", "sum")])
        return g.rename_columns(["token", "freq", "deg"])

    agg = hash_aggregate(
        ds.select_columns([id_col, text_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["token"], aggs=[("freq", "sum"), ("deg", "sum")],
        rename={"freq_sum": "freq", "deg_sum": "deg"})

    def score(batch: pa.Table) -> pa.Table:
        freq = batch.column("freq").to_numpy(zero_copy_only=False)
        deg = batch.column("deg").to_numpy(zero_copy_only=False)
        keep = freq >= min_freq
        return pa.table({
            "token": batch.column("token").filter(pa.array(keep)),
            "freq": pa.array(freq[keep], pa.int64()),
            "deg": pa.array(deg[keep], pa.int64()),
            "score_micro": pa.array(deg[keep] * 1_000_000 // freq[keep],
                                    pa.int64()),
        })

    return agg.map_batches(score, batch_format="pyarrow")


def sql_rake_words(min_freq: int = 3, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    stopw = ", ".join(f"'{w}'" for w in sorted(STOP_PROFILES["en"]))
    return f"""
    WITH d AS (
      SELECT {id_col},
             regexp_extract_all(coalesce({text_col}, ''), '[a-z0-9]+') AS l
      FROM {table}
    ), ix AS (
      SELECT {id_col}, l, unnest(generate_series(1, len(l))) AS i FROM d
    ), tok AS (
      SELECT {id_col}, i, l[i] AS w,
             CASE WHEN l[i] IN ({stopw}) THEN 1 ELSE 0 END AS is_stop
      FROM ix
    ), ph AS (
      SELECT {id_col}, i, w, is_stop,
             sum(is_stop) OVER (PARTITION BY {id_col} ORDER BY i) AS phrase_id
      FROM tok
    ), pl AS (
      SELECT {id_col}, phrase_id, count(*) AS plen
      FROM ph WHERE is_stop = 0 GROUP BY {id_col}, phrase_id
    ), occ AS (
      SELECT ph.w, pl.plen
      FROM ph JOIN pl ON ph.{id_col} = pl.{id_col}
                     AND ph.phrase_id = pl.phrase_id
      WHERE ph.is_stop = 0
    )
    SELECT w AS token, CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(plen) AS BIGINT) AS deg,
           (CAST(sum(plen) AS BIGINT) * 1000000) // count(*) AS score_micro
    FROM occ GROUP BY w HAVING count(*) >= {min_freq}
    """

"""Mention and triple extraction — stateful actor-pool stages.

Replaces the reference's per-chunk LLM extraction
(src/idea_extractor.py:63-103, src/relation_extractor.py:19-56) with
deterministic pattern extractors.  Both stages are callable CLASSES passed to
``map_batches(Cls, concurrency=N)``: compiled pattern automata and the
gazetteer are built once per actor in ``__init__`` (T1-style state), batches
stream through ``__call__``.
"""

from __future__ import annotations

import pyarrow as pa

from ontoray.text.extract import extract_mentions, extract_triples
from ontoray.text.normalize import normalize_concept_name


class MentionExtractor:
    """chunks (url, chunk_id, chunk_text) -> mentions (url, chunk_id, mention)."""

    def __init__(self, gazetteer: tuple[str, ...] = ()):
        self.gazetteer = tuple(gazetteer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, cids, mentions = [], [], []
        for url, cid, text in zip(batch.column("url").to_pylist(),
                                  batch.column("chunk_id").to_pylist(),
                                  batch.column("chunk_text").to_pylist()):
            for m in extract_mentions(text, self.gazetteer):
                urls.append(url)
                cids.append(cid)
                mentions.append(m)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "chunk_id": pa.array(cids, pa.int32()),
            "mention": pa.array(mentions, pa.string()),
        })


class TripleExtractor:
    """chunks -> triples (url, chunk_id, subj, pred, obj, subj_norm, pred_norm,
    obj_norm, conf, extractor)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("url", "chunk_id", "subj", "pred", "obj",
                                "subj_norm", "pred_norm", "obj_norm",
                                "conf", "extractor")}
        for url, cid, text in zip(batch.column("url").to_pylist(),
                                  batch.column("chunk_id").to_pylist(),
                                  batch.column("chunk_text").to_pylist()):
            for s, p, o, tag, conf in extract_triples(text):
                cols["url"].append(url)
                cols["chunk_id"].append(cid)
                cols["subj"].append(s)
                cols["pred"].append(p)
                cols["obj"].append(o)
                cols["subj_norm"].append(normalize_concept_name(s))
                cols["pred_norm"].append(p.lower())
                cols["obj_norm"].append(normalize_concept_name(o))
                cols["conf"].append(conf)
                cols["extractor"].append(tag)
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "chunk_id": pa.array(cols["chunk_id"], pa.int32()),
            "subj": pa.array(cols["subj"], pa.string()),
            "pred": pa.array(cols["pred"], pa.string()),
            "obj": pa.array(cols["obj"], pa.string()),
            "subj_norm": pa.array(cols["subj_norm"], pa.string()),
            "pred_norm": pa.array(cols["pred_norm"], pa.string()),
            "obj_norm": pa.array(cols["obj_norm"], pa.string()),
            "conf": pa.array(cols["conf"], pa.float32()),
            "extractor": pa.array(cols["extractor"], pa.string()),
        })


def make_mentions(chunks_ds, gazetteer: tuple[str, ...] = (), concurrency: int = 4,
                  batch_size: int = 1024):
    return chunks_ds.map_batches(
        MentionExtractor, fn_constructor_args=(gazetteer,),
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency))


def make_triples(chunks_ds, concurrency: int = 4, batch_size: int = 1024):
    return chunks_ds.map_batches(
        TripleExtractor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def dedup_triples(triples_ds):
    """Global exact triple dedup on (subj_norm, pred_norm, obj_norm) —
    reference set-dedup semantics (src/relation_extractor.py:87-88) as a
    groupby-aggregate shuffle with count + max-confidence rollup (SURVEY A2)."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        # Per-batch combiner: collapse duplicates before the shuffle.
        g = batch.group_by(["subj_norm", "pred_norm", "obj_norm"]).aggregate(
            [("conf", "max"), ("conf", "count")])
        return g.select(["subj_norm", "pred_norm", "obj_norm", "conf_max", "conf_count"])

    partials = triples_ds.select_columns(
        ["subj_norm", "pred_norm", "obj_norm", "conf"]
    ).map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["subj_norm", "pred_norm", "obj_norm"]).aggregate(
        Max("conf_max", alias_name="conf"),
        Sum("conf_count", alias_name="n_obs"),
    )

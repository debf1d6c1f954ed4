"""Run summaries, review queue, top-k rankings, provenance context join.

* ``run_summary`` — the IntegrationResults analog (reference
  src/data_models.py:64-83 and _prepare_final_results,
  src/integrated_schema_pipeline.py:310-327): per-decision counts, average
  confidence, automation rate.
* ``review_queue`` — UNCERTAIN entities for human review, LIMIT n
  (reference src/ontology_management_backend.py:805-814, O6).
* ``confidence_topk`` — confidence-ranked top-k
  (src/evaluation/confidence_k_evaluation.py:25-37, A12).
* ``mention_contexts`` — mention ⋈ chunk on (url, chunk_id): the provenance
  join that replaces the reference's global substring scan for concept
  context (src/schema_org_extractor.py:67-80, M16/J6).
"""

from __future__ import annotations

import pyarrow as pa

from ontoray.linking import EXTEND, MAP_EXACT, MAP_SIMILAR, UNCERTAIN


def run_summary(entities_ds) -> dict:
    """Decision-mix summary — counts via one grouped aggregate; confidence
    averaged in EXACT arithmetic: per-row nano-quantized int64
    (floor(c*1e9 + 0.5), identical float64 ops on both engines), summed
    (integer sums are order-independent, so the distributed fold is exact),
    then ONE float64 division with both operands converted to float64 first
    — the identical expression the DuckDB kg_summary mirror evaluates, which
    is what makes this 5-stat report hash-checkable."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count
    counts = {r["decision"]: r["n"] for r in
              entities_ds.groupby("decision").aggregate(Count(alias_name="n")).take_all()}
    total = sum(counts.values())
    mapped = counts.get(MAP_EXACT, 0) + counts.get(MAP_SIMILAR, 0)
    extended = counts.get(EXTEND, 0)
    review = counts.get(UNCERTAIN, 0)

    def _nano(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch.column("confidence"), pa.float64())
        return pa.table({"nano": pc.cast(
            pc.floor(pc.add(pc.multiply(c, 1e9), 0.5)), pa.int64())})

    if total:
        sum_nano = int(entities_ds.map_batches(
            _nano, batch_format="pyarrow").sum("nano") or 0)
        avg_conf = float(sum_nano) / float(total * 10**9)
    else:
        avg_conf = 0.0
    automation = ((mapped + extended) / total * 100) if total else 0.0
    return {
        "total_concepts_extracted": total,
        "concepts_mapped_to_existing": mapped,
        "concepts_extending_ontology": extended,
        "concepts_requiring_review": review,
        "average_confidence": avg_conf,
        "automation_rate": automation,
    }


def review_queue(entities_ds, limit: int = 200):
    """UNCERTAIN entities, deterministic order (name), LIMIT n."""
    return (entities_ds.filter(expr="status == 'review'")
            .sort("name").limit(limit))


def confidence_topk(entities_ds, k: int = 25):
    """Top-k entities by decision confidence (ties broken by name)."""
    return entities_ds.sort(["confidence", "name"], descending=[True, False]).limit(k)


def mention_contexts(mentions_ds, chunks_ds, num_partitions: int = 16):
    """mentions (url, chunk_id, mention) ⋈ chunks (url, chunk_id, chunk_text)
    -> (url, chunk_id, mention, chunk_text) via the partitioned hash join on
    a composite key."""
    from ontoray.stages.joins import hash_join

    def _key(batch: pa.Table, name: str) -> pa.Array:
        import pyarrow.compute as pc
        return pc.binary_join_element_wise(
            batch.column("url"), pc.cast(batch.column("chunk_id"), pa.string()), "\x1f")

    def m_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ck", _key(batch, "__ck"))

    def c_key(batch: pa.Table) -> pa.Table:
        return pa.table({"__ck2": _key(batch, "__ck2"),
                         "chunk_text": batch.column("chunk_text")})

    m = mentions_ds.map_batches(m_key, batch_format="pyarrow")
    c = chunks_ds.map_batches(c_key, batch_format="pyarrow")
    joined = hash_join(m, c, "__ck", "__ck2", how="inner", num_partitions=num_partitions,
                       right_cols=["chunk_text"])
    return joined.select_columns(["url", "chunk_id", "mention", "chunk_text"])

"""Engine configuration.

Mirrors the reference's ``PipelineConfig`` (reference src/data_models.py:48-62)
— the integrated pipeline's actual defaults — plus engine-level knobs
(parallelism, batch sizes, checkpointing) the reference lacks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Similarity thresholds: the reference has two conflicting default sets
# (src/config.py:88-93 vs src/data_models.py:58-62).  We use the
# PipelineConfig values since that is what the integrated pipeline uses
# (src/integrated_schema_pipeline.py:38).
DEFAULT_THRESHOLDS = {
    "exact_match": 0.95,
    "high_similarity": 0.85,
    "medium_similarity": 0.70,
    "low_similarity": 0.50,
}

# Reference chunking params (src/config.py:83-84).
CHUNK_SIZE = 1000
CHUNK_OVERLAP = 100

# Concept validity stopwords, verbatim from reference src/idea_extractor.py:22-29.
CONCEPT_STOPWORDS = frozenset({
    "figure", "table", "application", "system", "section", "part", "example",
    "information", "note", "introduction", "overview", "description", "feature",
    "copyright", "inc", "page", "date", "january", "february", "march", "april",
    "may", "june", "july", "august", "september", "october", "november", "december",
    "california", "texas", "germany", "japan", "china", "india", "france",
})


@dataclass
class PipelineConfig:
    """Configuration for the KG-construction pipeline.

    Decision semantics follow reference src/ontology_extension_manager.py:368-421
    with ``enable_llm_validation=False`` (the deterministic branch: the
    high-similarity window falls through to the medium check → UNCERTAIN).
    """

    similarity_thresholds: dict = field(default_factory=lambda: dict(DEFAULT_THRESHOLDS))
    # Deterministic replacement for the reference's LLM tie-break: when True,
    # best scores >= validate_threshold are accepted as MAP_SIMILAR.
    enable_rule_validation: bool = False
    validate_threshold: float = 0.92
    enable_technical_matching: bool = True

    chunk_size: int = CHUNK_SIZE
    chunk_overlap: int = CHUNK_OVERLAP

    # Engine knobs (no reference analog — scale design).
    batch_size: int = 1024            # rows per map_batches batch for text stages
    linker_concurrency: int = 4       # actor-pool size for the entity linker
    extractor_concurrency: int = 4    # actor-pool size for mention/triple extraction
    salt_buckets: int = 16            # salting factor for skewed groupbys
    num_blocks: int | None = None     # None = 2x cluster CPUs
    extractor_actors: bool = False    # pin extraction to an actor pool (default: tasks)
    linker_actors: bool = False       # pin linking to an actor pool (default: tasks
                                      # with a per-worker cached broadcast — warm
                                      # workers, no pool spawn on the critical path)
    resolve_mode: str = "auto"        # edge endpoint resolution: broadcast | join | auto
    # "auto" broadcasts while the (surface -> node) map stays under this many
    # entries; beyond it, partitioned hash join.  None (default) derives the
    # gate from cluster memory at run time via
    # ``derived_resolve_broadcast_max`` — measured r5 at 6M entries: ~51
    # B/entry plasma (ONE copy per node) + ~87 B/entry per-worker pandas
    # hash index, i.e. 304 MB shared + 520 MB/worker at 6M.  The old fixed
    # 4M gate pushed the 16M-page corpus (~4.4M entities) onto the join
    # path — two extra corpus-scale exchanges — and cost it the fused
    # single-shuffle plan (measured 2->8 raw 0.732 vs 0.766+ at 8M).
    resolve_broadcast_max: int | None = None
    sort_mode: str = "partitioned"    # final node/edge order: partitioned | global
    # or "shuffle" / "single_read" (see stages/ingest.py).  A/B at 500k/8:
    # broadcast_winners 28.1-30.0 s e2e vs single_read 30.7-32.4 s — the
    # winner side-pass reads only 3 pruned columns so the second parquet
    # scan is cheap HERE; single_read wins when the second scan costs real
    # IO (cold/remote object storage at the 100-TB shape).
    url_dedup_strategy: str = "broadcast_winners"
    # Auto-gate for 'broadcast_winners': above this many DUPLICATED urls the
    # winner fold would build driver-side Python dicts past comfort (~2M
    # entries ≈ hundreds of MB), so extract_docs falls back to 'shuffle'
    # (no driver state, one text exchange) — mirrors resolve_mode='auto'.
    dup_broadcast_max: int = 2_000_000
    canonicalize_urls: bool = False   # normalize urls (utm/fragment/port/case/www)
                                      # BEFORE per-url dedup (text/urlnorm.py)
    embed_dim: int = 64               # char-ngram hash embedding dimension
    checkpoint_dir: str | None = None # stage-checkpoint root (None = no checkpointing)
    docs_partitions: int = 32         # url-hash partitions for per-partition docs resume
    linker_partitions: int = 32       # mention-hash partitions for per-partition entities resume
    edge_partitions: int = 32         # src-hash partitions for per-partition edges resume

    # Curation (reference src/curation/graph_cleaner.py:53,89).
    degree_threshold: int = 1
    curation_root: str = "ElectronicComponent"
    max_hierarchy_depth: int = 12     # bound for iterative reachability

    # Technical-property delivery to the linker (J3 features): "broadcast"
    # folds the pivoted props table into a driver dict shipped via ray.put;
    # "join" hash-joins it onto the distinct mentions (the unbounded-scale
    # path — the property vocabulary grows with the open part-number space);
    # "auto" gates on props_broadcast_max rows.
    props_mode: str = "auto"
    props_broadcast_max: int = 1_000_000

    # Stream the cleaned docs straight into extraction (no docs materialize
    # barrier) instead of pinning the cleaned corpus once.  A/B'd NEGATIVE at
    # 500k/8 (63.9 s fused vs 38.8 s materialized) and 2M (179 vs 95 s at 8
    # CPUs): the barrier buys block-sized clean batches and a pinned reuse
    # point; the fused chain re-cleans under the extractor's small batch
    # size.  Kept as a knob for storage-bound deployments where the
    # object-store round-trip of cleaned text is the scarcer resource.
    fuse_docs: bool = False


def derived_resolve_broadcast_max(default: int = 4_000_000,
                                  index_bytes_per_entry: int = 90,
                                  worker_heap_share: float = 0.25,
                                  floor: int = 1_000_000,
                                  cap: int = 16_000_000) -> int:
    """Memory-derived resolve-broadcast gate (VERDICT r4 "next round" #2).

    The binding constraint is each worker's CACHED HASH INDEX over the
    broadcast (keys, vals) arrays — measured ~87 B/entry deep at 6M entries
    (pandas string Index; the plasma copy is ~51 B/entry but shared
    node-wide).  Allow that index ``worker_heap_share`` of one worker's
    memory slice (cluster memory / cluster CPUs — Ray's own heap accounting
    unit), clamp to [floor, cap].  Falls back to ``default`` when no Ray
    cluster is reachable."""
    try:
        import ray
        if not ray.is_initialized():
            return default
        res = ray.cluster_resources()
        mem = float(res.get("memory", 0.0))
        cpus = max(1.0, float(res.get("CPU", 1.0)))
    except Exception:
        return default
    if mem <= 0:
        return default
    per_worker = mem / cpus
    return int(min(cap, max(floor,
                            per_worker * worker_heap_share
                            / index_bytes_per_entry)))

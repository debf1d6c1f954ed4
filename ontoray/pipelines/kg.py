"""End-to-end KG-construction pipeline.

Ray-Data-native composition of the reference's integrated pipeline
(src/integrated_schema_pipeline.py:70-99 steps 1-9): pages → docs → chunks →
(mentions, triples) → distinct-mention canonicalization shuffle → linker actor
pool with broadcast alias dictionary → entities → node/edge materialize →
curation → stats.  Optionally checkpointed per stage with per-partition
lineage manifests (resume = read checkpoint Parquet).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from ontoray.aliases import AliasData, build_alias_data, gazetteer_phrases
from ontoray.config import PipelineConfig
from ontoray.stages.chunking import make_chunks
from ontoray.stages.curation import curate_and_stats, graph_stats
from ontoray.stages.extraction import (ChunkAndExtract, chunk_and_extract_batch,
                                        dedup_triples, split_combined)
from ontoray.stages.graph import build_edges, build_nodes
from ontoray.stages.ingest import extract_docs
from ontoray.stages.linking import gated_props, link_entities
from ontoray.state.checkpoint import CheckpointManager


def _docs_stage_partitioned(ckpt: CheckpointManager, pages_ds, cfg: PipelineConfig,
                            fingerprint: str):
    """Docs stage with PER-PARTITION resume (north_rule lineage contract):
    output is url-hash-partitioned parquet with atomic per-partition markers;
    a killed run recomputes only the unmarked partitions — the input is
    pre-filtered to those urls, so the clean/dedup work (not just the write)
    is pruned.  Url-hash partitioning keeps every row of a url in one
    partition, so the first-wins dedup stays exact on any subset of
    partitions."""
    import zlib

    import pyarrow as pa

    from ontoray.stages.ingest import extract_docs

    if ckpt.is_complete("docs", fingerprint):
        return ckpt.load("docs")
    if cfg.canonicalize_urls:
        # Canonicalize BEFORE the partition-membership filter: partitions are
        # keyed by the url that ends up in the output (the canonical one), so
        # pruning must hash the same form.
        from ontoray.text.urlnorm import canonicalize_url_column

        def _canon(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index("url")
            return batch.set_column(i, "url",
                                    canonicalize_url_column(batch.column("url")))

        pages_ds = pages_ds.map_batches(_canon, batch_format="pyarrow")
    n_parts = cfg.docs_partitions
    done = ckpt.begin_partitioned("docs", fingerprint)
    missing = sorted(set(range(n_parts)) - done)
    if not missing:
        # Every partition marker landed; only the seal is missing.
        import ray.data as rd
        empty = pa.table({"url": pa.array([], pa.string()),
                          "doc_text": pa.array([], pa.string()),
                          "__part": pa.array([], pa.int64())})
        return ckpt.save_partitioned("docs", rd.from_arrow(empty), "__part",
                                     fingerprint, keep_part_col=True)

    def part_ids(urls: list[str]) -> list[int]:
        return [zlib.crc32(u.encode()) % n_parts for u in urls]

    if missing != list(range(n_parts)):
        missing_set = set(missing)

        def keep_missing(batch: pa.Table) -> pa.Table:
            parts = part_ids(batch.column("url").to_pylist())
            return batch.filter(pa.array([p in missing_set for p in parts],
                                         pa.bool_()))

        pages_sub = pages_ds.map_batches(keep_missing, batch_format="pyarrow")
    else:
        pages_sub = pages_ds

    # canonicalize=False: urls were already canonicalized above (the resume
    # partition filter must see the same form the output is partitioned by).
    docs = extract_docs(pages_sub, dedup_strategy=cfg.url_dedup_strategy,
                        dup_broadcast_max=cfg.dup_broadcast_max)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", pa.array(part_ids(batch.column("url").to_pylist()),
                               pa.int64()))

    # __part kept in the files so downstream partitioned stages (extraction)
    # inherit the lineage and can prune their recompute at FILE granularity.
    return ckpt.save_partitioned(
        "docs", docs.map_batches(add_part, batch_format="pyarrow"),
        "__part", fingerprint, keep_part_col=True)


def _extraction_stage_partitioned(ckpt: CheckpointManager, docs, cfg: PipelineConfig,
                                  fingerprint: str, alias: AliasData):
    """Extraction with per-partition resume: consumes the docs checkpoint's
    url-hash partition files, recomputes ONLY unmarked partitions (reading
    only those FILES — input pruning at the storage layer), and writes
    per-partition extraction output with atomic markers.  Output rows carry
    no provenance (the fused extractor pre-aggregates), so attribution runs
    per __part group within each batch — exact regardless of block mixing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ontoray.aliases import gazetteer_phrases
    from ontoray.stages.extraction import chunk_and_extract_batch

    if ckpt.is_complete("extraction", fingerprint):
        return ckpt.load("extraction")
    n_parts = cfg.docs_partitions
    done = ckpt.begin_partitioned("extraction", fingerprint)
    missing = sorted(set(range(n_parts)) - done)
    gaz = gazetteer_phrases(alias)
    src = (docs if len(missing) == n_parts
           else (ckpt.load_partitions("docs", missing) if missing else None))
    if src is None:
        # Nothing to recompute (crash landed after the last data-bearing
        # partition's marker, or the only missing partitions are empty) —
        # just re-seal the stage.
        import ray.data as rd
        empty = pa.table({"url": pa.array([], pa.string()),
                          "doc_text": pa.array([], pa.string())})
        t = chunk_and_extract_batch(empty, gaz, cfg.chunk_size, cfg.chunk_overlap)
        t = t.append_column("__part", pa.array([], pa.int64()))
        return ckpt.save_partitioned("extraction", rd.from_arrow(t), "__part",
                                     fingerprint)

    def fused_with_part(batch: pa.Table) -> pa.Table:
        parts = batch.column("__part")
        outs = []
        for pv in pc.unique(parts).to_pylist():
            sub = batch.filter(pc.equal(parts, pv))
            t = chunk_and_extract_batch(sub, gaz, cfg.chunk_size, cfg.chunk_overlap)
            outs.append(t.append_column(
                "__part", pa.array([pv] * t.num_rows, pa.int64())))
        if not outs:
            t = chunk_and_extract_batch(batch, gaz, cfg.chunk_size, cfg.chunk_overlap)
            return t.append_column("__part", pa.array([], pa.int64()))
        return pa.concat_tables(outs)

    ds = src.map_batches(fused_with_part, batch_format="pyarrow",
                         batch_size=cfg.batch_size)
    return ckpt.save_partitioned("extraction", ds, "__part", fingerprint)


def _entities_stage_partitioned(ckpt: CheckpointManager, mentions, alias: AliasData,
                                cfg: PipelineConfig, fingerprint: str, props: dict):
    """Entity-linking stage with per-partition resume: partitions are
    mention-hash classes (crc32(mention) % n), the SAME key the distinct
    aggregation groups on — so restricting the input to missing partitions
    is exact (a mention's every occurrence lands in one partition), and the
    linker recomputes only those.  The entity name IS the mention, so the
    output partition column is recomputed from the row itself."""
    import zlib

    import pyarrow as pa

    from ontoray.stages.linking import link_entities

    if ckpt.is_complete("entities", fingerprint):
        return ckpt.load("entities")
    n_parts = cfg.linker_partitions
    done = ckpt.begin_partitioned("entities", fingerprint)
    missing = sorted(set(range(n_parts)) - done)

    def part_of(names: list[str]) -> list[int]:
        return [zlib.crc32(m.encode()) % n_parts for m in names]

    src = mentions
    if missing and missing != list(range(n_parts)):
        missing_set = set(missing)

        def keep_missing(batch: pa.Table) -> pa.Table:
            parts = part_of(batch.column("mention").to_pylist())
            return batch.filter(pa.array([p in missing_set for p in parts],
                                         pa.bool_()))

        src = mentions.map_batches(keep_missing, batch_format="pyarrow")

    if not missing:
        # Every partition marker landed; only the seal is missing.
        import ray.data as rd
        from ontoray.stages.linking import ENTITY_SCHEMA
        empty_cols = {f.name: pa.array([], f.type) for f in ENTITY_SCHEMA}
        empty_cols["__part"] = pa.array([], pa.int64())
        return ckpt.save_partitioned("entities", rd.from_arrow(pa.table(empty_cols)),
                                     "__part", fingerprint)

    ents = link_entities(src, alias, cfg, props)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", pa.array(part_of(batch.column("name").to_pylist()),
                               pa.int64()))

    return ckpt.save_partitioned(
        "entities", ents.map_batches(add_part, batch_format="pyarrow"),
        "__part", fingerprint)


def _edges_stage_partitioned(ckpt: CheckpointManager, cfg: PipelineConfig,
                             fingerprint: str, build, full_ds=None):
    """Edges stage with per-partition resume: output parquet is partitioned
    by ``crc-stable hash(src) % edge_partitions`` (a pure function of the
    final edge row) with atomic per-partition markers; within each file the
    rows are sorted by (src, rel, dst) — a fully deterministic layout.

    On partial resume, ``build(src_keep)`` reruns the edge build with a
    vectorized src-partition membership filter applied BEFORE the rollup
    exchange (see graph.build_edges): the corpus scan is unavoidable (edge
    partitions are not aligned with extraction storage partitions) but all
    shuffle/rollup/sort work is pruned to the missing partitions.  A fresh
    run uses ``full_ds`` when the caller already holds the fused-plan edge
    view (avoids a second corpus pass)."""
    import numpy as np
    import pyarrow as pa

    from ontoray.stages.agg import stable_hash_column

    if ckpt.is_complete("edges", fingerprint):
        return ckpt.load("edges")
    n_parts = cfg.edge_partitions
    done = ckpt.begin_partitioned("edges", fingerprint)
    missing = sorted(set(range(n_parts)) - done)

    def part_of(col) -> "np.ndarray":
        return (stable_hash_column(col) % np.uint64(n_parts)).astype(np.int64)

    if not missing:
        # Every partition marker landed; only the seal is missing.
        import ray.data as rd
        empty = pa.table({"src": pa.array([], pa.string()),
                          "__part": pa.array([], pa.int64())})
        return ckpt.save_partitioned("edges", rd.from_arrow(empty), "__part",
                                     fingerprint, sort_keys=["src", "rel", "dst"])

    fresh = len(missing) == n_parts
    if fresh and full_ds is not None:
        ds = full_ds
    else:
        missing_arr = np.array(missing, dtype=np.int64)

        def src_keep(col):
            return np.isin(part_of(col), missing_arr)

        ds = build(None if fresh else src_keep)

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__part", pa.array([], pa.int64()))
        return batch.append_column(
            "__part", pa.array(part_of(batch.column("src")), pa.int64()))

    return ckpt.save_partitioned(
        "edges", ds.map_batches(add_part, batch_format="pyarrow"), "__part",
        fingerprint, sort_keys=["src", "rel", "dst"])


@dataclass
class KGResult:
    docs: Any
    chunks: Any
    mentions: Any
    triples: Any            # raw triples with provenance
    triples_dedup: Any      # canonical (subj_norm, pred_norm, obj_norm) set
    entities: Any
    nodes: Any
    edges: Any
    stats: dict = field(default_factory=dict)


def run_kg_pipeline(pages_ds, cfg: PipelineConfig | None = None,
                    alias: AliasData | None = None,
                    curate_graph: bool = True,
                    fingerprint: str = "") -> KGResult:
    import ray

    cfg = cfg or PipelineConfig()
    alias = alias or build_alias_data(cfg.embed_dim)
    ckpt = CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    if ckpt is not None and not fingerprint:
        # Derive a default fingerprint from the input file listing so two
        # default runs over different corpora sharing a checkpoint_dir can
        # never resume each other's stale outputs; with no file lineage the
        # fingerprint stays empty and is_complete refuses to resume.
        import hashlib
        try:
            files = sorted(pages_ds.input_files())
            fingerprint = "files:" + hashlib.sha1("\n".join(files).encode()).hexdigest()
        except Exception:
            fingerprint = ""
    # Blocks to restore downstream parallelism after block-collapsing shuffles
    # (a groupby emits as many blocks as its input had; a single-file read or
    # from_arrow input starts at 1).
    n_blocks = cfg.num_blocks or max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    import time
    stage_walls: dict[str, float] = {}

    def stage(name: str, build, reused: bool = False):
        """Checkpoint-or-build.  A completed stage (manifest fingerprint match
        + _SUCCESS) is read back instead of recomputed.  Without a checkpoint
        dir, stages consumed by MULTIPLE downstream consumers are pinned with
        ``materialize()`` so lineage is not re-executed per consumer; with a
        checkpoint dir they stream to Parquet instead (the 100-TB path)."""
        t0 = time.perf_counter()
        if ckpt is not None and ckpt.is_complete(name, fingerprint):
            return ckpt.load(name)
        ds = build()
        if ckpt is not None:
            ds = ckpt.save(name, ds, fingerprint)
        elif reused:
            ds = ds.materialize()
        stage_walls[name] = round(time.perf_counter() - t0, 3)
        return ds

    # Input parallelism: a single-file read or from_arrow input is ONE block,
    # which would serialize every map stage — rebalance before the hot path.
    # A many-file parquet read already supplies parallel blocks; skip the
    # redundant all-to-all in that case.
    try:
        n_inputs = len(pages_ds.input_files())
    except Exception:
        n_inputs = 0
    if n_inputs < max(4, n_blocks // 4):
        pages_ds = pages_ds.repartition(n_blocks)
    if ckpt is not None:
        t0 = time.perf_counter()
        docs = _docs_stage_partitioned(ckpt, pages_ds, cfg, fingerprint)
        stage_walls["docs"] = round(time.perf_counter() - t0, 3)
    else:
        # cfg.fuse_docs=True keeps docs as a LAZY view fused into the
        # extraction tasks (no materialize barrier, no object-store
        # round-trip of cleaned text) — measured SLOWER on this box (see
        # config.py); the default pins the cleaned corpus once.
        # 'single_read' materializes its keyed (url, k, doc_text) dataset
        # INTERNALLY (the winner fold needs a second pass over it); the
        # outer pin would hold a second full copy of the cleaned corpus in
        # the object store, so consumers re-run only the cheap vectorized
        # winner filter instead.
        docs = stage("docs", lambda: extract_docs(
            pages_ds, dedup_strategy=cfg.url_dedup_strategy,
            canonicalize=cfg.canonicalize_urls,
            dup_broadcast_max=cfg.dup_broadcast_max),
            reused=not cfg.fuse_docs and cfg.url_dedup_strategy != "single_read")

    # Fused hot path: chunk + mention + triple extraction in ONE pass over
    # docs — one barrier instead of three (chunks/mentions/triples remain
    # available as standalone stages for finer-grained pipelines).  Stateless
    # tasks by default (warm workers, elastic); cfg.extractor_actors pins an
    # actor pool instead.
    def build_extraction():
        kwargs = dict(batch_format="pyarrow", batch_size=cfg.batch_size)
        if cfg.extractor_actors:
            return docs.map_batches(
                ChunkAndExtract,
                fn_constructor_args=(gazetteer_phrases(alias), cfg.chunk_size, cfg.chunk_overlap),
                concurrency=(1, cfg.extractor_concurrency), **kwargs)
        return docs.map_batches(
            chunk_and_extract_batch,
            fn_kwargs=dict(gazetteer=gazetteer_phrases(alias),
                           chunk_size=cfg.chunk_size, chunk_overlap=cfg.chunk_overlap),
            **kwargs)

    if ckpt is not None:
        t0 = time.perf_counter()
        combined = _extraction_stage_partitioned(ckpt, docs, cfg, fingerprint, alias)
        stage_walls["extraction"] = round(time.perf_counter() - t0, 3)
    else:
        combined = stage("extraction", build_extraction, reused=True)
    mentions, triples = split_combined(combined)
    chunks = make_chunks(docs, cfg.chunk_size, cfg.chunk_overlap)  # lazy view

    # The entity-scale tail runs vocabulary-bounded data through several
    # all-to-alls whose cost is coordination, not bytes — independent chains
    # are overlapped on driver threads (each .materialize() gets its own
    # streaming executor; Ray schedules both against the same CPU pool).
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    # Threshold-gated: broadcast dict while the property vocabulary is small,
    # distributed join table beyond cfg.props_broadcast_max (VERDICT r2 #3).
    props_dict, props_ds = gated_props(triples, cfg.props_mode,
                                       cfg.props_broadcast_max)
    props = props_dict if props_ds is None else props_ds
    stage_walls["props"] = round(time.perf_counter() - t0, 3)
    # The linker gets the whole machine to itself (pre-spawned actors + the
    # distinct-mention shuffle saturate it; concurrent shuffles measured to
    # inflate both sides' walls more than the overlap saves).
    if ckpt is not None:
        t0 = time.perf_counter()
        entities = _entities_stage_partitioned(ckpt, mentions, alias, cfg,
                                               fingerprint, props)
        stage_walls["entities"] = round(time.perf_counter() - t0, 3)
    else:
        entities = stage("entities", lambda: link_entities(mentions, alias, cfg, props),
                         reused=True)

    # Endpoint resolution: broadcast the (surface -> node) map while the
    # canonical-entity table is small; switch to the partitioned hash join
    # once it grows past driver-broadcast comfort.
    resolve_mode = cfg.resolve_mode
    if resolve_mode == "auto":
        # Broadcast (and the FUSED single-shuffle dedup+edges plan it
        # enables) is faster until the resolution map threatens worker heap;
        # beyond the gate, partitioned hash join.  The gate is memory-derived
        # by default (cfg.resolve_broadcast_max=None -> cluster memory /
        # CPU × 25% / 90 B-per-index-entry, measured r5): the old fixed 4M
        # gate pushed the 16M-page corpus (~4.4M entities) onto the join
        # path — two extra corpus-scale exchanges (VERDICT r4 #2).
        from ontoray.config import derived_resolve_broadcast_max
        gate = (cfg.resolve_broadcast_max
                if cfg.resolve_broadcast_max is not None
                else derived_resolve_broadcast_max())
        resolve_mode = ("join" if entities.count() > gate else "broadcast")

    if resolve_mode == "broadcast":
        # FUSED plan: one corpus-scale shuffle (bucket by subj_norm) yields
        # BOTH the triple-key dedup table and the per-bucket edge partials;
        # a second, edge-vocabulary-scale rollup finishes the edges.  The
        # shuffle-free node build overlaps on a driver thread.
        from ontoray.stages.graph import fused_dedup_and_edges

        def build_edges_bc(src_keep):
            return build_edges(entities, triples, alias, num_partitions=n_blocks,
                               resolve_mode="broadcast", sort_mode=cfg.sort_mode,
                               src_keep=src_keep)

        def fused():
            if ckpt is None:
                td_v, ed_v = fused_dedup_and_edges(
                    triples, entities, alias, num_buckets=n_blocks,
                    sort_mode=cfg.sort_mode)
                td = stage("triples_dedup", lambda: td_v, True)
                ed = stage("edges", lambda: ed_v, True)
                return td, ed
            td_done = ckpt.is_complete("triples_dedup", fingerprint)
            ed_done = ckpt.is_complete("edges", fingerprint)
            ed_partial = (not ed_done) and bool(ckpt.completed_partitions("edges"))
            if not td_done and not ed_done and not ed_partial:
                # Fresh: ONE fused shuffle yields both outputs; the edge view
                # lands partitioned (per-partition markers for resume).
                td_v, ed_v = fused_dedup_and_edges(
                    triples, entities, alias, num_buckets=n_blocks,
                    sort_mode=cfg.sort_mode)
                td = stage("triples_dedup", lambda: td_v, True)
                ed = _edges_stage_partitioned(ckpt, cfg, fingerprint,
                                              build_edges_bc, full_ds=ed_v)
                return td, ed
            # Resume: the chains separate — each side recomputes only what it
            # is missing (edges prune to unmarked src-hash partitions).
            td = stage("triples_dedup", lambda: dedup_triples(triples), True)
            ed = _edges_stage_partitioned(ckpt, cfg, fingerprint, build_edges_bc)
            return td, ed

        with ThreadPoolExecutor(max_workers=2) as ex:
            f_nodes = ex.submit(stage, "nodes",
                                lambda: build_nodes(entities, alias, cfg.sort_mode),
                                True)
            f_te = ex.submit(fused)
            nodes = f_nodes.result()
            triples_dd, edges = f_te.result()
    else:
        # Partitioned-join resolution (vocabulary beyond broadcast): separate
        # dedup / edge chains, overlapped with the node build.
        def build_edges_join(src_keep=None):
            return build_edges(entities, triples, alias, num_partitions=n_blocks,
                               resolve_mode=resolve_mode, sort_mode=cfg.sort_mode,
                               src_keep=src_keep)

        def edges_stage():
            if ckpt is not None:
                return _edges_stage_partitioned(ckpt, cfg, fingerprint,
                                                build_edges_join)
            return stage("edges", build_edges_join, True)

        with ThreadPoolExecutor(max_workers=3) as ex:
            f_td = ex.submit(stage, "triples_dedup",
                             lambda: dedup_triples(triples), True)
            f_nodes = ex.submit(stage, "nodes",
                                lambda: build_nodes(entities, alias, cfg.sort_mode),
                                True)
            f_edges = ex.submit(edges_stage)
            triples_dd = f_td.result()
            nodes = f_nodes.result()
            edges = f_edges.result()

    stats: dict = {}
    if curate_graph:
        t0 = time.perf_counter()
        nodes, edges, removed, fused_stats = curate_and_stats(
            nodes, edges, cfg.curation_root, cfg.degree_threshold,
            cfg.max_hierarchy_depth)
        if ckpt is not None:
            nodes = ckpt.save("nodes_curated", nodes, fingerprint)
            edges = ckpt.save("edges_curated", edges, fingerprint)
        elif fused_stats is None:
            # Large branch: the outputs are lazy join-filter chains that
            # callers scan repeatedly — pin both, in parallel.  (The small
            # branch returns driver-backed from_arrow datasets already.)
            with ThreadPoolExecutor(max_workers=2) as ex:
                f_n = ex.submit(nodes.materialize)
                f_e = ex.submit(edges.materialize)
                nodes = f_n.result()
                edges = f_e.result()
        stats.update(removed)
        stage_walls["curate"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        if fused_stats is None:      # large branch: stats over the curated tables
            fused_stats = graph_stats(nodes, edges)
        stats.update(fused_stats)
        stage_walls["graph_stats"] = round(time.perf_counter() - t0, 3)
    else:
        t0 = time.perf_counter()
        stats.update(graph_stats(nodes, edges))
        stage_walls["graph_stats"] = round(time.perf_counter() - t0, 3)
    stats["stage_walls"] = stage_walls

    return KGResult(docs=docs, chunks=chunks, mentions=mentions, triples=triples,
                    triples_dedup=triples_dd, entities=entities, nodes=nodes,
                    edges=edges, stats=stats)

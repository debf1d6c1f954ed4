"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the ontoray library) calls ray.init()/ray.shutdown().

- ``entry()`` — flagship KG-construction pipeline on /root/testdata/sf0.001.
- ``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2);
  each callable takes sf_dir and returns a Dataset / pandas / pyarrow result.
- ``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents for ALL 83
  queries: the full entity-linking decision engine (exact-arithmetic
  embedding cosine + a recursive-CTE difflib ratio —
  ontoray/queries_linker.py), graph materialize + curation, MinHash/SimHash
  LSH, sketches, fixed-point k-means, exact IVF, and the string-exact
  JSON-LD export/validation pair.  Zero rows-only queries remain.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ontoray import queries as Q


def _pages_ds(sf_dir: str):
    from ontoray.pages import pages_from_documents
    return pages_from_documents(sf_dir)


_KG_CACHE: dict = {}


def _kg_result(sf_dir: str):
    """Per-process memo: several queries() entries expose different tables of
    the same pipeline run; stage outputs are materialized so reuse is free."""
    if sf_dir not in _KG_CACHE:
        from ontoray.pipelines.kg import run_kg_pipeline
        _KG_CACHE[sf_dir] = run_kg_pipeline(_pages_ds(sf_dir), curate_graph=True)
    return _KG_CACHE[sf_dir]


def entry() -> Any:
    """Flagship: full KG pipeline (clean → extract → link → materialize) on
    sf0.001; returns the deduplicated, sorted edge table."""
    return _kg_result("/root/testdata/sf0.001").edges


def _q_kg_chunks(sf_dir: str):
    import pyarrow as pa
    from ontoray.stages.chunking import make_chunks

    def as_doc(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([str(d) for d in batch.column("doc_id").to_pylist()], pa.string()),
            "doc_text": batch.column("doc_text"),
        })

    return make_chunks(Q._clean_docs_ds(sf_dir).map_batches(as_doc, batch_format="pyarrow"))


def _q_kg_triples_norm(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    def round_conf(batch: pa.Table) -> pa.Table:
        # Match the DuckDB mirror's DOUBLE arithmetic: float32 pattern confs
        # like 0.9 are not exactly representable; round(·, 6) lands both
        # engines on the identical double.
        i = batch.schema.get_field_index("conf")
        return batch.set_column(i, "conf",
                                pc.round(pc.cast(batch.column("conf"), pa.float64()), 6))

    return _kg_result(sf_dir).triples_dedup.map_batches(round_conf, batch_format="pyarrow")


def _q_kg_entities(sf_dir: str):
    return _kg_result(sf_dir).entities


def _q_kg_entity_decisions(sf_dir: str):
    from ray.data.aggregate import Count
    return _kg_result(sf_dir).entities.groupby("decision").aggregate(
        Count(alias_name="n"))


def _q_kg_nodes(sf_dir: str):
    return _kg_result(sf_dir).nodes


def _q_kg_edges(sf_dir: str):
    return _kg_result(sf_dir).edges


def _q_kg_degree_topk(sf_dir: str):
    """Distributed two-sided degree count -> sort -> limit (the r1 version
    collected the full edge table to a driver dict — VERDICT #5)."""
    import pyarrow as pa
    from ontoray.stages.curation import _degree_table
    res = _kg_result(sf_dir)
    deg = _degree_table(res.edges, pa.array([], pa.string()))
    return deg.sort(["degree", "name"], descending=[True, False]).limit(25)


def _q_kg_assortativity(sf_dir: str):
    """Degree assortativity of the concept graph — exact integer moment
    partials over edge-endpoint degrees through grouped_corr, mirrored by
    the identical pinned float expression in SQL."""
    return Q.q_kg_assortativity_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_twohop(sf_dir: str):
    """Two-hop reach bands over the undirected concept graph — wedge join
    partitioned on the shared mid node, candidate pairs deduped two-phase
    before counting."""
    return Q.q_kg_twohop_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_jaccard(sf_dir: str):
    """Jaccard link prediction — hub-capped wedge expansion, full-degree
    union denominator, existing edges removed by partitioned anti-join."""
    return Q.q_kg_jaccard_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_closeness(sf_dir: str):
    """Bounded-horizon closeness centrality for the md5-chosen BFS seeds —
    a seed-vocabulary fold over the multi-source BFS distance table."""
    return Q.q_kg_closeness_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_degree_gini(sf_dir: str):
    """Gini coefficient of the concept-graph degree distribution — the
    grouped_gini exact closed form under one key."""
    return Q.q_kg_degree_gini_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_pagerank(sf_dir: str):
    """Concept-importance PageRank over the extracted triple graph —
    iterative distributed graph analytics in exact int64 fixed-point (the
    SQL mirror evaluates the identical recurrence, so this is hash-checked
    despite being a 5-round iterative algorithm)."""
    return Q.q_kg_pagerank_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_ppr(sf_dir: str):
    """Personalized PageRank restarting at the top-degree concept hubs —
    topic-conditioned importance, same exact int64 fixed-point recurrence
    family as kg_pagerank (hash-checked against the unrolled-CTE mirror)."""
    return Q.q_kg_ppr_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_components(sf_dir: str):
    """Connected components of the concept graph — iterative min-label
    propagation (driver union-find under 100k edges; hash_join+min rounds
    above), hash-checked against a recursive-CTE min-reachable mirror."""
    return Q.q_kg_components_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_taxonomy_depth(sf_dir: str):
    """Per-node depth in the extracted subclass taxonomy — join-BFS over
    the distributed min-parent forest vs a bounded recursive-CTE mirror."""
    return Q.q_kg_taxonomy_depth_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_hits(sf_dir: str):
    """Integer fixed-point HITS hubs/authorities (2 max-normalized rounds)
    — stages/analytics.hits_scores."""
    return Q.q_kg_hits_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_degree_dist(sf_dir: str):
    """Log2-band degree distribution of the curated edge table — the skew
    diagnostic (queries.q_kg_degree_dist_from)."""
    return Q.q_kg_degree_dist_from(_kg_result(sf_dir).edges)


def _q_kg_resource_alloc(sf_dir: str):
    """Resource-allocation link prediction over the extracted concept graph
    (hub-capped pair expansion, partitioned left-anti existing-edge removal —
    stages/analytics.resource_allocation)."""
    return Q.q_kg_resource_alloc_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_walks(sf_dir: str):
    """Deterministic DeepWalk-style walk sampling (md5 hop selection) over
    the undirected concept graph — stages/analytics.random_walks."""
    return Q.q_kg_walks_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_communities(sf_dir: str):
    """Deterministic synchronous label-propagation communities (3 rounds,
    min-label tie-break) — stages/analytics.label_propagation."""
    return Q.q_kg_communities_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_similar_nodes(sf_dir: str):
    """Graph-context entity-resolution candidates: shared-neighbor Jaccard
    pairs with a hub cap (documented partitioning contract in
    stages/analytics.similar_nodes)."""
    return Q.q_kg_similar_nodes_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_triangles(sf_dir: str):
    """Triangle census of the undirected concept graph (clustering signal):
    vocabulary-bounded broadcast adjacency, per-edge intersection counts."""
    return Q.q_kg_triangles_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_clustering(sf_dir: str):
    """Per-node local clustering coefficient (exact integer lcc_micro) —
    stages/analytics.clustering_coeff."""
    return Q.q_kg_clustering_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_bfs(sf_dir: str):
    """Multi-source BFS hop distances over the undirected concept graph
    (stages/analytics.multi_source_bfs)."""
    return Q.q_kg_bfs_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_conf_calibration(sf_dir: str):
    """Edge-confidence reliability profile of the deduped triple table
    (queries.q_kg_conf_calibration_from)."""
    return Q.q_kg_conf_calibration_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_coupling(sf_dir: str):
    """Bibliographic coupling (subject pairs sharing >=2 objects) over the
    deduped concept graph (queries.q_kg_coupling_from)."""
    return Q.q_kg_coupling_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_edge_reciprocity(sf_dir: str):
    """Directed-edge reciprocity of the deduped concept graph
    (queries.q_kg_edge_reciprocity_from)."""
    return Q.q_kg_edge_reciprocity_from(_kg_result(sf_dir).triples_dedup)


def _q_kg_kcore(sf_dir: str):
    """2-core of the concept graph — iterative peel to fixpoint with a
    convergence guard vs an unrolled-CTE mirror (stages/analytics.kcore)."""
    return Q.q_kg_kcore_from(_kg_result(sf_dir).triples_dedup)


def _q_text_langid(sf_dir: str):
    import ray.data as rd
    from ontoray.extras.textstats import LangId
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)


def _q_text_fingerprint(sf_dir: str):
    import ray.data as rd
    from ontoray.extras.textstats import fingerprint_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def _q_dedup_minhash(sf_dir: str):
    import ray.data as rd
    from ontoray.extras.dedup import minhash_dedup
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_dedup(ds, threshold=0.8)


def _q_dedup_jaccard(sf_dir: str):
    """Exact inverted-index n-gram Jaccard pairs (the no-false-negative
    complement to the MinHash-LSH path)."""
    import ray.data as rd
    from ontoray.extras.dedup import jaccard_pairs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return jaccard_pairs(ds, threshold=0.8)


def _q_dedup_clusters(sf_dir: str):
    """Near-dup pairs -> keep/drop clusters: distributed connected components
    (min-label propagation) over the exact Jaccard pair graph."""
    from ontoray.extras.dedup import neardup_clusters
    return neardup_clusters(_q_dedup_jaccard(sf_dir))


def _q_dedup_simhash(sf_dir: str):
    import ray.data as rd
    from ontoray.extras.dedup import simhash_batch
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


def _q_dedup_simhash_pairs(sf_dir: str):
    """Banded simhash near-dup pairs (exact for Hamming <= 3 by pigeonhole)."""
    import ray.data as rd
    from ontoray.extras.dedup import simhash_candidate_pairs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_candidate_pairs(ds, max_hamming=3)


def _q_embed_neardup(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd
    from ontoray.extras.dedup import embedding_neardup
    dim = Q._embedding_dim(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # threshold 0.45: the synthetic embeddings are near-orthogonal (max
    # off-diagonal cosine ~0.51 at sf0.01), so the old 0.9 returned zero rows
    # and the oracle check was vacuous; at 0.45 the seeded LSH finds 4 true
    # pairs at sf0.01 — a non-empty, non-trivial hash comparison.
    rows = embedding_neardup(ds, dim, threshold=0.45).take_all()
    # Near-dup pairs are a tiny result; collect so the schema is stable even
    # when every LSH bucket verifies to zero pairs (Ray drops empty blocks).
    return pa.table({
        "vec_a": pa.array([r["vec_a"] for r in rows], pa.int64()),
        "vec_b": pa.array([r["vec_b"] for r in rows], pa.int64()),
        "cosine": pa.array([r["cosine"] for r in rows], pa.float64()),
    })


def _q_embed_centroids(sf_dir: str):
    """Per-label embedding centroid (exact fixed-point vector aggregation —
    the k-means / class-prototype building block)."""
    import ray.data as rd
    from ontoray.extras.ann import grouped_centroids
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    return grouped_centroids(ds)


def _q_tfidf_top(sf_dir: str):
    """Per-doc top-3 tf-idf keywords (distributed df join, no vocab
    broadcast)."""
    import ray.data as rd
    from ontoray.extras.textstats import tfidf_top_terms
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=3)


_STRAT_RATES = {"en": 0.1, "de": 0.5, "zh": 0.25, "es": 1.0}  # fr -> default 0


def _q_docs_split(sf_dir: str):
    """Deterministic train/val/test assignment: split depends only on row
    identity (md5 of the id), so it is stable across runs, cluster sizes and
    incremental corpus growth — no shuffle, no RNG state."""
    import ray.data as rd
    from ontoray.extras.textstats import hash_split
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return hash_split(ds)


def _q_sample_stratified(sf_dir: str):
    """Deterministic per-language hash downsampling (reproducible across
    runs and cluster sizes — no RNG state, no shuffle)."""
    import ray.data as rd
    from ontoray.extras.textstats import stratified_sample
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return stratified_sample(ds, _STRAT_RATES)


_WSAMP_RATE = 2e-4  # ~1 at n_chars=5000: long docs near-certain, short ones rare


def _q_sample_weighted(sf_dir: str):
    """Deterministic length-weighted Poisson sampling: inclusion probability
    proportional to n_chars (unbiased token-mass sample, no shuffle)."""
    import ray.data as rd
    from ontoray.extras.textstats import weighted_sample
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    return weighted_sample(ds, _WSAMP_RATE)


def _q_sample_group_cap(sf_dir: str):
    """Deterministic domain-cap sampling: at most 3 docs per source, chosen
    by md5 rank (per-batch combiner bounds the exchange at n x groups x
    blocks rows)."""
    import ray.data as rd
    from ontoray.extras.textstats import per_group_cap
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return per_group_cap(ds, n=3, key_col="source", id_col="doc_id")


def _q_multimodal_image_features(sf_dir: str):
    """Binary-payload decode plumbing (deterministic fake decode): documents
    text bytes stand in for image payloads."""
    import pyarrow as pa
    import ray.data as rd
    from ontoray.extras.multimodal import decode_images

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([f"doc-{d}" for d in batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([t.encode() for t in batch.column("text").to_pylist()], pa.binary()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decode_images(ds.map_batches(to_payload, batch_format="pyarrow"), fake=True)


def _q_multimodal_resize_plan(sf_dir: str):
    """Decode -> bounded-max-dim resize plan (integer dim/byte math, exact
    SQL mirror) — the second stage of the image pipeline."""
    import pyarrow as pa
    import ray.data as rd
    from ontoray.extras.multimodal import decode_images, resize_images

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([f"doc-{d}" for d in batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([t.encode() for t in batch.column("text").to_pylist()], pa.binary()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    feats = decode_images(ds.map_batches(to_payload, batch_format="pyarrow"), fake=True)
    return resize_images(feats, target=256)


def _q_multimodal_pack(sf_dir: str):
    """Pixel-budget batch packing over the fake-decoded image dims — the
    LM pack_sequences distributed prefix-sum shape on the media table."""
    import pyarrow as pa
    import ray.data as rd
    from ontoray.extras.multimodal import decode_images, pack_media

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([f"doc-{d}" for d in batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([t.encode() for t in batch.column("text").to_pylist()], pa.binary()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    feats = decode_images(ds.map_batches(to_payload, batch_format="pyarrow"), fake=True)
    return pack_media(feats)


def _q_multimodal_audio_bands(sf_dir: str):
    """RMS tenth-band loudness histogram over the fake-decoded audio
    features — exact dyadic-float band arithmetic both sides."""
    import pyarrow as pa
    import ray.data as rd
    from ontoray.extras.multimodal import audio_rms_bands, decode_audio

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([f"doc-{d}" for d in batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([t.encode() for t in batch.column("text").to_pylist()], pa.binary()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return audio_rms_bands(decode_audio(
        ds.map_batches(to_payload, batch_format="pyarrow"), fake=True))


def _q_multimodal_audio_features(sf_dir: str):
    """Audio-clip feature plumbing (deterministic fake decode: fake 16 kHz
    PCM16 duration + md5-derived RMS/clipping), exactly SQL-mirrored."""
    import pyarrow as pa
    import ray.data as rd
    from ontoray.extras.multimodal import decode_audio

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([f"doc-{d}" for d in batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([t.encode() for t in batch.column("text").to_pylist()], pa.binary()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decode_audio(ds.map_batches(to_payload, batch_format="pyarrow"), fake=True)


def _q_multimodal_frame_sample(sf_dir: str):
    """Video frame-sampling fan-out (explode shape: payload row ->
    ceil(n_frames/stride) frame rows), deterministic container-parse stub."""
    import pyarrow as pa
    import ray.data as rd
    from ontoray.extras.multimodal import sample_frames

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([f"doc-{d}" for d in batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([t.encode() for t in batch.column("text").to_pylist()], pa.binary()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return sample_frames(ds.map_batches(to_payload, batch_format="pyarrow"), stride=10)


def _q_kg_summary(sf_dir: str):
    import pandas as pd
    from ontoray.stages.reporting import run_summary
    s = run_summary(_kg_result(sf_dir).entities)
    return pd.DataFrame([s])


def _q_review_queue(sf_dir: str):
    from ontoray.stages.reporting import review_queue
    return review_queue(_kg_result(sf_dir).entities)


def _q_confidence_topk(sf_dir: str):
    from ontoray.stages.reporting import confidence_topk
    return confidence_topk(_kg_result(sf_dir).entities, k=25)


def _q_mention_contexts(sf_dir: str):
    """J6 provenance join (mention ⋈ chunk) on a bounded sample."""
    from ontoray.stages.chunking import make_chunks
    from ontoray.stages.extraction import make_mentions
    from ontoray.stages.reporting import mention_contexts
    docs = Q._clean_docs_ds(sf_dir).limit(200)
    import pyarrow as pa

    def as_doc(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([str(d) for d in batch.column("doc_id").to_pylist()], pa.string()),
            "doc_text": batch.column("doc_text"),
        })

    doc_ds = docs.map_batches(as_doc, batch_format="pyarrow").materialize()
    chunks = make_chunks(doc_ds)
    mentions = make_mentions(chunks, Q.GAZETTEER, concurrency=2)
    return mention_contexts(mentions, chunks)


def _q_jsonld_export(sf_dir: str):
    """JSON-LD formatting as a map_batches stage over entities (the r1
    version collected all entities to the driver — VERDICT #5; entities are
    corpus-proportional, the formatter is per-row)."""
    import json

    import pyarrow as pa
    from ontoray.stages.export import entities_to_jsonld, sanitize_filename

    def fmt(batch: pa.Table) -> pa.Table:
        objs = entities_to_jsonld(batch.to_pylist())
        return pa.table({
            "name": pa.array([o["name"] for o in objs], pa.string()),
            "file": pa.array([sanitize_filename(o["name"]) + ".jsonld" for o in objs],
                             pa.string()),
            "jsonld": pa.array([json.dumps(o, sort_keys=True) for o in objs],
                               pa.string()),
        })

    return _kg_result(sf_dir).entities.map_batches(fmt, batch_format="pyarrow")


def _q_jsonld_validation(sf_dir: str):
    """Schema.org validation of the JSON-LD export, distributed (reference
    schema_org_validator analog)."""
    from ontoray.evaluation.validator import validate_jsonld_ds
    return validate_jsonld_ds(_q_jsonld_export(sf_dir))


def _q_saturation(sf_dir: str):
    """Mention extraction runs DISTRIBUTED (per-chunk mention lists emitted
    from map_batches); only the inherently sequential cumulative fold stays on
    the driver (reference A8 semantics) — VERDICT #5.  The shuffle is the
    md5-rank order (a pure per-row function, partitioning-independent), which
    makes the whole curve mirrorable in SQL and hash-checked by the driver."""
    import pandas as pd
    import pyarrow as pa
    from ontoray.evaluation.metrics import md5_shuffle_order, saturation_curve
    from ontoray.stages.chunking import make_chunks
    from ontoray.text.extract import extract_mentions

    def as_doc(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pa.array([str(x) for x in batch.column("doc_id").to_pylist()],
                            pa.string()),
            "doc_text": batch.column("doc_text"),
        })

    def mentions_per_chunk(batch: pa.Table) -> pa.Table:
        lists = [extract_mentions(t, Q.GAZETTEER)
                 for t in batch.column("chunk_text").to_pylist()]
        keys = [f"{u}:{c}" for u, c in zip(batch.column("url").to_pylist(),
                                           batch.column("chunk_id").to_pylist())]
        return pa.table({"key": pa.array(keys, pa.string()),
                         "mentions": pa.array(lists, pa.list_(pa.string()))})

    chunks = make_chunks(Q._clean_docs_ds(sf_dir).map_batches(as_doc, batch_format="pyarrow"))
    per_chunk = chunks.map_batches(mentions_per_chunk, batch_format="pyarrow")
    keys, chunk_mentions = [], []
    for b in per_chunk.iter_batches(batch_size=None, batch_format="pyarrow"):
        keys.extend(b.column("key").to_pylist())
        chunk_mentions.extend(b.column("mentions").to_pylist())
    curve = saturation_curve(chunk_mentions, batch_size=10,
                             order=md5_shuffle_order(keys, seed=42))
    return pd.DataFrame(curve, columns=["batch", "new_concepts", "total_seen"])


def _q_mention_sources(sf_dir: str):
    """Salted collect-distinct: per-mention sample of source docs (the
    explicitly-salted aggregation path for list-valued collectors)."""
    import pyarrow as pa
    from ontoray.stages.salted import collect_distinct_sample

    def as_kv(batch: pa.Table) -> pa.Table:
        return pa.table({
            "mention": batch.column("mention"),
            "doc": pa.array([str(d) for d in batch.column("doc_id").to_pylist()], pa.string()),
        })

    kv = Q.q_kg_mentions(sf_dir).map_batches(as_kv, batch_format="pyarrow")
    return collect_distinct_sample(kv, "mention", "doc", per_key_cap=5, salt_buckets=16)


def _q_docs_lm_score(sf_dir: str):
    """Per-doc fluency under the corpus bigram LM (two-pass: train counts,
    then a corpus-scale LEFT join of per-doc bigram multisets to the LM —
    exact int64 micro-probability arithmetic, hash-checked)."""
    import ray.data as rd
    from ontoray.extras.textstats import lm_score_docs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lm_score_docs(ds, min_count=3)


def _q_events_session(sf_dir: str):
    import ray.data as rd
    from ontoray.stages.events import session_windows
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return session_windows(ds, gap_s=1800)


# Every query name that has appeared in CORRECTNESS_r01..r04.json (all
# rows+schema+hash green — zero failures ever).  queries() rotates these to
# the BACK so the driver's 50-query budget always lands on never-checked
# entries first (re-rotated each round; VERDICT r4 "Next round" #1).
_DRIVER_CHECKED = frozenset({
    'ann_ivf', 'ann_lsh', 'ann_topk', 'ann_topk_multi',
    'cms_heavy_tokens', 'custs_inactive', 'custs_orders_outer', 'custs_returned',
    'custs_rfm', 'custs_skyline', 'dedup_clusters', 'dedup_exact',
    'dedup_jaccard', 'dedup_minhash', 'dedup_simhash', 'dedup_simhash_pairs',
    'doc_stats', 'docs_blocklist', 'docs_bm25', 'docs_boilerplate',
    'docs_ccnet', 'docs_decile', 'docs_decontaminate', 'docs_dsir',
    'docs_dup_spans', 'docs_lm_score', 'docs_mixture', 'docs_neardup_keep',
    'docs_novelty', 'docs_pack', 'docs_pii_redact', 'docs_postings',
    'docs_quality_logit', 'docs_readability', 'docs_repetition', 'docs_sample_k',
    'docs_scrub_spans', 'docs_split', 'docs_split_by_host', 'docs_topics',
    'docs_winnow', 'embed_centroids', 'embed_hardneg', 'embed_kmeans',
    'embed_knn', 'embed_neardup', 'embed_pq', 'embed_semdedup',
    'events_ab', 'events_asof', 'events_attribution', 'events_bursts',
    'events_cumsum', 'events_distinct_users', 'events_funnel', 'events_hll_window',
    'events_hopping', 'events_lag', 'events_mad', 'events_markov',
    'events_pivot', 'events_rank', 'events_retention', 'events_rolling',
    'events_seq', 'events_session', 'events_window', 'events_winsorized',
    'events_zscore', 'hll_tokens_by_source', 'host_stats', 'kg_chunks',
    'kg_clean_docs', 'kg_clustering', 'kg_communities', 'kg_components',
    'kg_confidence_topk', 'kg_cooc_pmi', 'kg_cooccurrence', 'kg_degree_dist',
    'kg_degree_topk', 'kg_edges', 'kg_entities', 'kg_entity_decisions',
    'kg_entity_density', 'kg_hits', 'kg_jsonld_export', 'kg_jsonld_validation',
    'kg_kcore', 'kg_mention_contexts', 'kg_mention_counts', 'kg_mention_sources',
    'kg_mentions', 'kg_nodes', 'kg_pagerank', 'kg_resource_alloc',
    'kg_review_queue', 'kg_saturation', 'kg_similar_nodes', 'kg_summary',
    'kg_taxonomy_depth', 'kg_triangles', 'kg_triples', 'kg_triples_norm',
    'kg_walks', 'lang_counts', 'lineitem_corr', 'lineitem_price_bands',
    'lineitem_pricing', 'lineitem_q14', 'lineitem_q6', 'lineitem_quantiles',
    'lineitem_quantiles_cont', 'lm_bigrams', 'lm_bpe', 'lm_collocations',
    'lm_renyi2', 'lm_vocab', 'multimodal_audio_features', 'multimodal_frame_sample',
    'multimodal_image_features', 'multimodal_resize_plan', 'nations_with_both', 'orders_anti_deleted',
    'orders_by_nation', 'orders_by_nation_skew', 'orders_by_region', 'orders_gini',
    'orders_late_ship', 'orders_monthly_ma', 'orders_q3', 'orders_revenue',
    'orders_rollup', 'orders_share', 'quality_filter', 'sample_group_cap',
    'sample_stratified', 'sample_weighted', 'text_fingerprint', 'text_langid',
    'text_rake', 'tfidf_top_terms', 'token_counts_by_source', 'top_parts_per_brand',
    'topk_parts', 'url_canonical', 'web_anchors', 'web_host_rank',
})


def queries() -> dict[str, Callable[[str], Any]]:
    """Query registry, ORDERED BY VERIFICATION NEED.

    The driver's correctness pass runs a bounded prefix (50 entries) of this
    dict, so the order is: every query NEVER seen by a CORRECTNESS_r* pass
    (in registration order = oldest promotion first), then the 148
    already-driver-verified queries for leftover-budget re-verification.
    All 260 entries are hash-green vs their DuckDB mirrors via the local
    gate (tools/check_entry.py — full log committed as CHECK_LOCAL_r5.json).
    """
    reg = _registry()
    ordered = {k: v for k, v in reg.items() if k not in _DRIVER_CHECKED}
    ordered.update({k: v for k, v in reg.items() if k in _DRIVER_CHECKED})
    return ordered


def _registry() -> dict[str, Callable[[str], Any]]:
    return {
        # The driver's r2 correctness pass stopped at EXACTLY the first 50
        # entries, so positions 1-50 are budgeted deliberately: the linker
        # family and the r1-stale KG mirrors lead (the round's headline
        # promotions from no_oracle), then everything the driver has never
        # hash-checked, oldest promotions first; session-new operators that
        # already passed the local check_entry gate at sf0.01 take the
        # remaining slots, spilling past 50 in decreasing-novelty order.
        # ---- tier A: promoted from no_oracle via the linker-family mirror
        #      (queries_linker.py) — never hash-checked by the driver ----
        "kg_entities": _q_kg_entities,
        "kg_entity_decisions": _q_kg_entity_decisions,
        "kg_nodes": _q_kg_nodes,
        "kg_edges": _q_kg_edges,
        "kg_degree_topk": _q_kg_degree_topk,
        "kg_summary": _q_kg_summary,
        # ---- tier B: mirrors added in r2/r3, last driver-seen rows-only in r1 ----
        "kg_mention_contexts": _q_mention_contexts,
        "kg_saturation": _q_saturation,
        "kg_mention_sources": _q_mention_sources,
        "events_session": _q_events_session,
        "kg_review_queue": _q_review_queue,
        "kg_confidence_topk": _q_confidence_topk,
        "kg_jsonld_export": _q_jsonld_export,
        "kg_jsonld_validation": _q_jsonld_validation,
        "docs_lm_score": _q_docs_lm_score,
        # ---- tier C: new in r3 (earlier session), never driver-checked ----
        "docs_dup_spans": Q.q_docs_dup_spans,
        "embed_semdedup": Q.q_embed_semdedup,
        "events_lag": Q.q_events_lag,
        "docs_bm25": Q.q_docs_bm25,
        "lm_collocations": Q.q_lm_collocations,
        "lineitem_corr": Q.q_lineitem_corr,
        "docs_scrub_spans": Q.q_docs_scrub_spans,
        "orders_anti_deleted": Q.q_orders_anti_deleted,
        "docs_pii_redact": Q.q_docs_pii_redact,
        "ann_lsh": Q.q_ann_lsh,
        "custs_orders_outer": Q.q_custs_orders_outer,
        "docs_dsir": Q.q_docs_dsir,
        # ---- tier D: never driver-checked (r1+r2 passes stopped short) ----
        "orders_by_region": Q.q_orders_by_region,
        "lineitem_pricing": Q.q_lineitem_pricing,
        "lineitem_quantiles": Q.q_lineitem_quantiles,
        "lineitem_quantiles_cont": Q.q_lineitem_quantiles_cont,
        "lineitem_price_bands": Q.q_lineitem_price_bands,
        "custs_inactive": Q.q_custs_inactive,
        "nations_with_both": Q.q_nations_with_both,
        "top_parts_per_brand": Q.q_top_parts_per_brand,
        "orders_by_nation_skew": Q.q_orders_by_nation_skew,
        "events_hopping": Q.q_events_hopping,
        "events_asof": Q.q_events_asof,
        "events_cumsum": Q.q_events_cumsum,
        "events_distinct_users": Q.q_events_distinct_users,
        "events_rolling": Q.q_events_rolling,
        "events_zscore": Q.q_events_zscore,
        "events_rank": Q.q_events_rank,
        "events_seq": Q.q_events_seq,
        "host_stats": Q.q_host_stats,
        "docs_blocklist": Q.q_docs_blocklist,
        "ann_ivf": Q.q_ann_ivf,
        # ---- tier E: new THIS session (all sf0.01-green via the local
        #      check_entry gate); top 3 inside the 50-window, rest spill ----
        "orders_revenue": Q.q_orders_revenue,
        "docs_neardup_keep": Q.q_docs_neardup_keep,
        "docs_mixture": Q.q_docs_mixture,
        # -------- position 51+ from here --------
        "lm_vocab": Q.q_lm_vocab,
        "events_pivot": Q.q_events_pivot,
        "docs_postings": Q.q_docs_postings,
        "events_funnel": Q.q_events_funnel,
        "events_retention": Q.q_events_retention,
        "orders_rollup": Q.q_orders_rollup,
        "docs_winnow": Q.q_docs_winnow,
        "kg_taxonomy_depth": _q_kg_taxonomy_depth,
        "web_anchors": Q.q_web_anchors,
        "docs_ccnet": Q.q_docs_ccnet,
        "docs_quality_logit": Q.q_docs_quality_logit,
        "kg_similar_nodes": _q_kg_similar_nodes,
        "docs_split_by_host": Q.q_docs_split_by_host,
        "embed_pq": Q.q_embed_pq,
        "events_hll_window": Q.q_events_hll_window,
        "custs_skyline": Q.q_custs_skyline,
        "orders_gini": Q.q_orders_gini,
        "events_winsorized": Q.q_events_winsorized,
        "docs_sample_k": Q.q_docs_sample_k,
        # ---- session-4 additions (locally gate-green, never driver-checked) ----
        "embed_knn": Q.q_embed_knn,
        "text_rake": Q.q_text_rake,
        "lm_renyi2": Q.q_lm_renyi2,
        "events_attribution": Q.q_events_attribution,
        "orders_share": Q.q_orders_share,
        "embed_hardneg": Q.q_embed_hardneg,
        "custs_rfm": Q.q_custs_rfm,
        "custs_returned": Q.q_custs_returned,
        "orders_monthly_ma": Q.q_orders_monthly_ma,
        "docs_topics": Q.q_docs_topics,
        "kg_walks": _q_kg_walks,
        "docs_novelty": Q.q_docs_novelty,
        "lineitem_q6": Q.q_lineitem_q6,
        "kg_degree_dist": _q_kg_degree_dist,
        "events_bursts": Q.q_events_bursts,
        "events_ab": Q.q_events_ab,
        "lm_bpe": Q.q_lm_bpe,
        "docs_readability": Q.q_docs_readability,
        "kg_resource_alloc": _q_kg_resource_alloc,
        "orders_q3": Q.q_orders_q3,
        "lineitem_q14": Q.q_lineitem_q14,
        "orders_late_ship": Q.q_orders_late_ship,
        "events_mad": Q.q_events_mad,
        "kg_communities": _q_kg_communities,
        "events_markov": Q.q_events_markov,
        "kg_cooc_pmi": Q.q_kg_cooc_pmi,
        "kg_entity_density": Q.q_kg_entity_density,
        "kg_hits": _q_kg_hits,
        # new this session (sf0.01-green via the local check_entry gate):
        "kg_clustering": _q_kg_clustering,
        "kg_kcore": _q_kg_kcore,
        "web_host_rank": Q.q_web_host_rank,
        "embed_pca1": Q.q_embed_pca1,
        "embed_outliers": Q.q_embed_outliers,
        "lm_bpe_encode": Q.q_lm_bpe_encode,
        "events_cusum": Q.q_events_cusum,
        "orders_bigqty": Q.q_orders_bigqty,
        "parts_supplier_cnt": Q.q_parts_supplier_cnt,
        "lineitem_disjunct_rev": Q.q_lineitem_disjunct_rev,
        "custs_above_avg_idle": Q.q_custs_above_avg_idle,
        "docs_span_dedup": Q.q_docs_span_dedup,
        "embed_dim_stats": Q.q_embed_dim_stats,
        "parts_min_supplier": Q.q_parts_min_supplier,
        "orders_nation_flows": Q.q_orders_nation_flows,
        "parts_value_share": Q.q_parts_value_share,
        "docs_snapshot_diff": Q.q_docs_snapshot_diff,
        "supplier_wait_blame": Q.q_supplier_wait_blame,
        "embed_whiten": Q.q_embed_whiten,
        "kg_bfs": _q_kg_bfs,
        "orders_cohort_ltv": Q.q_orders_cohort_ltv,
        "events_dau_mau": Q.q_events_dau_mau,
        "kg_conf_calibration": _q_kg_conf_calibration,
        "orders_priority_exists": Q.q_orders_priority_exists,
        "orders_local_revenue": Q.q_orders_local_revenue,
        "nation_market_share": Q.q_nation_market_share,
        "custs_order_histogram": Q.q_custs_order_histogram,
        "supplier_top_revenue": Q.q_supplier_top_revenue,
        "lineitem_small_qty": Q.q_lineitem_small_qty,
        "basket_brand_lift": Q.q_basket_brand_lift,
        "docs_lang_confusion": Q.q_docs_lang_confusion,
        "ann_recall_eval": Q.q_ann_recall_eval,
        "events_interarrival": Q.q_events_interarrival,
        "kg_edge_reciprocity": _q_kg_edge_reciprocity,
        "orders_open_by_month": Q.q_orders_open_by_month,
        "kg_coupling": _q_kg_coupling,
        "orders_reorder_interval": Q.q_orders_reorder_interval,
        "embed_cosine_hist": Q.q_embed_cosine_hist,
        "docs_wordlen_profile": Q.q_docs_wordlen_profile,
        "orders_yoy_growth": Q.q_orders_yoy_growth,
        "docs_dedup_survivorship": Q.q_docs_dedup_survivorship,
        "docs_source_overlap": Q.q_docs_source_overlap,
        "orders_lorenz": Q.q_orders_lorenz,
        "docs_heaps": Q.q_docs_heaps,
        "kg_assortativity": _q_kg_assortativity,
        "embed_mmr": Q.q_embed_mmr,
        "orders_streaks": Q.q_orders_streaks,
        "embed_quantize_error": Q.q_embed_quantize_error,
        "kg_twohop": _q_kg_twohop,
        "events_top_types_window": Q.q_events_top_types_window,
        "kg_jaccard": _q_kg_jaccard,
        "parts_abc": Q.q_parts_abc,
        "docs_hapax": Q.q_docs_hapax,
        "multimodal_phash_neardup": Q.q_multimodal_phash_neardup,
        "events_props_extract": Q.q_events_props_extract,
        "lm_zipf_coverage": Q.q_lm_zipf_coverage,
        "embed_norm_hist": Q.q_embed_norm_hist,
        "events_user_lifespan": Q.q_events_user_lifespan,
        "docs_ppjoin": Q.q_docs_ppjoin,
        "kg_closeness": _q_kg_closeness,
        "events_type_share_drift": Q.q_events_type_share_drift,
        "dedup_lsh_recall": Q.q_dedup_lsh_recall,
        "events_autocorr": Q.q_events_autocorr,
        "supplier_hhi": Q.q_supplier_hhi,
        "lineitem_expectations": Q.q_lineitem_expectations,
        "docs_table_profile": Q.q_docs_table_profile,
        "orders_key_uniqueness": Q.q_orders_key_uniqueness,
        "custs_decile_migration": Q.q_custs_decile_migration,
        "multimodal_pack": _q_multimodal_pack,
        "multimodal_audio_bands": _q_multimodal_audio_bands,
        "kg_degree_gini": _q_kg_degree_gini,
        "lm_bigram_acc": Q.q_lm_bigram_acc,
        "join_size_est": Q.q_join_size_est,
        "lineitem_shipdelay_quantiles": Q.q_lineitem_shipdelay_quantiles,
        "docs_vocab_drift": Q.q_docs_vocab_drift,
        "events_rolling_p90": Q.q_events_rolling_p90,
        "embed_knn_acc": Q.q_embed_knn_acc,
        "ann_rrf": Q.q_ann_rrf,
        "events_type_affinity": Q.q_events_type_affinity,
        "lineitem_density_check": Q.q_lineitem_density_check,
        "docs_fertility": Q.q_docs_fertility,
        "events_conversion_latency": Q.q_events_conversion_latency,
        "events_growth_accounting": Q.q_events_growth_accounting,
        "orders_nation_profit": Q.q_orders_nation_profit,
        "lineitem_flag_priority": Q.q_lineitem_flag_priority,
        "fk_integrity": Q.q_fk_integrity,
        "events_ewma": Q.q_events_ewma,
        "docs_textrank": Q.q_docs_textrank,
        "events_survival": Q.q_events_survival,
        "embed_rp": Q.q_embed_rp,
        "hll_set_ops": Q.q_hll_set_ops,
        "docs_cdc_merge": Q.q_docs_cdc_merge,
        "events_range_join": Q.q_events_range_join,
        "events_bounce": Q.q_events_bounce,
        "lm_kn_bigram": Q.q_lm_kn_bigram,
        "embed_ivfpq": Q.q_embed_ivfpq,
        "docs_containment": Q.q_docs_containment,
        "ann_filtered": Q.q_ann_filtered,
        "ann_refine": Q.q_ann_refine,
        "events_paths": Q.q_events_paths,
        "custs_favorite_brand": Q.q_custs_favorite_brand,
        "bloom_fpr_eval": Q.q_bloom_fpr_eval,
        "embed_coreset": Q.q_embed_coreset,
        "orders_trend": Q.q_orders_trend,
        "events_wau": Q.q_events_wau,
        "docs_weighted_jaccard": Q.q_docs_weighted_jaccard,
        "kg_ppr": _q_kg_ppr,
        "supplier_dominant_parts": Q.q_supplier_dominant_parts,
        "docs_kappa": Q.q_docs_kappa,
        "vocab_typo_pairs": Q.q_vocab_typo_pairs,
        "docs_snm_pairs": Q.q_docs_snm_pairs,
        "lineitem_zorder": Q.q_lineitem_zorder,
        "docs_source_lang_chi2": Q.q_docs_source_lang_chi2,
        "lineitem_benford": Q.q_lineitem_benford,
        "events_dow_hour": Q.q_events_dow_hour,
        # ---- tier F: hash-green in r1/r2 — re-verify with leftover budget ----
        # r1-green, unchecked r2:
        "events_window": Q.q_events_window,
        "quality_filter": Q.q_quality_filter,
        "orders_by_nation": Q.q_orders_by_nation,
        "topk_parts": Q.q_topk_parts,
        # r2-green KG pipeline operators (SURVEY §2.2/§2.5):
        "kg_clean_docs": Q.q_kg_clean_docs,
        "kg_mentions": Q.q_kg_mentions,
        "kg_mention_counts": Q.q_kg_mention_counts,
        "kg_cooccurrence": Q.q_kg_cooccurrence,
        "kg_triples": Q.q_kg_triples,
        "kg_chunks": _q_kg_chunks,
        "kg_triples_norm": _q_kg_triples_norm,
        "kg_pagerank": _q_kg_pagerank,
        "kg_components": _q_kg_components,
        "kg_triangles": _q_kg_triangles,
        # r2-green training-data extras:
        "doc_stats": Q.q_doc_stats,
        "token_counts_by_source": Q.q_token_counts_by_source,
        "lang_counts": Q.q_lang_counts,
        "dedup_exact": Q.q_dedup_exact,
        "url_canonical": Q.q_url_canonical,
        "hll_tokens_by_source": Q.q_hll_tokens_by_source,
        "cms_heavy_tokens": Q.q_cms_heavy_tokens,
        "embed_kmeans": Q.q_embed_kmeans,
        "lm_bigrams": Q.q_lm_bigrams,
        "docs_decontaminate": Q.q_docs_decontaminate,
        "docs_repetition": Q.q_docs_repetition,
        "docs_boilerplate": Q.q_docs_boilerplate,
        "docs_decile": Q.q_docs_decile,
        "docs_pack": Q.q_docs_pack,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_jaccard": _q_dedup_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_simhash_pairs": _q_dedup_simhash_pairs,
        "embed_neardup": _q_embed_neardup,
        "embed_centroids": _q_embed_centroids,
        "ann_topk": Q.q_ann_topk,
        "ann_topk_multi": Q.q_ann_topk_multi,
        "text_langid": _q_text_langid,
        "text_fingerprint": _q_text_fingerprint,
        "sample_stratified": _q_sample_stratified,
        "docs_split": _q_docs_split,
        "sample_weighted": _q_sample_weighted,
        "sample_group_cap": _q_sample_group_cap,
        "tfidf_top_terms": _q_tfidf_top,
        "multimodal_image_features": _q_multimodal_image_features,
        "multimodal_resize_plan": _q_multimodal_resize_plan,
        "multimodal_frame_sample": _q_multimodal_frame_sample,
        "multimodal_audio_features": _q_multimodal_audio_features,
    }


def oracle_sql() -> dict[str, str]:
    # sf-independent SQL strings; ann_topk needs the embedding dim, which is
    # identical across sf dirs (read once from sf0.01).
    from ontoray import queries_linker as QL
    return {
        "kg_entities": QL.SQL_KG_ENTITIES,
        "kg_entity_decisions": QL.SQL_KG_ENTITY_DECISIONS,
        "kg_nodes": QL.SQL_KG_NODES,
        "kg_edges": QL.SQL_KG_EDGES,
        "kg_degree_topk": QL.SQL_KG_DEGREE_TOPK,
        "kg_summary": QL.SQL_KG_SUMMARY,
        "kg_review_queue": QL.SQL_KG_REVIEW_QUEUE,
        "kg_confidence_topk": QL.SQL_KG_CONFIDENCE_TOPK,
        "kg_jsonld_export": QL.SQL_KG_JSONLD_EXPORT,
        "kg_jsonld_validation": QL.SQL_KG_JSONLD_VALIDATION,
        "kg_clean_docs": Q.SQL_KG_CLEAN_DOCS,
        "kg_mentions": Q.SQL_KG_MENTIONS,
        "kg_mention_counts": Q.SQL_KG_MENTION_COUNTS,
        "kg_cooccurrence": Q.SQL_KG_COOCCURRENCE,
        "kg_triples": Q.SQL_KG_TRIPLES,
        "kg_chunks": Q.SQL_KG_CHUNKS,
        "kg_triples_norm": Q.SQL_KG_TRIPLES_NORM,
        "kg_mention_sources": Q.SQL_KG_MENTION_SOURCES,
        "kg_mention_contexts": Q.SQL_KG_MENTION_CONTEXTS,
        "kg_saturation": Q.SQL_KG_SATURATION,
        "kg_pagerank": Q.sql_kg_pagerank(),
        "kg_components": Q.SQL_KG_COMPONENTS,
        "kg_taxonomy_depth": Q.SQL_KG_TAXONOMY_DEPTH,
        "web_anchors": Q.sql_web_anchors_q(),
        "docs_ccnet": Q.sql_docs_ccnet(),
        "docs_quality_logit": Q.sql_docs_quality_logit(),
        "kg_similar_nodes": Q.SQL_KG_SIMILAR_NODES,
        "docs_split_by_host": Q.sql_docs_split_by_host(),
        "embed_pq": Q.sql_embed_pq(),
        "events_hll_window": Q.sql_events_hll_window(),
        "custs_skyline": Q.SQL_CUSTS_SKYLINE,
        "orders_gini": Q.SQL_ORDERS_GINI,
        "events_winsorized": Q.sql_events_winsorized(),
        "docs_sample_k": Q.sql_docs_sample_k(),
        "events_mad": Q.sql_events_mad(),
        "kg_communities": Q.SQL_KG_COMMUNITIES,
        "events_markov": __import__("ontoray.stages.events",
                                    fromlist=["SQL_EVENTS_MARKOV"]).SQL_EVENTS_MARKOV,
        "kg_cooc_pmi": Q.sql_kg_cooc_pmi(),
        "kg_entity_density": Q.sql_kg_entity_density(),
        "kg_hits": Q.SQL_KG_HITS,
        "kg_clustering": Q.SQL_KG_CLUSTERING,
        "kg_kcore": Q.sql_kg_kcore(),
        "web_host_rank": Q.sql_web_host_rank(),
        "embed_pca1": Q.sql_embed_pca1(),
        "embed_outliers": Q.sql_embed_outliers(),
        "kg_triangles": Q.SQL_KG_TRIANGLES,
        "hll_tokens_by_source": Q.sql_hll_tokens_by_source(),
        "cms_heavy_tokens": Q.sql_cms_heavy_tokens(),
        "embed_kmeans": __import__("ontoray.extras.kmeans",
                                   fromlist=["sql_kmeans"]).sql_kmeans(),
        "lm_bigrams": Q.sql_lm_bigrams(),
        "docs_lm_score": __import__("ontoray.extras.textstats",
                                    fromlist=["sql_lm_score_docs"]).sql_lm_score_docs(3),
        "events_session": Q.SQL_EVENTS_SESSION,
        "text_langid": Q.SQL_TEXT_LANGID,
        "doc_stats": __import__("ontoray.extras.textstats", fromlist=["sql_doc_stats"]).sql_doc_stats(),
        "token_counts_by_source": Q.SQL_TOKEN_COUNTS,
        "lang_counts": Q.SQL_LANG_COUNTS,
        "dedup_exact": Q.SQL_DEDUP_EXACT,
        "url_canonical": Q.sql_url_canonical(),
        "docs_decontaminate": __import__("ontoray.extras.dedup", fromlist=["sql_decontaminate"]).sql_decontaminate(8),
        "docs_repetition": __import__("ontoray.extras.textstats", fromlist=["sql_repetition_stats"]).sql_repetition_stats(),
        "docs_boilerplate": Q.sql_docs_boilerplate(),
        "docs_decile": Q.sql_docs_decile(),
        "docs_pack": __import__("ontoray.extras.textstats", fromlist=["sql_pack_sequences"]).sql_pack_sequences(seq_len=512),
        "dedup_minhash": __import__("ontoray.extras.dedup", fromlist=["sql_minhash_pairs"]).sql_minhash_pairs(threshold=0.8),
        "dedup_jaccard": __import__("ontoray.extras.dedup", fromlist=["sql_jaccard_pairs"]).sql_jaccard_pairs(threshold=0.8),
        "dedup_clusters": __import__("ontoray.extras.dedup", fromlist=["sql_neardup_clusters"]).sql_neardup_clusters(
            __import__("ontoray.extras.dedup", fromlist=["sql_jaccard_pairs"]).sql_jaccard_pairs(threshold=0.8)),
        "dedup_simhash": __import__("ontoray.extras.dedup", fromlist=["sql_simhash"]).sql_simhash(),
        "dedup_simhash_pairs": __import__("ontoray.extras.dedup", fromlist=["sql_simhash_pairs"]).sql_simhash_pairs(),
        "embed_neardup": __import__("ontoray.extras.dedup", fromlist=["sql_embedding_neardup"]).sql_embedding_neardup(threshold=0.45),
        "text_fingerprint": __import__("ontoray.extras.textstats", fromlist=["sql_text_fingerprint"]).sql_text_fingerprint(),
        "multimodal_image_features": __import__("ontoray.extras.multimodal", fromlist=["sql_image_features"]).sql_image_features(),
        "multimodal_resize_plan": __import__("ontoray.extras.multimodal", fromlist=["sql_resize_plan"]).sql_resize_plan(),
        "multimodal_frame_sample": __import__("ontoray.extras.multimodal", fromlist=["sql_frame_sample"]).sql_frame_sample(),
        "multimodal_audio_features": __import__("ontoray.extras.multimodal", fromlist=["sql_audio_features"]).sql_audio_features(),
        "sample_stratified": __import__("ontoray.extras.textstats", fromlist=["sql_stratified_sample"]).sql_stratified_sample(_STRAT_RATES),
        "docs_split": __import__("ontoray.extras.textstats", fromlist=["sql_hash_split"]).sql_hash_split(),
        "sample_weighted": __import__("ontoray.extras.textstats", fromlist=["sql_weighted_sample"]).sql_weighted_sample(_WSAMP_RATE),
        "sample_group_cap": __import__("ontoray.extras.textstats", fromlist=["sql_per_group_cap"]).sql_per_group_cap(3),
        "tfidf_top_terms": __import__("ontoray.extras.textstats", fromlist=["sql_tfidf_top"]).sql_tfidf_top(k=3),
        "embed_centroids": __import__("ontoray.extras.ann", fromlist=["sql_grouped_centroids"]).sql_grouped_centroids(),
        "ann_topk": Q.sql_ann_topk("/root/testdata/sf0.01"),
        "ann_ivf": Q.sql_ann_ivf("/root/testdata/sf0.01"),
        "ann_topk_multi": Q.sql_ann_topk_multi("/root/testdata/sf0.01"),
        "events_window": Q.SQL_EVENTS_WINDOW,
        "events_hopping": Q.SQL_EVENTS_HOPPING,
        "events_asof": Q.SQL_EVENTS_ASOF,
        "quality_filter": Q.sql_quality_filter(),
        "orders_by_nation": Q.SQL_ORDERS_BY_NATION,
        "orders_by_nation_skew": Q.SQL_ORDERS_BY_NATION,
        "orders_by_region": Q.SQL_ORDERS_BY_REGION,
        "lineitem_pricing": Q.SQL_LINEITEM_PRICING,
        "lineitem_quantiles": Q.SQL_LINEITEM_QUANTILES,
        "lineitem_quantiles_cont": Q.SQL_LINEITEM_QUANTILES_CONT,
        "custs_inactive": Q.SQL_CUSTS_INACTIVE,
        "nations_with_both": Q.SQL_NATIONS_WITH_BOTH,
        "top_parts_per_brand": Q.SQL_TOP_PARTS_PER_BRAND,
        "topk_parts": Q.SQL_TOPK_PARTS,
        "events_cumsum": Q.SQL_EVENTS_CUMSUM,
        "docs_blocklist": Q.SQL_DOCS_BLOCKLIST,
        "events_distinct_users": Q.SQL_EVENTS_DISTINCT_USERS,
        "lineitem_price_bands": Q.SQL_LINEITEM_PRICE_BANDS,
        "events_rolling": Q.SQL_EVENTS_ROLLING,
        "events_zscore": __import__("ontoray.extras.quantiles", fromlist=["sql_grouped_zscore"]).sql_grouped_zscore(),
        "events_rank": __import__("ontoray.stages.events", fromlist=["SQL_EVENTS_RANK"]).SQL_EVENTS_RANK,
        "events_seq": __import__("ontoray.stages.events", fromlist=["SQL_EVENTS_SEQ"]).SQL_EVENTS_SEQ,
        "events_lag": __import__("ontoray.stages.events", fromlist=["SQL_EVENTS_LAG"]).SQL_EVENTS_LAG,
        "docs_dup_spans": __import__("ontoray.extras.dedup", fromlist=["sql_dup_spans"]).sql_dup_spans(),
        "docs_bm25": Q.sql_docs_bm25(),
        "lm_collocations": Q.sql_lm_collocations(),
        "lineitem_corr": Q.sql_lineitem_corr(),
        "docs_scrub_spans": Q.sql_docs_scrub_spans(),
        "orders_anti_deleted": Q.SQL_ORDERS_ANTI_DELETED,
        "docs_pii_redact": Q.sql_docs_pii_redact(),
        "ann_lsh": Q.sql_ann_lsh("/root/testdata/sf0.01"),
        "custs_orders_outer": Q.SQL_CUSTS_ORDERS_OUTER,
        "docs_dsir": Q.sql_docs_dsir(),
        "docs_mixture": Q.sql_docs_mixture(),
        "lm_vocab": Q.sql_lm_vocab(),
        "events_pivot": Q.sql_events_pivot(),
        "orders_revenue": Q.SQL_ORDERS_REVENUE,
        "docs_neardup_keep": Q.sql_docs_neardup_keep(),
        "docs_postings": Q.sql_docs_postings(),
        "events_funnel": Q.sql_events_funnel(),
        "events_retention": Q.sql_events_retention(),
        "orders_rollup": Q.SQL_ORDERS_ROLLUP,
        "docs_winnow": Q.sql_docs_winnow(),
        "embed_semdedup": __import__("ontoray.extras.semdedup", fromlist=["sql_semdedup"]).sql_semdedup(),
        "host_stats": Q.sql_host_stats(),
        "embed_knn": Q.sql_embed_knn(),
        "text_rake": Q.sql_text_rake(),
        "lm_renyi2": Q.sql_lm_renyi2(),
        "events_attribution": Q.sql_events_attribution(),
        "orders_share": Q.SQL_ORDERS_SHARE,
        "embed_hardneg": Q.sql_embed_hardneg(),
        "custs_rfm": Q.SQL_CUSTS_RFM,
        "custs_returned": Q.SQL_CUSTS_RETURNED,
        "orders_monthly_ma": Q.SQL_ORDERS_MONTHLY_MA,
        "docs_topics": Q.sql_docs_topics(),
        "kg_walks": Q.sql_kg_walks(),
        "docs_novelty": Q.sql_docs_novelty(),
        "lineitem_q6": Q.SQL_LINEITEM_Q6,
        "kg_degree_dist": QL.sql_linker_ctes() + Q.SQL_KG_DEGREE_DIST_TAIL,
        "events_bursts": __import__("ontoray.stages.events", fromlist=["SQL_EVENTS_BURSTS"]).SQL_EVENTS_BURSTS,
        "events_ab": __import__("ontoray.stages.events", fromlist=["SQL_EVENTS_AB"]).SQL_EVENTS_AB,
        "lm_bpe": Q.sql_lm_bpe(),
        "docs_readability": Q.sql_docs_readability(),
        "kg_resource_alloc": Q.SQL_KG_RESOURCE_ALLOC,
        "orders_q3": Q.SQL_ORDERS_Q3,
        "lineitem_q14": Q.SQL_LINEITEM_Q14,
        "orders_late_ship": Q.SQL_ORDERS_LATE_SHIP,
        "lm_bpe_encode": Q.sql_lm_bpe_encode(),
        "events_cusum": __import__(
            "ontoray.stages.events",
            fromlist=["SQL_EVENTS_CUSUM"]).SQL_EVENTS_CUSUM,
        "orders_bigqty": Q.SQL_ORDERS_BIGQTY,
        "parts_supplier_cnt": Q.SQL_PARTS_SUPPLIER_CNT,
        "lineitem_disjunct_rev": Q.SQL_LINEITEM_DISJUNCT_REV,
        "custs_above_avg_idle": Q.SQL_CUSTS_ABOVE_AVG_IDLE,
        "docs_span_dedup": Q.sql_docs_span_dedup(),
        "embed_dim_stats": Q.sql_embed_dim_stats(),
        "parts_min_supplier": Q.sql_parts_min_supplier(),
        "orders_nation_flows": Q.SQL_ORDERS_NATION_FLOWS,
        "parts_value_share": Q.SQL_PARTS_VALUE_SHARE,
        "docs_snapshot_diff": Q.SQL_DOCS_SNAPSHOT_DIFF,
        "supplier_wait_blame": Q.SQL_SUPPLIER_WAIT_BLAME,
        "embed_whiten": Q.sql_embed_whiten(),
        "kg_bfs": Q.SQL_KG_BFS,
        "orders_cohort_ltv": Q.SQL_ORDERS_COHORT_LTV,
        "events_dau_mau": Q.SQL_EVENTS_DAU_MAU,
        "kg_conf_calibration": Q.SQL_KG_CONF_CALIBRATION,
        "orders_priority_exists": Q.SQL_ORDERS_PRIORITY_EXISTS,
        "orders_local_revenue": Q.SQL_ORDERS_LOCAL_REVENUE,
        "nation_market_share": Q.SQL_NATION_MARKET_SHARE,
        "custs_order_histogram": Q.SQL_CUSTS_ORDER_HISTOGRAM,
        "supplier_top_revenue": Q.SQL_SUPPLIER_TOP_REVENUE,
        "lineitem_small_qty": Q.SQL_LINEITEM_SMALL_QTY,
        "basket_brand_lift": Q.SQL_BASKET_BRAND_LIFT,
        "docs_lang_confusion": Q.sql_docs_lang_confusion(),
        "ann_recall_eval": Q.sql_ann_recall_eval("/root/testdata/sf0.01"),
        "events_interarrival": Q.SQL_EVENTS_INTERARRIVAL,
        "kg_edge_reciprocity": Q.SQL_KG_EDGE_RECIPROCITY,
        "orders_open_by_month": Q.SQL_ORDERS_OPEN_BY_MONTH,
        "kg_coupling": Q.SQL_KG_COUPLING,
        "orders_reorder_interval": Q.SQL_ORDERS_REORDER_INTERVAL,
        "embed_cosine_hist": Q.SQL_EMBED_COSINE_HIST,
        "docs_wordlen_profile": Q.SQL_DOCS_WORDLEN_PROFILE,
        "orders_yoy_growth": Q.SQL_ORDERS_YOY_GROWTH,
        "docs_dedup_survivorship": Q.SQL_DOCS_DEDUP_SURVIVORSHIP,
        "docs_source_overlap": Q.SQL_DOCS_SOURCE_OVERLAP,
        "orders_lorenz": Q.SQL_ORDERS_LORENZ,
        "docs_heaps": Q.SQL_DOCS_HEAPS,
        "kg_assortativity": Q._sql_kg_assortativity(),
        "embed_mmr": Q.sql_embed_mmr("/root/testdata/sf0.01"),
        "orders_streaks": Q.SQL_ORDERS_STREAKS,
        "embed_quantize_error": Q.SQL_EMBED_QUANTIZE_ERROR,
        "kg_twohop": Q._sql_kg_twohop(),
        "events_top_types_window": Q.SQL_EVENTS_TOP_TYPES_WINDOW,
        "kg_jaccard": Q.SQL_KG_JACCARD,
        "parts_abc": Q.SQL_PARTS_ABC,
        "docs_hapax": Q.SQL_DOCS_HAPAX,
        "multimodal_phash_neardup": Q.sql_multimodal_phash_neardup(),
        "events_props_extract": Q.SQL_EVENTS_PROPS_EXTRACT,
        "lm_zipf_coverage": Q.SQL_LM_ZIPF_COVERAGE,
        "embed_norm_hist": Q.SQL_EMBED_NORM_HIST,
        "events_user_lifespan": Q.SQL_EVENTS_USER_LIFESPAN,
        "docs_ppjoin": Q.sql_docs_ppjoin(),
        "kg_closeness": Q.SQL_KG_CLOSENESS,
        "events_type_share_drift": Q.SQL_EVENTS_TYPE_SHARE_DRIFT,
        "dedup_lsh_recall": Q.sql_dedup_lsh_recall(),
        "events_autocorr": Q._sql_events_autocorr(),
        "supplier_hhi": Q.SQL_SUPPLIER_HHI,
        "lineitem_expectations": Q.SQL_LINEITEM_EXPECTATIONS,
        "docs_table_profile": Q.SQL_DOCS_TABLE_PROFILE,
        "orders_key_uniqueness": Q.SQL_ORDERS_KEY_UNIQUENESS,
        "custs_decile_migration": Q._sql_custs_decile_migration(),
        "multimodal_pack": __import__("ontoray.extras.multimodal", fromlist=["sql_pack_media"]).sql_pack_media(),
        "multimodal_audio_bands": __import__("ontoray.extras.multimodal", fromlist=["sql_audio_rms_bands"]).sql_audio_rms_bands(),
        "kg_degree_gini": Q._sql_kg_degree_gini(),
        "lm_bigram_acc": Q.SQL_LM_BIGRAM_ACC,
        "join_size_est": Q.sql_join_size_est(),
        "lineitem_shipdelay_quantiles": Q.SQL_LINEITEM_SHIPDELAY_QUANTILES,
        "docs_vocab_drift": Q.sql_docs_vocab_drift(),
        "events_rolling_p90": Q.SQL_EVENTS_ROLLING_P90,
        "embed_knn_acc": Q.sql_embed_knn_acc(),
        "ann_rrf": Q.sql_ann_rrf("/root/testdata/sf0.01"),
        "events_type_affinity": Q.SQL_EVENTS_TYPE_AFFINITY,
        "lineitem_density_check": Q.SQL_LINEITEM_DENSITY_CHECK,
        "docs_fertility": Q.SQL_DOCS_FERTILITY,
        "events_conversion_latency": Q.SQL_EVENTS_CONVERSION_LATENCY,
        "events_growth_accounting": Q.SQL_EVENTS_GROWTH_ACCOUNTING,
        "orders_nation_profit": Q.sql_orders_nation_profit(),
        "lineitem_flag_priority": Q.sql_lineitem_flag_priority(),
        "fk_integrity": Q.SQL_FK_INTEGRITY,
        "events_ewma": Q.SQL_EVENTS_EWMA,
        "docs_textrank": Q.sql_docs_textrank(),
        "events_survival": Q.SQL_EVENTS_SURVIVAL,
        "embed_rp": Q.sql_embed_rp(),
        "hll_set_ops": Q.sql_hll_set_ops(),
        "docs_cdc_merge": Q.SQL_DOCS_CDC_MERGE,
        "events_range_join": Q.sql_events_range_join(),
        "events_bounce": Q.sql_events_bounce(),
        "lm_kn_bigram": Q.sql_lm_kn_bigram(),
        "embed_ivfpq": Q.sql_embed_ivfpq("/root/testdata/sf0.01"),
        "docs_containment": __import__(
            "ontoray.extras.dedup",
            fromlist=["sql_containment_pairs"]).sql_containment_pairs(),
        "ann_filtered": Q.sql_ann_filtered("/root/testdata/sf0.01"),
        "ann_refine": Q.sql_ann_refine("/root/testdata/sf0.01"),
        "events_paths": Q.sql_events_paths(),
        "custs_favorite_brand": Q.sql_custs_favorite_brand(),
        "bloom_fpr_eval": Q.sql_bloom_fpr_eval(),
        "embed_coreset": Q.sql_embed_coreset(),
        "orders_trend": Q.sql_orders_trend(),
        "events_wau": Q.sql_events_wau(),
        "docs_weighted_jaccard": __import__(
            "ontoray.extras.dedup",
            fromlist=["sql_weighted_jaccard_pairs"]).sql_weighted_jaccard_pairs(),
        "kg_ppr": Q.sql_kg_ppr(),
        "supplier_dominant_parts": Q.sql_supplier_dominant_parts(),
        "docs_kappa": Q.sql_docs_kappa(),
        "vocab_typo_pairs": Q.sql_vocab_typo_pairs(),
        "docs_snm_pairs": __import__(
            "ontoray.extras.dedup",
            fromlist=["sql_snm_pairs"]).sql_snm_pairs(),
        "lineitem_zorder": Q.sql_lineitem_zorder(),
        "docs_source_lang_chi2": Q.sql_docs_source_lang_chi2(),
        "lineitem_benford": Q.sql_lineitem_benford(),
        "events_dow_hour": Q.sql_events_dow_hour(),
    }

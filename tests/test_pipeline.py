"""End-to-end engine-vs-oracle gates (FIXTURES.md §5 test matrix)."""

import pyarrow as pa
import pytest


def _triple_set(res):
    return {(r["subj_norm"], r["pred_norm"], r["obj_norm"])
            for r in res.triples_dedup.take_all()}


class TestByteIdentity:
    def test_clean_byte_identity(self, small_engine, small_oracle):
        eng = {r["url"]: r["doc_text"] for r in small_engine.docs.take_all()}
        ora = small_oracle["docs"]
        assert set(eng) == set(ora)
        mismatches = [u for u in eng if eng[u] != ora[u]]
        assert mismatches == []

    def test_empty_text_rows_derived_from_html(self, small_corpus, small_engine):
        # ~10% of fixture rows have text='' — they must still produce docs.
        empty_urls = {u for u, t, l in zip(small_corpus["url"].to_pylist(),
                                           small_corpus["text"].to_pylist(),
                                           small_corpus["lang"].to_pylist())
                      if t == "" and l == "en"}
        assert empty_urls, "fixture should contain empty-text en rows"
        eng = {r["url"] for r in small_engine.docs.take_all()}
        assert empty_urls <= eng

    def test_non_en_rows_excluded(self, small_corpus, small_engine):
        non_en = {u for u, l in zip(small_corpus["url"].to_pylist(),
                                    small_corpus["lang"].to_pylist()) if l != "en"}
        en = {u for u, l in zip(small_corpus["url"].to_pylist(),
                                small_corpus["lang"].to_pylist()) if l == "en"}
        eng = {r["url"] for r in small_engine.docs.take_all()}
        assert eng.isdisjoint(non_en - en)

    def test_url_dedup_first_wins(self, small_corpus, small_engine):
        urls = small_corpus["url"].to_pylist()
        assert len(urls) > len(set(urls)), "fixture should contain duplicate urls"
        eng_urls = [r["url"] for r in small_engine.docs.take_all()]
        assert len(eng_urls) == len(set(eng_urls))

    def test_distinct_mentions_manual_matches_stream(self, ray_session, small_engine):
        """distinct_mentions' manual-exchange default == the streaming
        hash_aggregate plan."""
        from ontoray.stages.linking import distinct_mentions
        key = lambda r: (r["mention"], r["n_mentions"])
        manual = sorted(map(key, distinct_mentions(
            small_engine.mentions).take_all()))
        stream = sorted(map(key, distinct_mentions(
            small_engine.mentions, use_manual_exchange=False).take_all()))
        assert manual and manual == stream

    def test_manual_exchange_matches_sort_shuffle(self, ray_session, small_corpus):
        """The two-wave manual hash exchange (_dups_dataset default) must
        equal the streaming repartition+groupby plan row-for-row."""
        import ray.data as rd

        from ontoray.stages.ingest import _dups_dataset, _keyed_metadata
        keyed = _keyed_metadata(rd.from_arrow(small_corpus))
        key = lambda r: (r["url"], r["v"])
        manual = sorted(map(key, _dups_dataset(keyed).take_all()))
        stream = sorted(map(key, _dups_dataset(
            keyed, use_manual_exchange=False).take_all()))
        assert manual and manual == stream

    def test_manual_exchange_primitive(self, ray_session):
        """Unit shape: partials combine, keys never split across buckets,
        empty blocks tolerated."""
        import pyarrow.compute as pc
        import ray.data as rd

        from ontoray.stages.exchange import manual_hash_exchange
        t = pa.table({"g": pa.array([f"k{i % 7}" for i in range(1000)]),
                      "x": pa.array(list(range(1000)), pa.int64())})
        mat = rd.from_arrow(t).repartition(9).materialize()

        def red(g: pa.Table) -> pa.Table:
            out = g.group_by(["g"]).aggregate([("x", "sum")])
            return out.rename_columns(["g", "sx"])

        rows = manual_hash_exchange(mat, ["g"], red, num_buckets=4).take_all()
        got = {r["g"]: r["sx"] for r in rows}
        want = {}
        for i in range(1000):
            want[f"k{i % 7}"] = want.get(f"k{i % 7}", 0) + i
        assert got == want
        assert len(rows) == 7          # one output row per key, no splits

    def test_dup_broadcast_auto_gate(self, ray_session, small_corpus, monkeypatch):
        """dup_broadcast_max=0 forces the shuffle fallback (the
        multi-snapshot-crawl regime — VERDICT r4 'what's wrong' #4): output
        identical to the default broadcast path, and no driver winner dicts
        are ever built (guarded)."""
        import ray.data as rd

        import ontoray.stages.ingest as ingest
        from ontoray.stages.ingest import extract_docs
        ds = rd.from_arrow(small_corpus)
        key = lambda r: (r["url"], r["doc_text"])
        default = sorted(map(key, extract_docs(ds).take_all()))

        def boom(*a, **k):
            raise AssertionError("driver winner-dict fold past the gate")

        monkeypatch.setattr(ingest, "_winners_from_dups", boom)
        gated = sorted(map(key, extract_docs(
            ds, dup_broadcast_max=0).take_all()))
        monkeypatch.undo()
        assert default and default == gated

    @pytest.mark.parametrize("strategy", ["broadcast_winners", "shuffle", "single_read"])
    def test_url_dedup_exact_duplicate_records(self, ray_session, strategy):
        """Byte-identical records (same url, same warc_ts, same bytes) tie on
        the order key; exactly ONE row must survive (ADVICE r1)."""
        import numpy as np
        import ray.data as rd
        from ontoray.stages.ingest import extract_docs
        from ontoray.text.clean import clean_text
        ts = np.array(["2024-01-01T00:00:00"] * 5 + ["2024-01-02T00:00:00"],
                      dtype="datetime64[us]")
        pages = pa.table({
            "url": pa.array(["http://a/x", "http://a/x", "http://a/x",
                             "http://b/y", "http://c/z", "http://a/x"], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array([b""] * 6, pa.binary()),
            "text": pa.array(["Same bytes here.", "Same bytes here.", "Same bytes here.",
                              "B doc.", "C doc.", "Later different row."], pa.string()),
            "lang": pa.array(["en"] * 6, pa.string()),
        })
        docs = extract_docs(rd.from_arrow(pages), dedup_strategy=strategy).take_all()
        by_url: dict = {}
        for r in docs:
            by_url.setdefault(r["url"], []).append(r["doc_text"])
        assert sorted(len(v) for v in by_url.values()) == [1, 1, 1], by_url
        # First-wins: the tied earliest records beat the later distinct row.
        assert by_url["http://a/x"] == [clean_text("Same bytes here.")]

    @pytest.mark.parametrize("strategy", ["broadcast_winners", "shuffle", "single_read"])
    def test_url_canonicalize_collapses_variants(self, ray_session, strategy):
        """With canonicalize=True, crawl variants of one page (tracking
        params, fragment, case, www, default port) dedup to ONE doc keyed by
        the canonical url; first-wins (min warc_ts) still decides content."""
        import numpy as np
        import ray.data as rd
        from ontoray.stages.ingest import extract_docs
        from ontoray.text.clean import clean_text
        ts = np.array(["2024-01-03T00:00:00", "2024-01-01T00:00:00",
                       "2024-01-02T00:00:00", "2024-01-01T00:00:00"],
                      dtype="datetime64[us]")
        pages = pa.table({
            "url": pa.array(["https://host.org/p?utm_source=mail",
                             "HTTPS://WWW.HOST.ORG:443/p#frag",
                             "https://host.org/p",
                             "https://other.org/q"], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array([b""] * 4, pa.binary()),
            "text": pa.array(["Late variant.", "Earliest capture.",
                              "Middle variant.", "Other page."], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
        })
        docs = extract_docs(rd.from_arrow(pages), dedup_strategy=strategy,
                            canonicalize=True).take_all()
        by_url = {r["url"]: r["doc_text"] for r in docs}
        assert len(docs) == 2 and set(by_url) == {"https://host.org/p",
                                                  "https://other.org/q"}
        assert by_url["https://host.org/p"] == clean_text("Earliest capture.")

    def test_url_canonicalize_checkpointed_resume(self, ray_session, tmp_path):
        """canonicalize_urls under the checkpointed per-partition docs stage:
        partition membership must hash the CANONICAL url (the output key), so
        a resumed run reproduces the fresh run byte-for-byte."""
        import numpy as np
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        n = 40
        ts = np.array(["2024-01-01T00:00:00"] * n, dtype="datetime64[us]")
        pages = pa.table({
            "url": pa.array([f"HTTPS://WWW.h{i % 7}.org/p{i}?utm_s=x"
                             for i in range(n)], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array([b""] * n, pa.binary()),
            "text": pa.array([f"The resistor r{i} is a part." for i in range(n)],
                             pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        })
        cfg_plain = PipelineConfig(canonicalize_urls=True)
        plain = sorted((r["url"], r["doc_text"]) for r in run_kg_pipeline(
            rd.from_arrow(pages), cfg=cfg_plain, curate_graph=False).docs.take_all())
        cfg_ckpt = PipelineConfig(canonicalize_urls=True,
                                  checkpoint_dir=str(tmp_path / "ck"),
                                  docs_partitions=4)
        first = run_kg_pipeline(rd.from_arrow(pages), cfg=cfg_ckpt,
                                curate_graph=False, fingerprint="t1")
        resumed = run_kg_pipeline(rd.from_arrow(pages), cfg=cfg_ckpt,
                                  curate_graph=False, fingerprint="t1")
        for res in (first, resumed):
            got = sorted((r["url"], r["doc_text"]) for r in res.docs.take_all())
            assert got == plain
        assert all(u.startswith("https://h") for u, _ in plain)  # canon applied


class TestTriples:
    def test_triples_pr(self, small_engine, small_oracle):
        eng = _triple_set(small_engine)
        ora = set(small_oracle["triples_dedup"])
        tp = len(eng & ora)
        precision = tp / len(eng) if eng else 0.0
        recall = tp / len(ora) if ora else 0.0
        assert precision >= 0.95 and recall >= 0.95, (precision, recall)
        # Identical rules should in fact give exact equality.
        assert eng == ora

    def test_triple_counts_match(self, small_engine, small_oracle):
        eng = {(r["subj_norm"], r["pred_norm"], r["obj_norm"]): r["n_obs"]
               for r in small_engine.triples_dedup.take_all()}
        ora = {k: v[1] for k, v in small_oracle["triples_dedup"].items()}
        assert eng == ora


class TestCanonicalization:
    def test_canonical_cardinality(self, small_engine, small_oracle):
        eng = {r["name"]: r for r in small_engine.entities.take_all()}
        ora = {e["name"]: e for e in small_oracle["entities"]}
        assert set(eng) == set(ora)
        for name in eng:
            assert eng[name]["decision"] == ora[name]["decision"], name
            assert eng[name]["n_mentions"] == ora[name]["n_mentions"], name
            assert eng[name]["parent_class"] == ora[name]["parent_class"], name

    def test_plural_maps_exact(self, small_engine):
        from ontoray.linking import MAP_EXACT
        ents = {r["name"]: r for r in small_engine.entities.take_all()}
        # The fixture emits "Many {E}s are used here" -> plural surface forms.
        plural = [n for n in ents if n in ("capacitors", "resistors", "antennas")]
        assert plural, "fixture should produce plural mentions"
        for n in plural:
            assert ents[n]["decision"] == MAP_EXACT, (n, ents[n])


class TestGraph:
    def test_nodes_edges_match_oracle(self, small_engine, small_oracle):
        eng_n = {r["name"] for r in small_engine.nodes.take_all()}
        assert eng_n == set(small_oracle["nodes"])
        eng_e = {(r["src"], r["rel"], r["dst"]) for r in small_engine.edges.take_all()}
        assert eng_e == set(small_oracle["edges"])

    def test_edges_sorted_and_deduped(self, small_engine):
        # Default sort_mode='partitioned': every output block is sorted in
        # place (deterministic, resumable); global totals stay deduped.
        import pyarrow.compute as pc
        blocks = list(small_engine.edges.iter_batches(batch_size=None,
                                                      batch_format="pyarrow"))
        for b in blocks:
            key = [(b.column("src")[i].as_py(), b.column("rel")[i].as_py(),
                    b.column("dst")[i].as_py()) for i in range(b.num_rows)]
            assert key == sorted(key)
        rows = [(r["src"], r["rel"], r["dst"]) for r in small_engine.edges.take_all()]
        assert len(rows) == len(set(rows))

    def test_edges_global_sort_mode(self, ray_session, small_corpus):
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        sub = small_corpus.slice(0, 200)
        res = run_kg_pipeline(rd.from_arrow(sub), cfg=PipelineConfig(sort_mode="global"),
                              curate_graph=False)
        rows = [(r["src"], r["rel"], r["dst"]) for r in res.edges.take_all()]
        assert rows == sorted(rows)
        assert len(rows) == len(set(rows))

    def test_build_nodes_matches_general_merge(self, ray_session, small_engine):
        """Shuffle-free distinct-input node build == the general A6
        MERGE-by-name aggregate over the same union."""
        import ray.data as rd
        from ontoray.aliases import build_alias_data
        from ontoray.stages.graph import (baseline_nodes_table, build_nodes,
                                          merge_nodes_by_name, tasks_to_nodes)
        alias = build_alias_data()
        fast = build_nodes(small_engine.entities, alias)
        learned = small_engine.entities.map_batches(tasks_to_nodes, batch_format="pyarrow")
        general = merge_nodes_by_name(
            learned.union(rd.from_arrow(baseline_nodes_table(alias))))
        key = lambda r: (r["name"], r["source"], r["status"], r["parent_class"],
                         r["n_mentions"])
        assert sorted(map(key, fast.take_all())) == sorted(map(key, general.take_all()))

    def test_cached_resolver_empty_map_passthrough(self, ray_session):
        """A corpus with triples but ZERO linked entities broadcasts an
        empty resolution map; the resolver must pass surfaces through
        unchanged instead of pc.take-ing index 0 from a zero-length value
        array (ADVICE r4 #1: ArrowIndexError)."""
        import pyarrow as pa
        import ray
        from ontoray.stages.graph import _RESOLVER_CACHE, _cached_resolver
        ref = ray.put((pa.array([], pa.string()), pa.array([], pa.string())))
        _RESOLVER_CACHE.clear()
        resolve = _cached_resolver(ref)
        col = pa.chunked_array([pa.array(["alpha", "beta"], pa.string())])
        out = resolve(col)
        assert out.to_pylist() == ["alpha", "beta"]

    def test_rel_types_sanitized(self, small_engine):
        import re
        for r in small_engine.edges.take_all():
            assert re.fullmatch(r"[A-Z0-9_]+", r["rel"]), r["rel"]

    def test_curation_removed_counts(self, small_engine, small_oracle):
        assert small_engine.stats["orphans_removed"] == small_oracle["removed"]["orphans_removed"]
        assert small_engine.stats["low_degree_removed"] == small_oracle["removed"]["low_degree_removed"]

    def test_fused_shuffle_matches_separate_paths(self, ray_session, small_engine):
        """fused_dedup_and_edges (one corpus-scale shuffle for BOTH outputs)
        == dedup_triples + build_edges run separately."""
        from ontoray.aliases import build_alias_data
        from ontoray.stages.extraction import dedup_triples
        from ontoray.stages.graph import build_edges, fused_dedup_and_edges
        alias = build_alias_data()
        td_f, ed_f = fused_dedup_and_edges(small_engine.triples,
                                           small_engine.entities, alias)
        td_s = dedup_triples(small_engine.triples)
        ed_s = build_edges(small_engine.entities, small_engine.triples, alias,
                           resolve_mode="broadcast")
        tkey = lambda r: (r["subj_norm"], r["pred_norm"], r["obj_norm"],
                          round(r["conf"], 6), r["n_obs"])
        assert sorted(map(tkey, td_f.take_all())) == sorted(map(tkey, td_s.take_all()))
        ekey = lambda r: (r["src"], r["rel"], r["dst"], r["taxonomic"],
                          round(r["confidence"], 6), r["n_obs"])
        assert sorted(map(ekey, ed_f.take_all())) == sorted(map(ekey, ed_s.take_all()))

    def test_curation_branches_equal(self, ray_session, small_corpus):
        """Driver-fold (small) and distributed (large) curation + stats
        branches produce identical curated graphs, counts and stats."""
        import ray.data as rd
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.stages.curation import curate, graph_stats
        res = run_kg_pipeline(rd.from_arrow(small_corpus.slice(0, 300)),
                              curate_graph=False)
        nodes = res.nodes.materialize()
        edges = res.edges.materialize()
        n1, e1, r1 = curate(nodes, edges, large_threshold=10**9)
        n2, e2, r2 = curate(nodes, edges, large_threshold=0)
        assert r1 == r2
        assert ({r["name"] for r in n1.take_all()} == {r["name"] for r in n2.take_all()})
        key = lambda r: (r["src"], r["rel"], r["dst"])
        assert sorted(map(key, e1.take_all())) == sorted(map(key, e2.take_all()))
        s1 = graph_stats(nodes, edges, large_threshold=10**9)
        s2 = graph_stats(nodes, edges, large_threshold=0)
        assert s1 == s2
        # MID branch (entity-scale driver folds + exchange degrees): forced
        # via large_threshold=0 with a huge mid trip-wire; outputs, removal
        # counts AND the fused stats must equal the small branch exactly.
        from ontoray.stages.curation import curate_and_stats
        ns, es, rs, ss = curate_and_stats(nodes, edges,
                                          large_threshold=10**9)
        nm, em, rm, sm = curate_and_stats(nodes, edges, large_threshold=0,
                                          mid_threshold=10**9)
        assert sm is not None and rs == rm
        assert ({r["name"] for r in ns.take_all()}
                == {r["name"] for r in nm.take_all()})
        assert sorted(map(key, es.take_all())) == sorted(map(key, em.take_all()))
        assert ss == sm

    def test_join_mode_matches_broadcast(self, ray_session, small_corpus):
        """Edge endpoint resolution: partitioned hash-join path == broadcast."""
        import ray.data as rd
        from ontoray.aliases import build_alias_data
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.stages.graph import build_edges
        sub = small_corpus.slice(0, 200)
        res = run_kg_pipeline(rd.from_arrow(sub), curate_graph=False)
        alias = build_alias_data()
        bc = build_edges(res.entities, res.triples_dedup, alias, resolve_mode="broadcast")
        jn = build_edges(res.entities, res.triples_dedup, alias, resolve_mode="join")
        bc_set = {(r["src"], r["rel"], r["dst"], r["n_obs"]) for r in bc.take_all()}
        jn_set = {(r["src"], r["rel"], r["dst"], r["n_obs"]) for r in jn.take_all()}
        assert bc_set == jn_set


class TestInvariance:
    def test_partition_invariance(self, ray_session, small_corpus, small_engine):
        """Same outputs at 1 input block vs 16 input blocks."""
        import ray.data as rd
        from ontoray.pipelines.kg import run_kg_pipeline
        many = rd.from_arrow(small_corpus).repartition(16)
        res16 = run_kg_pipeline(many, curate_graph=True)
        assert _triple_set(res16) == _triple_set(small_engine)
        e1 = {(r["src"], r["rel"], r["dst"]) for r in small_engine.edges.take_all()}
        e16 = {(r["src"], r["rel"], r["dst"]) for r in res16.edges.take_all()}
        assert e1 == e16

    def test_dedup_idempotent(self, ray_session, small_corpus, small_engine):
        """Running on pre-deduplicated input (unique urls) gives identical
        canonical outputs."""
        import pandas as pd
        import ray.data as rd
        from ontoray.pipelines.kg import run_kg_pipeline
        df = small_corpus.to_pandas()
        df = df.sort_values(["url", "warc_ts", "text"], kind="mergesort").drop_duplicates(
            "url", keep="first")
        res2 = run_kg_pipeline(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
                               curate_graph=True)
        assert _triple_set(res2) == _triple_set(small_engine)


class TestSkew:
    def test_hot_host_and_entity_present(self, small_corpus):
        from ontoray.pages import HOT_HOST
        hosts = [u.split("/")[2] for u in small_corpus["url"].to_pylist()]
        frac = sum(1 for h in hosts if h == HOT_HOST) / len(hosts)
        assert frac > 0.1, "hot host should dominate"

    def test_partial_agg_bounds_shuffle_rows(self, ray_session, small_corpus):
        """The per-batch combiner must collapse the hot mention before the
        shuffle: post-partial rows per key <= number of batches, not number
        of occurrences."""
        import ray.data as rd
        from ontoray.stages.chunking import make_chunks
        from ontoray.stages.extraction import make_mentions
        from ontoray.stages.ingest import extract_docs
        docs = extract_docs(rd.from_arrow(small_corpus)).repartition(8)
        mentions = make_mentions(make_chunks(docs), (), 2, 512)

        def partial(batch):
            g = batch.group_by(["mention"]).aggregate([("mention", "count")])
            return g.select(["mention", "mention_count"])
        partials = mentions.select_columns(["mention"]).map_batches(
            partial, batch_format="pyarrow").take_all()
        from collections import Counter
        per_key_rows = Counter(r["mention"] for r in partials)
        total_occurrences = sum(r["mention_count"] for r in partials
                                if r["mention"] == "capacitor")
        assert total_occurrences > 50, "hot entity should be frequent"
        assert per_key_rows["capacitor"] <= 40  # bounded by batch count


class TestResume:
    def test_checkpoint_resume_identical(self, ray_session, small_corpus, tmp_path):
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.state.checkpoint import CheckpointManager
        sub = small_corpus.slice(0, 300)
        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ck"))
        r1 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fpA")
        e1 = sorted((r["src"], r["rel"], r["dst"]) for r in r1.edges.take_all())

        # Simulate a crash after 'extraction': invalidate downstream stages.
        ck = CheckpointManager(cfg.checkpoint_dir)
        for stage in ("triples_dedup", "entities", "nodes", "edges",
                      "nodes_curated", "edges_curated"):
            ck.invalidate(stage)
        r2 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fpA")
        e2 = sorted((r["src"], r["rel"], r["dst"]) for r in r2.edges.take_all())
        assert e1 == e2

        # Manifests carry per-partition lineage.
        m = ck.manifest("extraction")
        assert m["fingerprint"] == "fpA"
        assert m["rows"] > 0 and m["n_partitions"] >= 1 and m["partitions"]

    def test_partition_level_resume(self, ray_session, small_corpus, tmp_path):
        """Kill-mid-stage resume recomputes ONLY the missing url-hash
        partitions (lineage in manifest.written_partitions) and reproduces
        byte-identical docs (north_rule per-partition lineage contract)."""
        import os
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.state.checkpoint import CheckpointManager
        sub = small_corpus.slice(0, 300)
        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpp"), docs_partitions=8)
        r1 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fp1")
        d1 = sorted((r["url"], r["doc_text"]) for r in r1.docs.take_all())
        ck = CheckpointManager(cfg.checkpoint_dir)
        m1 = ck.manifest("docs")
        assert m1["written_partitions"] == list(range(8))
        assert m1["resumed_partitions"] == []

        # Simulate a crash mid-docs: two partitions and the completion
        # markers vanish; downstream stages invalidated as usual.
        dd = os.path.join(cfg.checkpoint_dir, "docs")
        os.remove(os.path.join(dd, "_SUCCESS"))
        os.remove(os.path.join(dd, "manifest.json"))
        for p in (2, 5):
            os.remove(os.path.join(dd, "data", f"part-{p:05d}.parquet"))
            os.remove(os.path.join(dd, "parts_ok", f"part-{p:05d}._OK"))
        for s in ("extraction", "triples_dedup", "entities", "nodes", "edges",
                  "nodes_curated", "edges_curated"):
            ck.invalidate(s)

        r2 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fp1")
        m2 = ck.manifest("docs")
        assert m2["written_partitions"] == [2, 5]          # recompute scope
        assert m2["resumed_partitions"] == sorted(set(range(8)) - {2, 5})
        d2 = sorted((r["url"], r["doc_text"]) for r in r2.docs.take_all())
        assert d1 == d2

        # Extraction inherits the partition lineage: kill two of ITS
        # partitions; the rerun recomputes only those (reading only the
        # matching docs FILES) and the graph is identical.
        e1 = sorted((r["src"], r["rel"], r["dst"]) for r in r2.edges.take_all())
        ed = os.path.join(cfg.checkpoint_dir, "extraction")
        os.remove(os.path.join(ed, "_SUCCESS"))
        os.remove(os.path.join(ed, "manifest.json"))
        for p in (1, 6):
            os.remove(os.path.join(ed, "data", f"part-{p:05d}.parquet"))
            os.remove(os.path.join(ed, "parts_ok", f"part-{p:05d}._OK"))
        for s in ("triples_dedup", "entities", "nodes", "edges",
                  "nodes_curated", "edges_curated"):
            ck.invalidate(s)
        r3 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fp1")
        m3 = ck.manifest("extraction")
        assert m3["written_partitions"] == [1, 6]
        assert m3["resumed_partitions"] == sorted(set(range(8)) - {1, 6})
        e3 = sorted((r["src"], r["rel"], r["dst"]) for r in r3.edges.take_all())
        assert e1 == e3

        # The linker stage partitions on mention-hash: kill two of its
        # partitions; the rerun relinks ONLY those mention classes (the
        # distinct aggregation groups on the same key, so the restricted
        # input is exact) and the entity table is identical.
        ent1 = sorted(tuple(r[k] for k in ("name", "decision", "target",
                                           "n_mentions"))
                      for r in r3.entities.take_all())
        nd = os.path.join(cfg.checkpoint_dir, "entities")
        os.remove(os.path.join(nd, "_SUCCESS"))
        os.remove(os.path.join(nd, "manifest.json"))
        killed = []
        for p in (0, 3):
            f = os.path.join(nd, "data", f"part-{p:05d}.parquet")
            if os.path.exists(f):
                os.remove(f)
                os.remove(os.path.join(nd, "parts_ok", f"part-{p:05d}._OK"))
                killed.append(p)
        assert killed, "fixture should populate partitions 0 and 3"
        for s in ("nodes", "edges", "nodes_curated", "edges_curated"):
            ck.invalidate(s)
        r4 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fp1")
        m4 = ck.manifest("entities")
        assert m4["written_partitions"] == killed
        assert set(m4["resumed_partitions"]).isdisjoint(killed)
        ent4 = sorted(tuple(r[k] for k in ("name", "decision", "target",
                                           "n_mentions"))
                      for r in r4.entities.take_all())
        assert ent1 == ent4

        # A different fingerprint must NOT resume stale partitions.
        assert ck.begin_partitioned("docs", "fp-other") == set()

    def test_fingerprint_mismatch_recomputes(self, ray_session, small_corpus, tmp_path):
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.state.checkpoint import CheckpointManager
        sub = small_corpus.slice(0, 100)
        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ck2"))
        run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="v1")
        ck = CheckpointManager(cfg.checkpoint_dir)
        assert ck.is_complete("docs", "v1")
        assert not ck.is_complete("docs", "v2")


class TestEvalHarness:
    def test_metrics_math(self):
        from ontoray.evaluation.metrics import calculate_metrics
        m = calculate_metrics(8, 2, 4)
        assert m["precision"] == 0.8
        assert m["recall"] == round(8 / 12, 4)
        assert m["f1_score"] == round(2 * 0.8 * (8 / 12) / (0.8 + 8 / 12), 4)
        z = calculate_metrics(0, 0, 0)
        assert z["precision"] == 0.0 and z["recall"] == 0.0 and z["f1_score"] == 0.0

    def test_gold_eval_reconstruction(self):
        from ontoray.evaluation.metrics import evaluate_against_gold
        tasks = [{"name": "ChipAntenna", "parent_class": "Antenna",
                  "non_taxonomic_relations": [{"target": "Acme", "relation": "manufacturer"}]},
                 {"name": "Widget", "parent_class": "Thing"}]
        gold = {"concepts": ["chipantenna", "other"],
                "relations": [{"source": "chipantenna", "type": "subclass_of", "target": "antenna"},
                              {"source": "chipantenna", "type": "manufacturer", "target": "acme"}]}
        out = evaluate_against_gold(tasks, gold)
        assert out["concept_evaluation"]["TP"] == 1
        assert out["concept_evaluation"]["FP"] == 1
        assert out["concept_evaluation"]["FN"] == 1
        assert out["relation_evaluation"]["TP"] == 2
        assert out["relation_evaluation"]["FP"] == 1  # widget->thing
        assert out["relation_evaluation"]["FN"] == 0

    def test_pipeline_vs_fixture_gold(self, small_engine, small_oracle):
        """The engine's learned tasks hit the oracle-derived gold exactly."""
        from ontoray.evaluation.metrics import evaluate_against_gold
        from ontoray.linking import EXTEND, UNCERTAIN
        tasks = [r for r in small_engine.entities.take_all()
                 if r["decision"] in (EXTEND, UNCERTAIN)]
        gold_tasks = [e for e in small_oracle["entities"]
                      if e["decision"] in (EXTEND, UNCERTAIN)]
        gold = {"concepts": [t["name"] for t in gold_tasks],
                "relations": [{"source": t["name"], "type": "subclass_of",
                               "target": t["parent_class"]} for t in gold_tasks]}
        out = evaluate_against_gold(tasks, gold)
        assert out["concept_evaluation"]["f1_score"] == 1.0
        assert out["relation_evaluation"]["f1_score"] == 1.0

    def test_saturation_curve(self):
        from ontoray.evaluation.metrics import saturation_curve
        chunks = [["a", "b"], ["b", "c"], ["c"], ["d"]]
        curve = saturation_curve(chunks, batch_size=2, seed=1)
        assert curve[-1]["total_seen"] == 4
        assert sum(c["new_concepts"] for c in curve) == 4
        assert curve == saturation_curve(chunks, batch_size=2, seed=1)

    def test_md5_order_matches_duckdb_and_fold(self):
        """The md5-rank shuffle (the SQL-mirrorable order behind
        kg_saturation) must sort identically in Python and DuckDB, and the
        first-batch/min-rank fold must equal the sequential scan."""
        import duckdb
        from ontoray.evaluation.metrics import md5_shuffle_order, saturation_curve
        keys = [f"doc-{i}:{j}" for i in range(7) for j in range(3)]
        mentions = [[f"m{(i * 13) % 9}", f"m{(i * 5) % 6}"] for i in range(len(keys))]
        order = md5_shuffle_order(keys, seed=42)
        con = duckdb.connect()
        con.execute("CREATE TABLE t(k VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
        sql_order = [r[0] for r in con.execute(
            "SELECT k FROM t ORDER BY md5(k || ':42'), k").fetchall()]
        assert [keys[i] for i in order] == sql_order
        curve = saturation_curve(mentions, batch_size=4, order=order)
        # min-first-batch reconstruction (what the SQL mirror computes)
        first = {}
        for pos, i in enumerate(order):
            for m in mentions[i]:
                first.setdefault(m, pos // 4)
        for row in curve:
            assert row["new_concepts"] == sum(
                1 for b in first.values() if b == row["batch"])
        assert curve[-1]["total_seen"] == len(first)


class TestResumeRobustness:
    def test_missing_success_marker_forces_recompute(self, ray_session, small_corpus, tmp_path):
        """A stage dir without _SUCCESS (crash mid-write) must not be trusted."""
        import os
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.state.checkpoint import CheckpointManager
        sub = small_corpus.slice(0, 120)
        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckp"))
        r1 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="f1")
        e1 = sorted((r["src"], r["rel"], r["dst"]) for r in r1.edges.take_all())
        ck = CheckpointManager(cfg.checkpoint_dir)
        # Simulate crash: extraction written but _SUCCESS never landed.
        os.remove(os.path.join(cfg.checkpoint_dir, "extraction", "_SUCCESS"))
        assert not ck.is_complete("extraction", "f1")
        r2 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="f1")
        e2 = sorted((r["src"], r["rel"], r["dst"]) for r in r2.edges.take_all())
        assert e1 == e2
        assert ck.is_complete("extraction", "f1")   # rewritten atomically


class TestEdgesPartitionResume:
    def test_kill_mid_edges_recomputes_only_missing(self, ray_session, small_corpus, tmp_path):
        """Kill-mid-edges resume: only the unmarked src-hash partitions are
        rebuilt (manifest.written_partitions is the recompute scope) and the
        resumed edge table is identical."""
        import os
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.state.checkpoint import CheckpointManager
        sub = small_corpus.slice(0, 300)
        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "cke"), edge_partitions=8)
        r1 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fpe")
        e1 = sorted((r["src"], r["rel"], r["dst"], r["n_obs"])
                    for r in r1.edges.take_all())
        ck = CheckpointManager(cfg.checkpoint_dir)
        m1 = ck.manifest("edges")
        assert m1["resumed_partitions"] == []
        all_parts = set(m1["written_partitions"])
        assert len(all_parts) >= 4            # src hashes spread over partitions

        # Crash mid-edges: two partitions and the seal vanish; curated
        # downstream tables invalidated as usual.
        ed = os.path.join(cfg.checkpoint_dir, "edges")
        os.remove(os.path.join(ed, "_SUCCESS"))
        os.remove(os.path.join(ed, "manifest.json"))
        killed = sorted(all_parts)[:2]
        for p in killed:
            os.remove(os.path.join(ed, "data", f"part-{p:05d}.parquet"))
            os.remove(os.path.join(ed, "parts_ok", f"part-{p:05d}._OK"))
        for s in ("nodes_curated", "edges_curated"):
            ck.invalidate(s)

        r2 = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg, fingerprint="fpe")
        m2 = ck.manifest("edges")
        assert m2["written_partitions"] == killed          # recompute scope
        assert set(m2["resumed_partitions"]) == all_parts - set(killed)
        e2 = sorted((r["src"], r["rel"], r["dst"], r["n_obs"])
                    for r in r2.edges.take_all())
        assert e1 == e2

    def test_join_mode_partitioned_edges(self, ray_session, small_corpus, tmp_path):
        """The partitioned-join resolve path shares the same partitioned edge
        stage (fresh write + identical output to the broadcast path)."""
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.kg import run_kg_pipeline
        sub = small_corpus.slice(0, 200)
        cfg_b = PipelineConfig(checkpoint_dir=str(tmp_path / "ckb"),
                               resolve_mode="broadcast", edge_partitions=8)
        cfg_j = PipelineConfig(checkpoint_dir=str(tmp_path / "ckj"),
                               resolve_mode="join", edge_partitions=8)
        rb = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg_b, fingerprint="fb")
        rj = run_kg_pipeline(rd.from_arrow(sub), cfg=cfg_j, fingerprint="fj")
        eb = sorted((r["src"], r["rel"], r["dst"], r["n_obs"])
                    for r in rb.edges.take_all())
        ej = sorted((r["src"], r["rel"], r["dst"], r["n_obs"])
                    for r in rj.edges.take_all())
        assert eb == ej and len(eb) > 0


class TestIncrementalUpdate:
    def test_append_shard_equals_from_scratch(self, ray_session, small_corpus, tmp_path):
        """Append-only incremental update == from-scratch run on the full
        corpus, with docs/extraction recompute pruned to the appended urls'
        partitions (manifest lineage asserted)."""
        import ray.data as rd
        from ontoray.config import PipelineConfig
        from ontoray.pipelines.incremental import (affected_doc_partitions,
                                                   run_kg_incremental)
        from ontoray.pipelines.kg import run_kg_pipeline
        from ontoray.state.checkpoint import CheckpointManager

        base = small_corpus.slice(0, 260)
        shard = small_corpus.slice(260, 24)
        full = small_corpus.slice(0, 284)
        new_urls = [u for u in shard.column("url").to_pylist()]

        cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "cki"),
                             docs_partitions=16, linker_partitions=16,
                             edge_partitions=8)
        run_kg_pipeline(rd.from_arrow(base), cfg=cfg, fingerprint="v1")

        r_inc = run_kg_incremental(rd.from_arrow(full), new_urls, cfg,
                                   fingerprint="v2")

        # Recompute scope: exactly the appended urls' partitions.
        ck = CheckpointManager(cfg.checkpoint_dir)
        p_docs = affected_doc_partitions(new_urls, cfg.docs_partitions)
        m = ck.manifest("docs")
        assert m["fingerprint"] == "v2"
        assert m["written_partitions"] == p_docs
        assert len(p_docs) < cfg.docs_partitions     # real pruning happened
        assert ck.manifest("extraction")["written_partitions"] == p_docs
        me = ck.manifest("entities")
        # The affected-mention set is a conservative superset (every mention
        # in a changed extraction partition); on this dense fixture it can
        # cover all linker partitions — only the fingerprint is asserted.
        assert me["fingerprint"] == "v2"

        cfg2 = PipelineConfig(checkpoint_dir=str(tmp_path / "cks"),
                              docs_partitions=16, linker_partitions=16,
                              edge_partitions=8)
        r_ref = run_kg_pipeline(rd.from_arrow(full), cfg=cfg2, fingerprint="v2s")

        def edge_set(res):
            return sorted((r["src"], r["rel"], r["dst"], r["n_obs"])
                          for r in res.edges.take_all())

        def ent_set(res):
            return sorted((r["name"], r["n_mentions"], r["decision"])
                          for r in res.entities.take_all())

        assert sorted(r["url"] for r in r_inc.docs.take_all()) == \
               sorted(r["url"] for r in r_ref.docs.take_all())
        assert ent_set(r_inc) == ent_set(r_ref)
        assert edge_set(r_inc) == edge_set(r_ref)
        assert sorted(r["name"] for r in r_inc.nodes.take_all()) == \
               sorted(r["name"] for r in r_ref.nodes.take_all())


class TestLinkerTaskPath:
    def test_tasks_equal_actor_pool(self, ray_session, small_corpus):
        """Default stateless-task linker (warm workers, per-worker cached
        broadcast) == pinned actor-pool linker, row for row."""
        import ray.data as rd
        from ontoray.aliases import build_alias_data
        from ontoray.config import PipelineConfig
        from ontoray.stages.extraction import chunk_and_extract_batch, split_combined
        from ontoray.stages.ingest import extract_docs
        from ontoray.stages.linking import collect_props, link_entities
        from ontoray.aliases import gazetteer_phrases
        alias = build_alias_data()
        docs = extract_docs(rd.from_arrow(small_corpus.slice(0, 300)))
        combined = docs.map_batches(
            chunk_and_extract_batch,
            fn_kwargs=dict(gazetteer=gazetteer_phrases(alias),
                           chunk_size=1000, chunk_overlap=100),
            batch_format="pyarrow").materialize()
        mentions, triples = split_combined(combined)
        props = collect_props(triples)
        key = lambda r: tuple(sorted(r.items(), key=lambda kv: kv[0]))
        rows = {}
        for actors in (False, True):
            cfg = PipelineConfig(linker_actors=actors, linker_concurrency=2)
            ents = link_entities(mentions, alias, cfg, props)
            rows[actors] = sorted(key(r) for r in ents.take_all())
        assert rows[False] == rows[True] and rows[False]


class TestPropsGate:
    def test_broadcast_equals_join_path(self, ray_session, small_corpus):
        """gated_props broadcast dict == distributed join table, entity row
        for entity row (VERDICT r2 #3: the driver dict must have a wired,
        equality-tested scale path) — and the auto gate switches on size."""
        import ray.data as rd
        from ontoray.aliases import build_alias_data, gazetteer_phrases
        from ontoray.config import PipelineConfig
        from ontoray.stages.extraction import chunk_and_extract_batch, split_combined
        from ontoray.stages.ingest import extract_docs
        from ontoray.stages.linking import gated_props, link_entities
        alias = build_alias_data()
        docs = extract_docs(rd.from_arrow(small_corpus.slice(0, 300)))
        combined = docs.map_batches(
            chunk_and_extract_batch,
            fn_kwargs=dict(gazetteer=gazetteer_phrases(alias),
                           chunk_size=1000, chunk_overlap=100),
            batch_format="pyarrow").materialize()
        mentions, triples = split_combined(combined)

        props_dict, none_ds = gated_props(triples, mode="broadcast")
        assert none_ds is None and props_dict, "fixture must carry spec props"
        none_dict, props_ds = gated_props(triples, mode="join")
        assert none_dict is None and props_ds.count() == len(props_dict)
        # auto gate: tiny threshold forces the join path
        d0, ds0 = gated_props(triples, mode="auto", broadcast_max=1)
        assert d0 is None and ds0 is not None

        cfg = PipelineConfig(linker_concurrency=2)
        key = lambda r: tuple(sorted(r.items(), key=lambda kv: kv[0]))
        got = {}
        for label, props in (("dict", props_dict), ("ds", props_ds)):
            got[label] = sorted(key(r) for r in
                                link_entities(mentions, alias, cfg, props).take_all())
        assert got["dict"] == got["ds"] and got["dict"]


class TestDepthVectorized:
    def test_matches_chain_walk(self):
        """_max_depth_vectorized == min-parent dict + _depth_walk on
        adversarial graphs: cycles, multi-parent (min parent wins —
        deterministic across block orders), deep chains, chains past the
        depth cap, and the root-as-child fallback."""
        import random

        import numpy as np
        import pyarrow as pa
        from ontoray.stages.curation import _depth_walk, _max_depth_vectorized
        rng = random.Random(13)
        cases = []
        # random forests + cycles
        for trial in range(30):
            names = [f"n{i}" for i in range(40)] + ["Root"]
            edges = [(rng.choice(names), rng.choice(names)) for _ in range(60)]
            cases.append(edges)
        # deep chain exceeding the cap
        cases.append([(f"c{i+1}", f"c{i}") for i in range(20)] + [("c0", "Root")])
        # duplicate src rows (min parent wins)
        cases.append([("a", "Root"), ("a", "x"), ("b", "a"), ("b", "zz")])
        # root itself has a parent (exact-fallback branch)
        cases.append([("Root", "up"), ("a", "Root"), ("b", "a")])
        cases.append([])
        for edges in cases:
            src = pa.array([e[0] for e in edges], pa.string())
            dst = pa.array([e[1] for e in edges], pa.string())
            src_np = np.asarray([e[0] for e in edges], object)
            parent = {}
            for s, d in edges:
                if s not in parent or d < parent[s]:
                    parent[s] = d
            want = _depth_walk(parent, "Root", 12)
            got = _max_depth_vectorized(src, dst, "Root", 12)
            assert got == want, (edges, got, want)

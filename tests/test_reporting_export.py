"""Tests for export formatters, reporting ops, and windowed event aggregates."""

import numpy as np
import pyarrow as pa
import pytest


class TestExport:
    def test_schema_org_object_fallback(self):
        from ontoray.stages.export import schema_org_object
        o = schema_org_object("ChipAntenna")
        assert o["@type"] == "Product" and o["name"] == "ChipAntenna"
        assert o["additionalType"].endswith("/Antenna_(radio)")  # partial match on 'antenna'
        assert len(o["description"]) <= 200

    def test_product_ontology_unknown_concept(self):
        from ontoray.stages.export import product_ontology_uri
        assert product_ontology_uri("mystery part") == \
            "http://www.productontology.org/id/mystery_part"

    def test_enhance_promotes_context_and_lists(self):
        from ontoray.stages.export import enhance_schema_object, schema_org_object
        base = schema_org_object("Widget")
        o = enhance_schema_object(base, {"frequency": "2.4 GHz", "weight": "5g"},
                                  [{"relation": "hasPart", "target": "A"},
                                   {"relation": "hasPart", "target": "B"}])
        assert o["elec:frequency"] == "2.4 GHz"
        assert isinstance(o["@context"], dict) and "elec" in o["@context"]
        assert o["weight"] == "5g"          # non-elec prop stays unprefixed
        assert o["hasPart"] == ["A", "B"]   # scalar -> list promotion

    def test_sanitize_filename(self):
        from ontoray.stages.export import sanitize_filename
        assert sanitize_filename('a<b>:c/d\\e|f?g*h') == "a_b_c_d_e_f_g_h"
        assert len(sanitize_filename("x" * 200)) == 80

    def test_sanitize_owl_name(self):
        from ontoray.stages.export import sanitize_owl_name
        assert sanitize_owl_name("2.4 GHz antenna!") == "_2_4_GHz_antenna_"

    def test_infer_category(self):
        from ontoray.stages.export import infer_category
        assert infer_category("ceramic capacitor") == "Passive Components"
        assert infer_category("power transistor") == "Active Components"
        assert infer_category("sma connector") == "Interconnects"
        assert infer_category("gizmo") == "General Electronics"

    def test_write_graph_outputs(self, ray_session, small_engine, tmp_path):
        import json
        import os
        from ontoray.stages.export import write_graph_outputs
        out = write_graph_outputs(small_engine, str(tmp_path / "out"))
        for name in ("entities", "nodes", "edges", "triples_dedup"):
            assert os.listdir(tmp_path / "out" / name)
        with open(tmp_path / "out" / "summary.json") as f:
            assert json.load(f)["n_nodes"] == out["n_nodes"]


class TestReporting:
    def test_run_summary(self, ray_session, small_engine, small_oracle):
        from ontoray.linking import EXTEND, MAP_EXACT, MAP_SIMILAR, UNCERTAIN
        from ontoray.stages.reporting import run_summary
        s = run_summary(small_engine.entities)
        dec = [e["decision"] for e in small_oracle["entities"]]
        assert s["total_concepts_extracted"] == len(dec)
        assert s["concepts_mapped_to_existing"] == sum(d in (MAP_EXACT, MAP_SIMILAR) for d in dec)
        assert s["concepts_extending_ontology"] == sum(d == EXTEND for d in dec)
        assert s["concepts_requiring_review"] == sum(d == UNCERTAIN for d in dec)
        assert 0 <= s["automation_rate"] <= 100

    def test_review_queue_limit_and_status(self, ray_session, small_engine):
        from ontoray.stages.reporting import review_queue
        rows = review_queue(small_engine.entities, limit=5).take_all()
        assert len(rows) <= 5
        assert all(r["status"] == "review" for r in rows)
        assert [r["name"] for r in rows] == sorted(r["name"] for r in rows)

    def test_confidence_topk(self, ray_session, small_engine):
        from ontoray.stages.reporting import confidence_topk
        rows = confidence_topk(small_engine.entities, k=10).take_all()
        confs = [r["confidence"] for r in rows]
        assert confs == sorted(confs, reverse=True)
        assert len(rows) == 10

    def test_mention_contexts_join(self, ray_session):
        import ray.data as rd
        from ontoray.stages.reporting import mention_contexts
        mentions = rd.from_arrow(pa.table({
            "url": ["u1", "u1", "u2"], "chunk_id": pa.array([0, 1, 0], pa.int32()),
            "mention": ["a", "b", "c"]}))
        chunks = rd.from_arrow(pa.table({
            "url": ["u1", "u1", "u2"], "chunk_id": pa.array([0, 1, 0], pa.int32()),
            "chunk_text": ["t10", "t11", "t20"]}))
        rows = sorted((r["url"], r["chunk_id"], r["mention"], r["chunk_text"])
                      for r in mention_contexts(mentions, chunks, 4).take_all())
        assert rows == [("u1", 0, "a", "t10"), ("u1", 1, "b", "t11"), ("u2", 0, "c", "t20")]


class TestEvents:
    def test_tumbling_window_counts(self, ray_session):
        import ray.data as rd
        from ontoray.stages.events import tumbling_window
        base = np.datetime64("2025-01-01T00:00:00", "us")
        ts = [base, base + np.timedelta64(30, "m"), base + np.timedelta64(90, "m")]
        ds = rd.from_arrow(pa.table({
            "event_type": ["x", "x", "x"],
            "ts": pa.array(np.array(ts, dtype="datetime64[us]"), pa.timestamp("us")),
            "value": [1.0, 5.0, 2.0]}))
        rows = {r["window_id"]: r for r in tumbling_window(ds, 3600).take_all()}
        assert len(rows) == 2
        wins = sorted(rows)
        assert rows[wins[0]]["n_events"] == 2 and rows[wins[0]]["max_value"] == 5.0
        assert rows[wins[1]]["n_events"] == 1 and rows[wins[1]]["max_value"] == 2.0

    def test_session_windows_gap_split(self, ray_session):
        import ray.data as rd
        from ontoray.stages.events import session_windows
        base = np.datetime64("2025-01-01T00:00:00", "us")
        ts = [base, base + np.timedelta64(10, "m"), base + np.timedelta64(120, "m"),
              base + np.timedelta64(125, "m")]
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]"), pa.timestamp("us"))}))
        rows = sorted(session_windows(ds, gap_s=1800).take_all(),
                      key=lambda r: r["session_id"])
        assert len(rows) == 2
        assert rows[0]["n_events"] == 2 and rows[1]["n_events"] == 2

    def test_session_windows_null_keys_one_group(self, ray_session):
        """Null keys form ONE key group (matching the SQL mirror's
        PARTITION BY semantics), not one single-event session per null row
        (ADVICE r4 #2: NaN dictionary codes made every null row a new key)."""
        import ray.data as rd
        from ontoray.stages.events import session_windows
        base = np.datetime64("2025-01-01T00:00:00", "us")
        ts = [base, base + np.timedelta64(5, "m"), base + np.timedelta64(10, "m"),
              base + np.timedelta64(120, "m"), base + np.timedelta64(7, "m")]
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([None, None, None, None, "u1"], pa.string()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]"), pa.timestamp("us"))}))
        rows = session_windows(ds, gap_s=1800).take_all()
        null_rows = sorted((r for r in rows if r["user_id"] is None),
                           key=lambda r: r["session_id"])
        # nulls: 3 events within the gap + 1 after a >30min gap -> 2 sessions
        assert [r["n_events"] for r in null_rows] == [3, 1]
        u1 = [r for r in rows if r["user_id"] == "u1"]
        assert len(u1) == 1 and u1[0]["n_events"] == 1


class TestAsofJoin:
    def test_backward_inclusive_with_ties(self, ray_session):
        """Inclusive backward match, ties on ts broken by max event_id,
        unmatched lefts dropped, keys never cross."""
        import ray.data as rd
        from ontoray.stages.events import asof_join
        base = np.datetime64("2025-01-01T00:00:00", "us")

        def t(m):
            return base + np.timedelta64(m, "m")

        def mk(rows):
            return rd.from_arrow(pa.table({
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(np.array([r[2] for r in rows],
                                        dtype="datetime64[us]"), pa.timestamp("us")),
            }))

        # user 1: clicks at 0, 10, and TWO at minute 20 (ids 102, 103);
        # user 2: click at 50 only.
        right = mk([(100, 1, t(0)), (101, 1, t(10)), (102, 1, t(20)),
                    (103, 1, t(20)), (200, 2, t(50))])
        # lefts: before any click (dropped), exactly AT the tied ts
        # (inclusive, picks id 103), after (picks 103), user 2 before its
        # click (dropped), user 2 after (picks 200).
        left = mk([(1, 1, t(-5)), (2, 1, t(20)), (3, 1, t(45)),
                   (4, 2, t(40)), (5, 2, t(60))])
        got = {r["event_id"]: r for r in asof_join(left, right).take_all()}
        assert set(got) == {2, 3, 5}
        assert got[2]["match_id"] == 103 and got[2]["gap_us"] == 0
        assert got[3]["match_id"] == 103
        assert got[3]["gap_us"] == 25 * 60 * 1_000_000
        assert got[5]["match_id"] == 200 and got[5]["user_id"] == 2

    def test_matches_sql_mirror(self, ray_session, tmp_path):
        """Engine vs SQL_EVENTS_ASOF on a random events fixture."""
        import random

        import duckdb
        from ontoray.queries import SQL_EVENTS_ASOF, q_events_asof
        rng = random.Random(13)
        base = np.datetime64("2025-01-01T00:00:00", "us")
        n = 400
        tbl = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(
                [base + np.timedelta64(rng.randint(0, 10_000), "s")
                 for _ in range(n)], dtype="datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array([rng.randint(0, 8) for _ in range(n)], pa.int64()),
            "event_type": pa.array([rng.choice(["click", "purchase", "view"])
                                    for _ in range(n)], pa.string()),
            "value": pa.array([0.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })
        import pyarrow.parquet as pq
        pq.write_table(tbl, tmp_path / "events.parquet")
        eng = sorted(
            tuple(r[k] for k in ("event_id", "user_id", "ts_us", "match_id",
                                 "match_ts_us", "gap_us"))
            for r in q_events_asof(str(tmp_path)).take_all())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
        sql = sorted(tuple(r) for r in con.execute(SQL_EVENTS_ASOF).fetchall())
        assert eng == sql and len(eng) > 50


class TestHoppingWindow:
    def test_event_lands_in_every_covering_window(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from ontoray.stages.events import hopping_window
        base = np.datetime64("2024-01-01T10:30:00", "us")
        ds = rd.from_arrow(pa.table({
            "event_type": pa.array(["c", "c"], pa.string()),
            "ts": pa.array(np.array([base, base + np.timedelta64(20, "m")],
                                    dtype="datetime64[us]"), pa.timestamp("us")),
            "value": pa.array([1.0, 5.0], pa.float64()),
        }))
        rows = {r["window_id"]: r for r in hopping_window(
            ds, window_s=3600, slide_s=900).take_all()}
        # Each event belongs to exactly window/slide = 4 windows.
        total = sum(r["n_events"] for r in rows.values())
        assert total == 8
        # Overlap: windows covering both events see max 5.0 and n=2.
        both = [r for r in rows.values() if r["n_events"] == 2]
        assert both and all(r["max_value"] == 5.0 for r in both)


class TestConsistency:
    def test_owl_export_and_cycles(self, ray_session, small_engine):
        from ontoray.evaluation.consistency import (check_consistency, export_owl,
                                                    find_subclass_cycles)
        nodes = small_engine.nodes.take_all()
        edges = small_engine.edges.take_all()
        owl = export_owl(nodes, edges)
        assert owl.startswith("<?xml")
        assert "<owl:Class rdf:about=\"#Capacitor\">" in owl
        assert "rdfs:subClassOf" in owl
        assert find_subclass_cycles(edges) == []
        out = check_consistency(nodes, edges)
        assert out["structurally_consistent"] is True

    def test_cycle_detection(self):
        from ontoray.evaluation.consistency import find_subclass_cycles
        edges = [{"src": "a", "rel": "SUBCLASS_OF", "dst": "b"},
                 {"src": "b", "rel": "SUBCLASS_OF", "dst": "a"},
                 {"src": "c", "rel": "SUBCLASS_OF", "dst": "a"}]
        assert find_subclass_cycles(edges) == ["a", "b"]

    def test_cycle_through_second_parent(self):
        """Multi-parent hierarchy: a cycle via a NON-first parent edge must be
        found (a single-parent dict dropped it — ADVICE r1)."""
        from ontoray.evaluation.consistency import export_owl, find_subclass_cycles
        edges = [{"src": "a", "rel": "SUBCLASS_OF", "dst": "b"},
                 {"src": "a", "rel": "SUBCLASS_OF", "dst": "root"},
                 {"src": "b", "rel": "SUBCLASS_OF", "dst": "a"}]
        assert find_subclass_cycles(edges) == ["a", "b"]
        owl = export_owl([{"name": "a"}, {"name": "b"}, {"name": "root"}], edges)
        # One subClassOf axiom PER parent edge.
        assert owl.count('rdf:resource="#b"') == 1
        assert owl.count('rdf:resource="#root"') == 1


class TestSchemaValidator:
    def test_export_validates(self, ray_session, small_engine):
        """The pipeline's own JSON-LD export must validate (reference
        schema_org_validator analog)."""
        from ontoray.evaluation.validator import validate_objects
        from ontoray.stages.export import entities_to_jsonld
        objs = entities_to_jsonld(small_engine.entities.take_all())
        assert objs
        report = validate_objects(objs)
        assert report["total_objects"] == len(objs)
        assert report["valid_objects"] == len(objs), report["errors"][:3]
        assert report["validation_rate"] == 100.0

    def test_validator_catches_defects(self):
        from ontoray.evaluation.validator import validate_object, validate_objects
        bad = {"@context": "https://example.com/", "@type": "Product",
               "name": "", "description": None, "elec:weird": 1}
        r = validate_object(bad)
        assert not r["valid"]
        assert any("Missing required property 'name'" in e for e in r["errors"])
        assert any("non-standard @context" in w for w in r["warnings"])
        assert any("undefined namespace 'elec'" in w for w in r["warnings"])
        assert any("Empty values" in w for w in r["warnings"])
        good = {"@context": "https://schema.org/", "@type": "Product",
                "name": "Thing", "description": "d", "category": "c",
                "manufacturer": "m"}
        rep = validate_objects([good, bad])
        assert rep["valid_objects"] == 1 and rep["total_objects"] == 2
        assert rep["validation_rate"] == 50.0

    def test_distributed_matches_pure(self, ray_session, small_engine):
        import json
        import pyarrow as pa
        import ray.data as rd
        from ontoray.evaluation.validator import (validate_jsonld_ds,
                                                  validate_objects,
                                                  validation_report)
        from ontoray.stages.export import entities_to_jsonld
        objs = entities_to_jsonld(small_engine.entities.take_all())
        tbl = pa.table({"jsonld": pa.array([json.dumps(o, sort_keys=True) for o in objs],
                                           pa.string())})
        rep = validation_report(validate_jsonld_ds(rd.from_arrow(tbl).repartition(3)))
        pure = validate_objects(objs)
        assert rep["total_objects"] == pure["total_objects"]
        assert rep["valid_objects"] == pure["valid_objects"]
        assert rep["n_errors"] == len(pure["errors"])
        assert rep["n_warnings"] == len(pure["warnings"])
        assert rep["validation_rate"] == pure["validation_rate"]


class TestGraphCompare:
    def test_compare_vs_gold(self, ray_session, small_engine, small_oracle):
        """Structural comparison harness (reference evaluation/graph.py
        analog): engine graph vs the oracle graph as gold — exact overlap."""
        from ontoray.evaluation.graph_compare import compare_graph_datasets
        gold_nodes = set(small_oracle["nodes"])
        gold_edges = {(s, d) for s, _r, d in small_oracle["edges"]}
        rep = compare_graph_datasets(small_engine.nodes, small_engine.edges,
                                     gold_nodes, gold_edges)
        assert rep["generated_ontology"]["nodes"] == rep["gold_standard"]["nodes"]
        assert rep["node_overlap"]["f1"] == 1.0
        assert rep["edge_overlap"]["f1"] == 1.0
        assert 0 <= rep["generated_ontology"]["density"] <= 1

    def test_overlap_math(self):
        from ontoray.evaluation.graph_compare import compare_graphs
        rep = compare_graphs(
            gen_nodes={"A", "b", "x"}, gen_edges={("A", "b")},
            gold_nodes={"a", "B", "c"}, gold_edges={("a", "b"), ("b", "c")})
        assert rep["node_overlap"]["precision"] == round(2 / 3, 4)
        assert rep["node_overlap"]["recall"] == round(2 / 3, 4)
        # gen edge (a,b) valid in gold too -> tp=1
        assert rep["edge_overlap"]["precision"] == 1.0
        assert rep["edge_overlap"]["recall"] == 0.5


class TestQuerySuite:
    def test_suite_on_engine_graph(self, ray_session, small_engine):
        """Reference multi_db_evaluator analog: every functional check runs
        without error on the materialized graph and the hierarchy checks
        return results."""
        from ontoray.evaluation.query_suite import run_query_suite
        s = run_query_suite(small_engine.nodes, small_engine.edges)
        assert s["errors"] == 0
        assert s["success_rate"] == 100.0
        assert s["results"]["count_nodes"] > 0
        assert s["results"]["subclass_edges"] > 0
        assert s["results"]["children_of_root"] > 0
        assert s["resultful_rate"] >= 50.0

    def test_error_and_empty_accounting(self, ray_session, small_engine):
        from ontoray.evaluation.query_suite import run_query_suite

        def boom(n, e):
            raise RuntimeError("nope")

        s = run_query_suite(small_engine.nodes, small_engine.edges,
                            suite=[("ok", lambda n, e: n.count()),
                                   ("empty", lambda n, e: 0),
                                   ("err", boom)])
        assert s["successful"] == 1 and s["empty_result"] == 1 and s["errors"] == 1
        assert round(s["success_rate"], 2) == round(200 / 3, 2)
        assert round(s["resultful_rate"], 2) == round(100 / 3, 2)


class TestDistributedReachability:
    def test_matches_driver_bfs(self, ray_session, small_engine):
        from ontoray.stages.curation import _reachable_names, reachable_distributed
        from ontoray.util import column_lists
        sp = column_lists(small_engine.edges.filter(expr="rel == 'SUBCLASS_OF'"),
                          ["src", "dst"])
        expect = _reachable_names(list(zip(sp["src"], sp["dst"])), "ElectronicComponent")
        got_ds = reachable_distributed(small_engine.edges, "ElectronicComponent")
        got = {r["name"] for r in got_ds.take_all()}
        assert got == expect


class TestReviewDeltas:
    def test_reject_roundtrip_excludes_node(self, ray_session, small_engine, tmp_path):
        """C3: reject -> delta table -> rebuild -> node (and its edges) gone;
        accept -> status flips to 'accepted'; last decision per name wins;
        deltas persist through save/load."""
        from ontoray.aliases import build_alias_data
        from ontoray.stages.review import (apply_reviews, load_deltas,
                                           make_deltas, rebuild_with_reviews,
                                           save_deltas)
        ents = small_engine.entities
        review_rows = [r for r in ents.take_all() if r["status"] == "review"]
        assert len(review_rows) >= 2, "fixture must produce review entities"
        reject_name = review_rows[0]["name"]
        accept_name = review_rows[1]["name"]

        # flip-flop on the reject target: last decision (reject) wins
        deltas = make_deltas([(reject_name, "accept"), (accept_name, "accept"),
                              (reject_name, "reject")])
        path = str(tmp_path / "reviews.parquet")
        save_deltas(deltas, path)
        loaded = load_deltas(path)
        assert loaded.num_rows == 3

        reviewed = apply_reviews(ents, loaded)
        rows = {r["name"]: r for r in reviewed.take_all()}
        assert reject_name not in rows
        assert rows[accept_name]["status"] == "accepted"
        assert len(rows) == ents.count() - 1

        alias = build_alias_data()
        nodes, edges, removed = rebuild_with_reviews(
            ents, alias, loaded, triples_dedup_ds=small_engine.triples_dedup)
        node_names = {r["name"] for r in nodes.take_all()}
        assert reject_name not in node_names
        for r in edges.take_all():
            assert reject_name not in (r["src"], r["dst"])

    def test_append_only_persistence(self, tmp_path):
        from ontoray.stages.review import load_deltas, make_deltas, save_deltas
        path = str(tmp_path / "d.parquet")
        save_deltas(make_deltas([("a", "reject")]), path)
        save_deltas(make_deltas([("a", "accept")], start_seq=1), path)
        t = load_deltas(path)
        assert t.num_rows == 2
        from ontoray.stages.review import _last_wins
        rej, acc = _last_wins(t)
        assert rej.to_pylist() == [] and acc.to_pylist() == ["a"]


class TestPointerDoubling:
    """VERDICT r3 #3: log-round reachability / depth walk must stay exact —
    deep chains crossing power-of-two boundaries, cycles, multi-parent DAGs,
    and the growth-cap fallback all checked against the driver BFS."""

    @staticmethod
    def _edges_ds(pairs):
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "src": pa.array([p[0] for p in pairs], pa.string()),
            "rel": pa.array(["SUBCLASS_OF"] * len(pairs), pa.string()),
            "dst": pa.array([p[1] for p in pairs], pa.string())}))

    def _check(self, pairs, root="R", max_depth=12, **kw):
        from ontoray.stages.curation import (_reachable_names,
                                             reachable_distributed)
        want = _reachable_names(pairs, root, max_depth)
        ds = reachable_distributed(self._edges_ds(pairs), root,
                                   max_depth=max_depth, **kw)
        got = {r["name"] for r in ds.take_all()}
        assert got == want, (sorted(got), sorted(want))

    def test_chain_lengths_across_power_boundaries(self, ray_session):
        # chains of length 1..15 under max_depth=12: nodes 13..15 excluded
        for n in (1, 2, 3, 4, 7, 8, 9, 12, 13, 15):
            chain = [(f"c{i+1}", f"c{i}" if i else "R") for i in range(n)]
            self._check(chain)

    def test_cycle_and_multiparent(self, ray_session):
        pairs = [("a", "R"), ("b", "a"), ("b", "z"),   # multi-parent b
                 ("x", "y"), ("y", "x"),               # unreachable cycle
                 ("c", "b"), ("R", "c")]               # cycle through root
        self._check(pairs)

    def test_forced_fallback_matches(self, ray_session):
        # growth_cap=0 forces the legacy frontier BFS — same answer
        chain = [(f"c{i+1}", f"c{i}" if i else "R") for i in range(9)]
        chain += [("c3", "R"), ("q", "c9")]
        self._check(chain, growth_cap=0)

    def test_depth_walk_doubling(self, ray_session):
        from ontoray.stages.curation import _max_depth_distributed
        # chain of length n from Root: depth = min(n, max_depth+1)
        for n in (1, 3, 8, 12, 13, 14, 16):
            pairs = [(f"c{i+1}", f"c{i}" if i else "Root")
                     for i in range(n)]
            got = _max_depth_distributed(self._edges_ds(pairs), "Root", 12)
            assert got == min(n, 13), (n, got)
        # cycle not reaching root contributes nothing
        pairs = [("a", "Root"), ("x", "y"), ("y", "x")]
        assert _max_depth_distributed(self._edges_ds(pairs), "Root", 12) == 1
        # empty forest
        assert _max_depth_distributed(self._edges_ds([]), "Root", 12) == 0

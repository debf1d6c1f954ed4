"""Session-4 additions: k-NN graph, RAKE keywords, Renyi-2 concentration,
last-touch attribution.  Each test checks semantics on a hand-built fixture
AND bit-parity with the DuckDB mirror."""

import duckdb
import numpy as np
import pyarrow as pa


class TestKnnGraph:
    def _embeddings(self) -> pa.Table:
        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((30, 6))
        vecs[11] = 3.0 * vecs[4]          # exact scaled copy: cosine == 1
        return pa.table({
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })

    def test_semantics_and_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.ann import knn_graph, sql_knn_graph
        tbl = self._embeddings()
        k = 4
        got = knn_graph(rd.from_arrow(tbl).repartition(3), k=k).take_all()
        by_src = {}
        for r in got:
            by_src.setdefault(r["vec_id"], []).append(r)
        # every vector has exactly k neighbors, none of them itself
        assert set(by_src) == set(range(30))
        for v, rows in by_src.items():
            assert len(rows) == k
            assert all(r["nbr_id"] != v for r in rows)
        # the exact scaled copy is vec 4's top neighbor at cosine 1.0
        top11 = max(by_src[4], key=lambda r: (r["cosine"], -r["nbr_id"]))
        assert top11["nbr_id"] == 11 and top11["cosine"] == 1.0
        # mirror parity (order-insensitive row set)
        con = duckdb.connect()
        con.register("embeddings", tbl)
        sql_rows = con.execute(sql_knn_graph(k=k)).fetchall()
        eng = {(r["vec_id"], r["nbr_id"], r["cosine"]) for r in got}
        assert eng == set(sql_rows)

    def test_boundary_tie_resolution(self, ray_session):
        """Three identical neighbors at the k-cut: the lower nbr_id wins,
        matching the mirror's (cosine DESC, nbr_id) comparator."""
        import ray.data as rd
        from ontoray.extras.ann import knn_graph, sql_knn_graph
        base = [1.0, 0.0]
        tbl = pa.table({
            "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "embedding": pa.array(
                [base, base, base, base, [0.0, 1.0]],
                pa.list_(pa.float32())),
        })
        got = knn_graph(rd.from_arrow(tbl), k=2).take_all()
        mine = sorted((r["nbr_id"]) for r in got if r["vec_id"] == 0)
        assert mine == [1, 2]             # ids 1,2,3 tie at cosine 1 -> 1,2 win
        con = duckdb.connect()
        con.register("embeddings", tbl)
        sql_rows = con.execute(sql_knn_graph(k=2)).fetchall()
        assert {(r["vec_id"], r["nbr_id"], r["cosine"]) for r in got} \
            == set(sql_rows)


class TestRake:
    def _docs(self) -> pa.Table:
        rows = [
            (0, "deep neural networks and the gradient descent of deep networks"),
            (1, "gradient descent is a convex optimization method"),
            (2, "the the the and of"),                     # all stopwords
            (3, ""),                                       # empty
            (4, "deep gradient networks"),                 # one 3-word phrase
        ]
        return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                         "text": pa.array([r[1] for r in rows], pa.string())})

    def test_semantics_and_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.rake import rake_words, sql_rake_words
        tbl = self._docs()
        got = {r["token"]: r for r in rake_words(
            rd.from_arrow(tbl).repartition(2), min_freq=2).take_all()}
        # 'deep': occurrences in phrases of len 3 ("deep neural networks"),
        # 2 ("deep networks"), 3 ("deep gradient networks") -> freq 3, deg 8
        assert got["deep"]["freq"] == 3 and got["deep"]["deg"] == 8
        assert got["deep"]["score_micro"] == 8 * 1_000_000 // 3
        # stopword-only and empty docs contribute nothing; stopwords never
        # appear as keywords
        assert "the" not in got and "and" not in got and "of" not in got
        con = duckdb.connect()
        con.register("documents", tbl)
        sql_rows = con.execute(sql_rake_words(min_freq=2)).fetchall()
        assert {(r["token"], r["freq"], r["deg"], r["score_micro"])
                for r in got.values()} == set(sql_rows)

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.extras.rake import rake_words
        tbl = self._docs()
        a = sorted((r["token"], r["freq"], r["deg"]) for r in rake_words(
            rd.from_arrow(tbl).repartition(1), min_freq=1).take_all())
        b = sorted((r["token"], r["freq"], r["deg"]) for r in rake_words(
            rd.from_arrow(tbl).repartition(4), min_freq=1).take_all())
        assert a == b


class TestRenyi2:
    def test_semantics_and_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.textstats import (renyi2_by_source,
                                              sql_renyi2_by_source)
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a a b", "a b c d", ""], pa.string()),
            "source": pa.array(["s1", "s1", "s2"], pa.string()),
        })
        got = {r["source"]: r for r in renyi2_by_source(
            rd.from_arrow(tbl).repartition(2)).take_all()}
        # s1: counts a=4, b=2, c=1, d=1 -> T=8, V=4, S=16+4+1+1=22
        assert got["s1"]["n_tokens"] == 8
        assert got["s1"]["n_distinct"] == 4
        assert got["s1"]["sum_sq"] == 22
        assert got["s1"]["collision_ppb"] == 22 * 10**9 // 64
        assert "s2" not in got            # zero tokens -> no (source,token) rows
        con = duckdb.connect()
        con.register("documents", tbl)
        sql_rows = con.execute(sql_renyi2_by_source()).fetchall()
        assert {(r["source"], r["n_tokens"], r["n_distinct"], r["sum_sq"],
                 r["collision_ppb"]) for r in got.values()} == set(sql_rows)


class TestAttribution:
    def _events(self) -> pa.Table:
        us = 1_000_000
        rows = [
            # user 1: view -> click -> purchase -> purchase (second purchase
            # still attributes to the click: purchases are never touches)
            (1, 10 * us, 1, "view"),
            (2, 20 * us, 1, "click"),
            (3, 30 * us, 1, "purchase"),
            (4, 40 * us, 1, "purchase"),
            # user 2: purchase with NO prior touch -> NULL attribution
            (5, 10 * us, 2, "purchase"),
            (6, 20 * us, 2, "view"),
            # user 3: ts tie between touch and purchase -> event_id breaks it
            (7, 50 * us, 3, "click"),
            (8, 50 * us, 3, "purchase"),
        ]
        return pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        })

    def test_semantics_and_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.stages.events import (last_touch_attribution,
                                           sql_last_touch_attribution)
        tbl = self._events()
        got = {r["event_id"]: r for r in last_touch_attribution(
            rd.from_arrow(tbl).repartition(3)).take_all()}
        assert set(got) == {3, 4, 5, 8}
        assert got[3]["attr_event_id"] == 2 and got[3]["attr_type"] == "click"
        assert got[3]["gap_us"] == 10_000_000
        assert got[4]["attr_event_id"] == 2     # skips the earlier purchase
        assert got[4]["gap_us"] == 20_000_000
        assert got[5]["attr_event_id"] is None and got[5]["gap_us"] is None
        assert got[8]["attr_event_id"] == 7 and got[8]["gap_us"] == 0
        con = duckdb.connect()
        con.register("events", tbl)
        sql_rows = con.execute(sql_last_touch_attribution()).fetchall()
        assert {(r["event_id"], r["user_id"], r["attr_event_id"],
                 r["attr_type"], r["gap_us"]) for r in got.values()} \
            == set(sql_rows)


class TestHardNegatives:
    def _embeddings(self) -> pa.Table:
        rng = np.random.default_rng(11)
        vecs = rng.standard_normal((20, 5))
        vecs[7] = 2.0 * vecs[3]            # same-label scaled copy of 3
        labels = [0, 0, 0, 1, 1, 1, 2, 1, 0, 0,
                  1, 0, 1, 0, 1, 0, 1, 0, 1, 3]   # label 2 and 3: singletons
        return pa.table({
            "vec_id": pa.array(range(20), pa.int64()),
            "label": pa.array(labels, pa.int32()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })

    def test_semantics_and_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.ann import hard_negatives, sql_hard_negatives
        tbl = self._embeddings()
        got = {r["vec_id"]: r for r in hard_negatives(
            rd.from_arrow(tbl).repartition(3)).take_all()}
        assert set(got) == set(range(20))
        # the scaled same-label copy is 3's positive at cosine 1.0
        assert got[3]["pos_id"] == 7 and got[3]["pos_cos"] == 1.0
        # singleton labels have no positive but DO have a negative
        for v in (6, 19):
            assert got[v]["pos_id"] is None and got[v]["pos_cos"] is None
            assert got[v]["neg_id"] is not None
        con = duckdb.connect()
        con.register("embeddings", tbl)
        sql_rows = con.execute(sql_hard_negatives()).fetchall()
        eng = {(r["vec_id"], r["label"], r["pos_id"], r["pos_cos"],
                r["neg_id"], r["neg_cos"]) for r in got.values()}
        assert eng == set(sql_rows)


class TestCustsRfm:
    def test_engine_vs_sql_on_fixture(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq
        from ontoray.queries import SQL_CUSTS_RFM, q_custs_rfm
        rng = np.random.default_rng(5)
        n = 200
        tbl = pa.table({
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, 37, n), pa.int64()),
            "o_orderdate": pa.array(
                (rng.integers(0, 3650, n) * 86_400_000_000
                 + 900_000_000 * 1_000_000).tolist(), pa.timestamp("us")),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1, 5000, n), 2), pa.float64()),
        })
        pq.write_table(tbl, tmp_path / "orders.parquet")
        got = {r["c_custkey"]: r for r in
               q_custs_rfm(str(tmp_path)).take_all()}
        con = duckdb.connect()
        con.register("orders", tbl)
        sql_rows = con.execute(SQL_CUSTS_RFM).fetchall()
        assert len(sql_rows) == len(got)
        for ck, r, f, m, code in sql_rows:
            g = got[ck]
            assert (g["r_score"], g["f_score"], g["m_score"],
                    g["rfm_code"]) == (r, f, m, code)
        # buckets span 0..4 with the top bucket inhabited
        assert max(r["m_score"] for r in got.values()) == 4


class TestCustsReturned:
    def _tables(self):
        rng = np.random.default_rng(9)
        n_li, n_o, n_c = 400, 80, 25
        lineitem = pa.table({
            "l_orderkey": pa.array(rng.integers(0, n_o, n_li), pa.int64()),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(10, 900, n_li), 2), pa.float64()),
            "l_discount": pa.array(
                np.round(rng.uniform(0, 0.1, n_li), 2), pa.float64()),
            "l_returnflag": pa.array(
                [("R" if x < 0.4 else "N") for x in rng.uniform(0, 1, n_li)],
                pa.string()),
        })
        orders = pa.table({
            "o_orderkey": pa.array(range(n_o), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_c, n_o), pa.int64()),
        })
        customer = pa.table({
            "c_custkey": pa.array(range(n_c), pa.int64()),
            "c_name": pa.array([f"cust-{i:03d}" for i in range(n_c)],
                               pa.string()),
        })
        return lineitem, orders, customer

    def test_engine_vs_sql(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq
        from ontoray.queries import SQL_CUSTS_RETURNED, q_custs_returned
        li, o, c = self._tables()
        pq.write_table(li, tmp_path / "lineitem.parquet")
        pq.write_table(o, tmp_path / "orders.parquet")
        pq.write_table(c, tmp_path / "customer.parquet")
        got = q_custs_returned(str(tmp_path)).to_pylist()
        con = duckdb.connect()
        con.register("lineitem", li)
        con.register("orders", o)
        con.register("customer", c)
        sql_rows = con.execute(SQL_CUSTS_RETURNED).fetchall()
        assert [(r["c_custkey"], r["c_name"], r["revenue"]) for r in got] \
            == sql_rows
        assert len(got) == 20
        # revenue strictly ordered desc with custkey tiebreak
        revs = [(-(r["revenue"]), r["c_custkey"]) for r in got]
        assert revs == sorted(revs)


class TestMonthlyMA:
    def test_engine_vs_sql(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq
        from ontoray.queries import SQL_ORDERS_MONTHLY_MA, q_orders_monthly_ma
        rng = np.random.default_rng(13)
        n = 300
        tbl = pa.table({
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_orderdate": pa.array(
                (rng.integers(0, 720, n) * 86_400_000_000
                 + 946_684_800 * 1_000_000).tolist(), pa.timestamp("us")),
            "o_totalprice": pa.array(
                np.round(rng.uniform(5, 2000, n), 2), pa.float64()),
        })
        pq.write_table(tbl, tmp_path / "orders.parquet")
        got = sorted(q_orders_monthly_ma(str(tmp_path)).take_all(),
                     key=lambda r: r["ym"])
        con = duckdb.connect()
        con.register("orders", tbl)
        sql_rows = con.execute(
            SQL_ORDERS_MONTHLY_MA + " ORDER BY ym").fetchall()
        assert [(r["ym"], r["n_orders"], r["revenue"], r["ma3_revenue"])
                for r in got] == sql_rows
        # first row's MA equals its own revenue (window of one)
        assert got[0]["ma3_revenue"] == got[0]["revenue"]


class TestDocsTopics:
    def _docs(self) -> pa.Table:
        # two crisp vocab islands so clusters are meaningful, plus noise
        phys = ["resistor capacitor inductor circuit voltage current"] * 6
        bio = ["enzyme protein cell membrane nucleus ribosome dna"] * 6
        texts = [f"{t} filler{i}" for i, t in enumerate(phys + bio)]
        texts.append("")                       # token-less doc: excluded
        return pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    def test_engine_vs_sql_and_invariance(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.topics import docs_topics, sql_docs_topics
        tbl = self._docs()
        got = {(r["cluster"], r["rank"]): (r["token"], r["n"])
               for r in docs_topics(rd.from_arrow(tbl).repartition(3),
                                    k=3, iters=2, topn=4).take_all()}
        con = duckdb.connect()
        con.register("documents", tbl)
        sql_rows = con.execute(sql_docs_topics(k=3, iters=2, topn=4)).fetchall()
        assert {(c, rk): (t, n) for c, t, n, rk in sql_rows} == got
        # partitioning invariance
        got1 = {(r["cluster"], r["rank"]): (r["token"], r["n"])
                for r in docs_topics(rd.from_arrow(tbl).repartition(1),
                                     k=3, iters=2, topn=4).take_all()}
        assert got == got1


class TestRandomWalks:
    def _edges(self) -> pa.Table:
        # path a-b-c-d plus triangle d-e-f-d and isolated pair g-h
        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                 ("e", "f"), ("f", "d"), ("g", "h")]
        return pa.table({
            "src": pa.array([p[0] for p in pairs], pa.string()),
            "dst": pa.array([p[1] for p in pairs], pa.string()),
        })

    def test_semantics_and_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.stages.analytics import random_walks, sql_random_walks
        tbl = self._edges()
        L = 3
        got = random_walks(rd.from_arrow(tbl).repartition(3),
                           length=L).take_all()
        by_walk = {}
        for r in got:
            by_walk.setdefault(r["start"], {})[r["step"]] = r["node"]
        # one walk per node, complete 0..L, starting at itself
        assert set(by_walk) == set("abcdefgh")
        adj = {}
        for s, d in zip(tbl.column("src").to_pylist(),
                        tbl.column("dst").to_pylist()):
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        for s, steps in by_walk.items():
            assert set(steps) == set(range(L + 1)) and steps[0] == s
            for t in range(1, L + 1):
                assert steps[t] in adj[steps[t - 1]]
        # partitioning invariance (md5 determinism)
        got1 = random_walks(rd.from_arrow(tbl).repartition(1),
                            length=L).take_all()
        key = lambda rows: sorted((r["start"], r["step"], r["node"])
                                  for r in rows)
        assert key(got) == key(got1)
        # SQL mirror over a registered stand-in for the tnorm CTE
        con = duckdb.connect()
        con.register("tnorm_tbl", pa.table({
            "subj_norm": tbl.column("src"),
            "obj_norm": tbl.column("dst"),
        }))
        sql = sql_random_walks(
            "WITH tnorm AS (SELECT subj_norm, obj_norm FROM tnorm_tbl)",
            length=L)
        sql_rows = con.execute(sql).fetchall()
        assert key(got) == sorted(sql_rows)


class TestNovelty:
    def _docs(self) -> pa.Table:
        shared = "one two three four five"          # a full 5-gram
        rows = [
            (0, f"{shared} alpha beta gamma delta"),   # first owner of shared
            (1, f"{shared} epsilon zeta eta theta"),   # shares the first gram
            (2, "iota kappa lambda mu nu xi"),         # fully novel
            (3, "tiny doc"),                           # < k tokens: no row
        ]
        return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                         "text": pa.array([r[1] for r in rows], pa.string())})

    def test_semantics_and_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.dedup import novelty_stats, sql_novelty_stats
        tbl = self._docs()
        got = {r["doc_id"]: r for r in novelty_stats(
            rd.from_arrow(tbl).repartition(2), k=5).take_all()}
        assert set(got) == {0, 1, 2}
        # doc 0 owns all its grams; doc 2 fully novel; doc 1 loses exactly
        # the one gram fully inside the shared prefix
        assert got[0]["novelty_ppm"] == 1_000_000
        assert got[2]["novelty_ppm"] == 1_000_000
        assert got[1]["n_novel"] == got[1]["n_grams"] - 1
        con = duckdb.connect()
        con.register("documents", tbl)
        sql_rows = con.execute(sql_novelty_stats(k=5)).fetchall()
        assert {(r["doc_id"], r["n_grams"], r["n_novel"], r["novelty_ppm"])
                for r in got.values()} == set(sql_rows)

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import novelty_stats
        tbl = self._docs()
        a = sorted(map(tuple, (r.values() for r in novelty_stats(
            rd.from_arrow(tbl).repartition(1), k=5).take_all())))
        b = sorted(map(tuple, (r.values() for r in novelty_stats(
            rd.from_arrow(tbl).repartition(3), k=5).take_all())))
        assert a == b


class TestBurstsAndAB:
    def _events(self) -> pa.Table:
        us = 1_000_000
        rows = []
        eid = 0
        # 'click': 3 events in minute 2, 1 in minute 5 -> peak minute 2
        for t in (120, 130, 140, 300):
            rows.append((eid, t * us, eid, "click", 10.0)); eid += 1
        # 'view': 2 in minute 0, 2 in minute 1 -> tie, earliest minute wins
        for t in (10, 20, 60, 70):
            rows.append((eid, t * us, eid, "view", 5.5)); eid += 1
        return pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        })

    def test_bursts(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.stages.events import SQL_EVENTS_BURSTS, burst_peaks
        tbl = self._events()
        got = {r["event_type"]: r for r in burst_peaks(
            rd.from_arrow(tbl).repartition(3)).take_all()}
        assert got["click"]["peak_minute"] == 2
        assert got["click"]["peak_events"] == 3
        assert got["view"]["peak_minute"] == 0       # tie -> earliest
        con = duckdb.connect()
        con.register("events", tbl)
        sql_rows = con.execute(SQL_EVENTS_BURSTS).fetchall()
        assert {(r["event_type"], r["peak_minute"], r["peak_events"])
                for r in got.values()} == set(sql_rows)

    def test_ab(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.stages.events import SQL_EVENTS_AB, ab_metrics
        tbl = self._events()
        got = {r["event_type"]: r for r in ab_metrics(
            rd.from_arrow(tbl).repartition(2)).take_all()}
        # click: user_ids 0-3 -> arms alternate; values all 10.0
        assert got["click"]["n_treat"] == 2 and got["click"]["n_ctrl"] == 2
        assert got["click"]["mean_treat_micro"] == 10_000_000
        assert got["click"]["diff_micro"] == 0
        con = duckdb.connect()
        con.register("events", tbl)
        sql_rows = con.execute(SQL_EVENTS_AB).fetchall()
        assert {tuple(r.values()) for r in got.values()} == set(sql_rows)


class TestLineitemQ6:
    def test_engine_vs_sql(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq
        from ontoray.queries import SQL_LINEITEM_Q6, q_lineitem_q6
        rng = np.random.default_rng(17)
        n = 500
        base = 820_454_400  # 1996-01-01
        tbl = pa.table({
            "l_orderkey": pa.array(range(n), pa.int64()),
            "l_shipdate": pa.array(
                ((base + rng.integers(-200, 400, n) * 86_400) * 1_000_000)
                .tolist(), pa.timestamp("us")),
            "l_discount": pa.array(
                np.round(rng.uniform(0, 0.1, n), 2), pa.float64()),
            "l_quantity": pa.array(
                rng.integers(1, 50, n).astype(np.float64), pa.float64()),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(100, 9000, n), 2), pa.float64()),
        })
        pq.write_table(tbl, tmp_path / "lineitem.parquet")
        got = q_lineitem_q6(str(tmp_path)).to_pylist()[0]
        con = duckdb.connect()
        con.register("lineitem", tbl)
        rev, cnt = con.execute(SQL_LINEITEM_Q6).fetchone()
        assert got["revenue"] == rev and got["n_items"] == cnt
        assert cnt > 0                               # predicate non-vacuous

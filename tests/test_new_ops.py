"""Round-3 additions: span-level dup detection, SemDeDup, per-key lag."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


class TestDupSpans:
    W = 4  # small tiles so fixtures stay readable

    def _docs(self) -> pa.Table:
        shared = "alpha beta gamma delta"            # one full tile
        rows = [
            (0, f"{shared} zero only tail words"),   # tile0 shared with doc 1
            (1, f"{shared} one other tail tokens"),  # tile0 shared with doc 0
            (2, "totally unique text in this doc"),  # no shared tiles
            (3, "rep rep rep rep rep rep rep rep"),  # same tile TWICE intra-doc
            (4, "too short"),                        # < W tokens: no tiles
        ]
        return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                         "text": pa.array([r[1] for r in rows], pa.string())})

    def test_semantics_and_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import dup_span_stats
        tbl = self._docs()
        got = {r["doc_id"]: r for r in dup_span_stats(
            rd.from_arrow(tbl).repartition(3), w=self.W).take_all()}
        # docs 0 and 1: 2 tiles each, the shared one is duplicated
        for d in (0, 1):
            assert got[d]["n_tiles"] == 2 and got[d]["dup_tiles"] == 1
            assert got[d]["dup_frac"] == 0.5
        # unique doc: no dup tiles
        assert got[2]["dup_tiles"] == 0 and got[2]["dup_frac"] == 0.0
        # intra-doc tile repetition does NOT promote (distinct-doc count = 1)
        assert got[3]["n_tiles"] == 2 and got[3]["dup_tiles"] == 0
        # sub-tile doc contributes no row
        assert 4 not in got
        # partitioning invariance
        got1 = {r["doc_id"]: r for r in dup_span_stats(
            rd.from_arrow(tbl).repartition(1), w=self.W).take_all()}
        assert got == got1

    def test_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import dup_span_stats, sql_dup_spans
        tbl = self._docs()
        got = {r["doc_id"]: r for r in dup_span_stats(
            rd.from_arrow(tbl), w=self.W).take_all()}
        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(sql_dup_spans(w=self.W)).fetchall()
        assert len(rows) == len(got)
        for did, n_tiles, dup_tiles, dup_frac in rows:
            assert got[did]["n_tiles"] == n_tiles
            assert got[did]["dup_tiles"] == dup_tiles
            assert got[did]["dup_frac"] == dup_frac


class TestSemDeDup:
    def _embeddings(self) -> pa.Table:
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((40, 8))
        # vec 37 is a near-copy of vec 5 (tiny perturbation -> cosine ~ 1);
        # vec 38 is an exact scaled copy of vec 9 (cosine == 1 pre-quantize).
        vecs[37] = vecs[5] + 0.01 * rng.standard_normal(8)
        vecs[38] = 2.0 * vecs[9]
        return pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })

    def test_dup_marks_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.semdedup import semdedup, sql_semdedup
        tbl = self._embeddings()
        k, iters = 4, 2
        got = {r["vec_id"]: r for r in semdedup(
            rd.from_arrow(tbl).repartition(3), k=k, iters=iters,
            threshold_num=90, threshold_den=100).take_all()}
        assert len(got) == 40
        # near-copies land in their source's cluster and are shadowed by the
        # lower id; the originals stay kept.
        assert got[37]["is_dup"] and not got[5]["is_dup"]
        assert got[38]["is_dup"] and not got[9]["is_dup"]
        assert got[37]["cluster"] == got[5]["cluster"]
        con = duckdb.connect()
        con.register("embeddings", tbl)
        rows = con.execute(sql_semdedup(
            k=k, iters=iters, threshold_num=90, threshold_den=100)).fetchall()
        assert len(rows) == 40
        for vid, cluster, is_dup in rows:
            assert got[vid]["cluster"] == cluster, vid
            assert got[vid]["is_dup"] == is_dup, vid

    def test_zero_vector_never_dup(self, ray_session):
        import ray.data as rd
        from ontoray.extras.semdedup import semdedup
        tbl = pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([[0.0] * 4, [0.0] * 4, [1.0] * 4],
                                  pa.list_(pa.float32())),
        })
        got = {r["vec_id"]: r["is_dup"] for r in
               semdedup(rd.from_arrow(tbl), k=1, iters=1).take_all()}
        # zero-norm vectors have dot 0 with everything -> never duplicates
        assert got == {0: False, 1: False, 2: False}


class TestGroupedLag:
    def _events(self) -> pa.Table:
        # user 1: three events incl. a ts TIE broken by event_id;
        # user 2: single event (prev/delta NULL).
        ts = pa.array([1000, 1000, 2000, 5000], pa.timestamp("us"))
        return pa.table({
            "event_id": pa.array([11, 10, 12, 20], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "value": pa.array([3.5, 1.25, 10.0, 7.0], pa.float64()),
        })

    def test_semantics_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.stages.events import SQL_EVENTS_LAG, grouped_lag
        tbl = self._events()
        got = {r["event_id"]: r for r in grouped_lag(
            rd.from_arrow(tbl).repartition(2)).take_all()}
        # tie at ts=1000: event 10 precedes event 11
        assert got[10]["prev_value"] is None and got[10]["delta"] is None
        assert got[11]["prev_value"] == 1.25 and got[11]["delta"] == 3.5 - 1.25
        assert got[12]["prev_value"] == 3.5
        assert got[20]["prev_value"] is None
        con = duckdb.connect()
        con.register("events", tbl)
        for eid, uid, val, prev, delta in con.execute(SQL_EVENTS_LAG).fetchall():
            assert got[eid]["user_id"] == uid
            assert got[eid]["value"] == val
            assert got[eid]["prev_value"] == prev
            assert got[eid]["delta"] == delta


class TestBM25:
    def _docs(self) -> pa.Table:
        rows = [
            (0, "join join join hash other words here"),   # high tf
            (1, "join hash"),                               # short doc
            (2, "nothing relevant at all"),                 # no query terms
            (3, "join " + "filler " * 50),                  # long doc, tf=1
            (4, ""),                                        # empty
        ]
        return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                         "text": pa.array([r[1] for r in rows], pa.string())})

    def test_ranking_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.textstats import bm25_topk, sql_bm25_topk
        tbl = self._docs()
        terms = ["join", "hash"]
        got = bm25_topk(rd.from_arrow(tbl).repartition(3), terms, k=5).take_all()
        ids = [r["doc_id"] for r in got]
        # docs without any query term never appear
        assert 2 not in ids and 4 not in ids
        # short doc with both terms outranks the tf=1 long doc
        assert ids.index(1) < ids.index(3)
        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(sql_bm25_topk(terms, k=5)).fetchall()
        assert [(r["doc_id"], r["score_micro"], r["n_terms"]) for r in got] == rows

    def test_empty_corpus(self, ray_session):
        import ray.data as rd
        from ontoray.extras.textstats import bm25_topk
        tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                        "text": pa.array([], pa.string())})
        assert bm25_topk(rd.from_arrow(tbl), ["x"], k=3).take_all() == []


class TestCollocations:
    def _docs(self) -> pa.Table:
        # "new york" always adjacent (strong collocation); "the" everywhere
        # (weak); "rare pair" below min_count.
        txt0 = "new york is big and the city of new york has the people"
        txt1 = "i love new york and the new york skyline in the morning"
        txt2 = "rare pair appears once only here with the usual words"
        return pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                         "text": pa.array([txt0, txt1, txt2], pa.string())})

    def test_top_pair_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.textstats import collocations_topk, sql_collocations
        tbl = self._docs()
        got = collocations_topk(rd.from_arrow(tbl).repartition(2),
                                k=5, min_count=2).take_all()
        assert got, "non-empty"
        # the adjacent pair dominates by lift
        assert (got[0]["w1"], got[0]["w2"]) == ("new", "york")
        # min_count prunes singletons
        assert all(r["n"] >= 2 for r in got)
        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(sql_collocations(k=5, min_count=2)).fetchall()
        assert [(r["w1"], r["w2"], r["n"], r["lift_micro"]) for r in got] == rows


class TestGroupedCorr:
    def _tbl(self) -> pa.Table:
        # group "a": y = 2x exactly -> corr 1; group "b": y = -x -> corr -1;
        # group "c": constant y -> zero variance -> NULL corr.
        xs = [1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 5.0, 6.0]
        ys = [2.0, 4.0, 6.0, 3.0, 2.0, 1.0, 9.0, 9.0]
        ks = ["a", "a", "a", "b", "b", "b", "c", "c"]
        return pa.table({"k": pa.array(ks), "x": pa.array(xs, pa.float64()),
                         "y": pa.array(ys, pa.float64())})

    def test_known_corrs_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.quantiles import grouped_corr, sql_grouped_corr
        tbl = self._tbl()
        got = {r["k"]: r for r in grouped_corr(
            rd.from_arrow(tbl).repartition(3), "k", "x", "y").take_all()}
        assert got["a"]["corr"] == 1.0
        assert got["b"]["corr"] == -1.0
        assert got["c"]["corr"] is None
        con = duckdb.connect()
        con.register("t", tbl)
        for k, n, mx, my, corr in con.execute(
                sql_grouped_corr("t", "k", "x", "y")).fetchall():
            assert got[k]["n"] == n
            assert got[k]["mean_x_cents"] == mx
            assert got[k]["mean_y_cents"] == my
            assert got[k]["corr"] == corr


class TestRemoveDupSpans:
    def test_scrub_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import remove_dup_spans, sql_remove_dup_spans
        shared = "alpha beta gamma delta"
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array([f"{shared} zero only tail words",
                              f"{shared} one other tail tokens",
                              "totally unique text in this doc",
                              "rep rep rep rep rep rep rep rep",
                              "too short",
                              shared,          # ALL tiles dup, no tail
                              shared], pa.string()),
        })
        got = {r["doc_id"]: r for r in remove_dup_spans(
            rd.from_arrow(tbl).repartition(3), w=4).take_all()}
        # the shared tile is scrubbed from both carriers
        assert got[0]["text_clean"] == "zero only tail words"
        assert got[1]["text_clean"] == "one other tail tokens"
        assert got[0]["n_removed"] == 1
        # intra-doc repetition is NOT cross-document -> untouched
        assert got[3]["text_clean"] == "rep rep rep rep rep rep rep rep"
        # sub-tile doc passes through (token-normalized)
        assert got[4]["text_clean"] == "too short" and got[4]["n_removed"] == 0
        # every tile dropped and no tail -> empty string (NOT null)
        assert got[5]["text_clean"] == "" and got[5]["n_removed"] == 1
        con = duckdb.connect()
        con.register("documents", tbl)
        for did, txt, nrem in con.execute(sql_remove_dup_spans(w=4)).fetchall():
            assert got[did]["text_clean"] == txt
            assert got[did]["n_removed"] == nrem


class TestFullOuterJoin:
    def test_full_outer_vs_duckdb(self, ray_session):
        import ray.data as rd
        from ontoray.stages.joins import hash_join
        left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                         "lv": pa.array(["a", "b", "c"], pa.string())})
        right = pa.table({"rk": pa.array([2, 3, 3, 4], pa.int64()),
                          "rv": pa.array([20.0, 30.0, 31.0, 40.0], pa.float64())})
        got = sorted(
            ((r["k"], r["lv"], r["rv"]) for r in
             hash_join(rd.from_arrow(left).repartition(2),
                       rd.from_arrow(right).repartition(3),
                       "k", "rk", how="full_outer").take_all()),
            key=lambda t: (t[0], t[2] if t[2] is not None else -1.0))
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = sorted(
            con.execute("SELECT coalesce(l.k, r.rk) AS k, l.lv, r.rv "
                        "FROM l FULL OUTER JOIN r ON r.rk = l.k").fetchall(),
            key=lambda t: (t[0], t[2] if t[2] is not None else -1.0))
        assert got == want
        # unmatched-left (k=1) and unmatched-right (k=4) both survive
        assert (1, "a", None) in got and (4, None, 40.0) in got


class TestDsirScores:
    def test_contrast_direction_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.textstats import dsir_scores, sql_dsir_scores
        # target docs speak "alpha"; raw docs speak "zeta" — a raw doc full
        # of target-language bigrams must outscore a raw-language doc.
        rows = [
            (0, "alpha beta alpha beta alpha beta", True),
            (13, "alpha beta alpha beta", True),
            (1, "zeta eta zeta eta zeta eta", False),
            (2, "alpha beta alpha beta alpha", False),   # target-like raw doc
            (3, "zeta eta zeta eta", False),
            (4, "x", False),                              # <2 tokens -> zeros
        ]
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "is_target": pa.array([r[2] for r in rows], pa.bool_()),
        })
        got = {r["doc_id"]: r for r in dsir_scores(
            rd.from_arrow(tbl).repartition(3)).take_all()}
        assert got[2]["score_micro"] > got[1]["score_micro"]
        assert got[4]["n_grams"] == 0 and got[4]["score_micro"] == 0
        con = duckdb.connect()
        con.register("documents", tbl.select(["doc_id", "text"]))
        rows_sql = con.execute(sql_dsir_scores(
            target_pred="doc_id % 13 = 0")).fetchall()
        assert len(rows_sql) == len(got)
        for did, ng, sc in rows_sql:
            assert got[did]["n_grams"] == ng, did
            assert got[did]["score_micro"] == sc, did


class TestMixtureSample:
    def _docs(self) -> pa.Table:
        rows = [
            (0, "alpha beta gamma", "web"),      # 3 tokens
            (1, "one two three four five", "web"),
            (2, "x y z w", "web"),
            (3, "code tokens here", "code"),
            (4, "def f return x", "code"),
            (5, "", "code"),                      # zero tokens
        ]
        return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                         "text": pa.array([r[1] for r in rows], pa.string()),
                         "source": pa.array([r[2] for r in rows], pa.string())})

    def test_budget_cut_and_sql_mirror(self, ray_session):
        import hashlib

        import ray.data as rd
        from ontoray.extras.textstats import TOKEN_RE, mixture_sample, sql_mixture_sample

        tbl, budget = self._docs(), 5
        got = {r["doc_id"]: r for r in mixture_sample(
            rd.from_arrow(tbl).repartition(3), budget_tokens=budget).take_all()}

        # manual per-source md5-order prefix
        by_src: dict = {}
        for did, text, src in zip(tbl.column("doc_id").to_pylist(),
                                  tbl.column("text").to_pylist(),
                                  tbl.column("source").to_pylist()):
            h = hashlib.md5(f"mix1:{did}".encode()).hexdigest()[:16]
            by_src.setdefault(src, []).append((h, did, len(TOKEN_RE.findall(text))))
        want = {}
        for src, rows in by_src.items():
            acc = 0
            for h, did, nt in sorted(rows):
                if acc < budget:
                    want[did] = (src, nt, acc)
                acc += nt
        assert {d: (r["source"], r["n_tokens"], r["tok_start"])
                for d, r in got.items()} == want

        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(sql_mixture_sample(budget_tokens=budget)).fetchall()
        assert {(d, s, n, t) for d, s, n, t in rows} == \
               {(d, s, n, t) for d, (s, n, t) in want.items()}


class TestBuildVocab:
    def test_ranked_ids_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.textstats import build_vocab, sql_build_vocab

        texts = ["aa bb aa cc", "bb aa dd", "cc bb zz", "qq"]  # zz/dd/qq: n=1
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        got = {r["token"]: (r["n"], r["token_id"]) for r in build_vocab(
            rd.from_arrow(tbl).repartition(2), min_count=2).take_all()}
        # aa:3 bb:3 cc:2 — tie aa/bb broken lexicographically
        assert got == {"aa": (3, 0), "bb": (3, 1), "cc": (2, 2)}

        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(sql_build_vocab(min_count=2)).fetchall()
        assert {t: (n, i) for t, n, i in rows} == got


class TestEventsPivot:
    def test_counts_value_and_sql_mirror(self, ray_session):
        import datetime

        import ray.data as rd
        from ontoray.stages.events import pivot_counts, sql_pivot_counts

        ts = datetime.datetime(2026, 1, 1)
        rows = [  # (user, type, value)
            (1, "click", 0.5), (1, "purchase", 19.995), (1, "purchase", 0.004),
            (2, "view", 3.0), (2, "error", -1.0),
            (3, "signup", 2.0),
        ]
        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([ts] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        })
        got = {r["user_id"]: r for r in pivot_counts(
            rd.from_arrow(tbl).repartition(3)).take_all()}
        assert got[1]["n_click"] == 1 and got[1]["n_purchase"] == 2
        # cents contract: floor(19.995*100+0.5)=2000, floor(0.004*100+0.5)=0
        assert got[1]["purchase_value"] == 20.0
        assert got[2]["n_view"] == 1 and got[2]["purchase_value"] == 0.0
        assert got[3]["n_signup"] == 1

        con = duckdb.connect()
        con.register("events", tbl)
        for u, *vals in con.execute(
                "SELECT * FROM (" + sql_pivot_counts() + ") ORDER BY user_id").fetchall():
            r = got[u]
            assert vals == [r["n_click"], r["n_error"], r["n_purchase"],
                            r["n_signup"], r["n_view"], r["purchase_value"]]


class TestOrdersRevenue:
    def test_vs_duckdb(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from ontoray.queries import SQL_ORDERS_REVENUE, q_orders_revenue

        rng = np.random.default_rng(7)
        n_nat, n_supp, n_cust, n_ord, n_li = 4, 8, 12, 30, 90
        nation = pa.table({"n_nationkey": pa.array(range(n_nat), pa.int32()),
                           "n_name": pa.array([f"NAT{i}" for i in range(n_nat)])})
        supplier = pa.table({
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_nationkey": pa.array(rng.integers(0, n_nat, n_supp), pa.int32())})
        customer = pa.table({
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_nationkey": pa.array(rng.integers(0, n_nat, n_cust), pa.int32())})
        orders = pa.table({
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64())})
        lineitem = pa.table({
            "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(1, 1000, n_li), 2), pa.float64()),
            "l_discount": pa.array(
                np.round(rng.uniform(0, 0.1, n_li), 2), pa.float64())})
        tables = {"nation": nation, "supplier": supplier, "customer": customer,
                  "orders": orders, "lineitem": lineitem}
        con = duckdb.connect()
        for name, t in tables.items():
            pq.write_table(t, str(tmp_path / f"{name}.parquet"))
            con.register(name, t)
        got = sorted((r["n_name"], r["revenue"])
                     for r in q_orders_revenue(str(tmp_path)).take_all())
        want = sorted(map(tuple, con.execute(SQL_ORDERS_REVENUE).fetchall()))
        assert got == want and len(got) > 0


class TestNeardupKeep:
    def test_survivors_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import neardup_keep, sql_neardup_keep

        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (0, base, "a"),
            (1, base + " extra", "a"),                    # near-dup of 0
            (2, "completely different text with unique words everywhere", "b"),
            (3, base, "b"),                               # exact dup of 0
            (4, "another standalone document nothing shared here at all", "b"),
        ]
        tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": pa.array([r[1] for r in rows], pa.string()),
                        "source": pa.array([r[2] for r in rows], pa.string())})
        got = sorted((r["doc_id"], r["source"]) for r in neardup_keep(
            rd.from_arrow(tbl).repartition(2), threshold=0.8).take_all())
        # cluster {0,1,3} keeps min id 0; 2 and 4 untouched
        assert got == [(0, "a"), (2, "b"), (4, "b")]

        con = duckdb.connect()
        con.register("documents", tbl)
        want = sorted(map(tuple, con.execute(sql_neardup_keep(0.8)).fetchall()))
        assert got == want


class TestBuildPostings:
    def test_postings_df_cap_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.extras.textstats import build_postings, sql_build_postings

        texts = ["aa bb", "aa bb aa", "aa cc", "dd", "aa"]
        tbl = pa.table({"doc_id": pa.array([10, 7, 3, 4, 5], pa.int64()),
                        "text": pa.array(texts, pa.string())})
        got = {r["token"]: (r["df"], r["postings"]) for r in build_postings(
            rd.from_arrow(tbl).repartition(3), min_df=2, max_df=3,
            cap=2).take_all()}
        # aa: df=4 > max_df dropped; bb: df=2 docs {10,7} -> "7,10";
        # cc/dd: df=1 dropped
        assert got == {"bb": (2, "7,10")}

        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(sql_build_postings(min_df=2, max_df=3, cap=2)).fetchall()
        assert {t: (d, p) for t, d, p in rows} == got


class TestFunnelRetention:
    def _events(self) -> pa.Table:
        import datetime

        def t(h):
            return datetime.datetime(2026, 1, 1) + datetime.timedelta(hours=h)
        rows = [  # (user, hours, type)
            (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),  # full funnel
            (2, 0, "view"), (2, 1, "click"),                       # stops at click
            (3, 5, "click"), (3, 6, "view"),                       # click BEFORE view
            (4, 0, "purchase"),                                    # no view
            (5, 0, "view"), (5, 0, "click"),                       # same ts: not after
            # retention shape: user 6 returns on day 2 and 3
            (6, 0, "view"), (6, 49, "view"), (6, 73, "view"),
        ]
        return pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([t(r[1]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        })

    def test_funnel_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.stages.events import funnel_counts, sql_funnel_counts
        tbl = self._events()
        got = funnel_counts(rd.from_arrow(tbl).repartition(3)).take_all()
        assert len(got) == 1
        r = got[0]
        # view: users 1,2,3,5,6 -> 5; click strictly after view: 1,2 -> 2
        # (3 clicked before viewing, 5 clicked at the SAME ts); purchase: 1
        assert (r["n_view"], r["n_click"], r["n_purchase"]) == (5, 2, 1)

        con = duckdb.connect()
        con.register("events", tbl)
        assert con.execute(sql_funnel_counts()).fetchall() == [(5, 2, 1)]

    def test_retention_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.stages.events import retention_cohorts, sql_retention_cohorts
        tbl = self._events()
        got = sorted((r["cohort_day"], r["day_offset"], r["n_users"])
                     for r in retention_cohorts(
                         rd.from_arrow(tbl).repartition(4)).take_all())
        day0 = 20454  # 2026-01-01 epoch days
        # users 1,2,4,5,6 start day0 (user 3's events are also day0 hours 5-6)
        # user 6 active at offsets 0, 2, 3
        assert got == [(day0, 0, 6), (day0, 2, 1), (day0, 3, 1)]

        con = duckdb.connect()
        con.register("events", tbl)
        want = sorted(map(tuple, con.execute(sql_retention_cohorts()).fetchall()))
        assert got == want


class TestOrdersRollup:
    def test_three_levels_vs_duckdb(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from ontoray.queries import SQL_ORDERS_ROLLUP, q_orders_rollup

        rng = np.random.default_rng(11)
        region = pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                           "r_name": pa.array(["EAST", "WEST"])})
        nation = pa.table({"n_nationkey": pa.array(range(4), pa.int32()),
                           "n_name": pa.array([f"N{i}" for i in range(4)]),
                           "n_regionkey": pa.array([0, 0, 1, 1], pa.int32())})
        customer = pa.table({
            "c_custkey": pa.array(range(10), pa.int64()),
            "c_nationkey": pa.array(rng.integers(0, 4, 10), pa.int32())})
        orders = pa.table({
            "o_orderkey": pa.array(range(40), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, 10, 40), pa.int64()),
            "o_totalprice": pa.array(np.round(rng.uniform(1, 9999, 40), 2),
                                     pa.float64())})
        tables = {"region": region, "nation": nation, "customer": customer,
                  "orders": orders}
        con = duckdb.connect()
        for name, t in tables.items():
            pq.write_table(t, str(tmp_path / f"{name}.parquet"))
            con.register(name, t)
        got = sorted((r["r_name"], r["n_name"], r["n_orders"], r["total_price"])
                     for r in q_orders_rollup(str(tmp_path)).take_all())
        want = sorted(map(tuple, con.execute(SQL_ORDERS_ROLLUP).fetchall()))
        assert got == want
        # exactly one grand-total row and one ALL row per region
        assert sum(1 for r in got if r[0] == "ALL") == 1
        assert sum(1 for r in got if r[1] == "ALL" and r[0] != "ALL") == 2


class TestWinnowing:
    def test_selection_and_sql_mirror(self, ray_session):
        import numpy as np
        import ray.data as rd
        from ontoray.extras.sketches import _md5_int60
        from ontoray.extras.textstats import (TOKEN_RE, sql_winnow_fingerprints,
                                              winnow_fingerprints)
        texts = ["aa bb cc dd ee ff gg hh",          # 6 grams, 3 windows
                 "one two three four five six",
                 "short text",                        # sub-window: no row
                 "aa bb cc dd ee ff"]                 # shares grams with doc 0
        tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        k, w = 3, 4
        got = {r["doc_id"]: (r["n_fp"], r["fp_min"], r["fp_max"])
               for r in winnow_fingerprints(
                   rd.from_arrow(tbl).repartition(2), k=k, w=w).take_all()}
        want = {}
        for did, t in zip(range(4), texts):
            toks = TOKEN_RE.findall(t)
            n_g = len(toks) - k + 1
            if n_g < w:
                continue
            grams = [" ".join(toks[i:i + k]) for i in range(n_g)]
            h = _md5_int60(grams)
            win = np.lib.stride_tricks.sliding_window_view(h, w)
            sel = np.unique(win.min(axis=1))
            want[did] = (len(sel), int(sel[0]), int(sel[-1]))
        assert got == want and 2 not in got
        con = duckdb.connect()
        con.register("documents", tbl)
        rows = con.execute(sql_winnow_fingerprints(k, w)).fetchall()
        assert {r[0]: tuple(r[1:]) for r in rows} == got


class TestTaxonomyDepth:
    def _triples(self) -> pa.Table:
        # a -> b -> c -> root ; multi-parent: c also under zroot (min picks
        # 'root'); cycle: x <-> y (never reached); other pred ignored.
        rows = [
            ("a", "subclass_of", "b"),
            ("b", "subclass_of", "c"),
            ("c", "subclass_of", "root"),
            ("c", "subclass_of", "zroot"),
            ("x", "subclass_of", "y"),
            ("y", "subclass_of", "x"),
            ("a", "haspart", "b"),
        ]
        return pa.table({
            "subj_norm": pa.array([r[0] for r in rows], pa.string()),
            "pred_norm": pa.array([r[1] for r in rows], pa.string()),
            "obj_norm": pa.array([r[2] for r in rows], pa.string()),
        })

    def test_depths_cycles_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.stages.analytics import taxonomy_depth

        got = {r["name"]: r["depth"] for r in taxonomy_depth(
            rd.from_arrow(self._triples()).repartition(3)).take_all()}
        # min-parent forest: c -> root (min('root','zroot') drops zroot from
        # the forest entirely); roots = forest parents never seen as a child.
        assert got == {"root": 0, "c": 1, "b": 2, "a": 3}
        # cycle members x, y excluded entirely
        assert "x" not in got and "y" not in got

        sql = ("WITH forest AS (SELECT subj_norm AS child, min(obj_norm) AS parent "
               "FROM trip WHERE pred_norm = 'subclass_of' GROUP BY 1), "
               "taxroots AS (SELECT DISTINCT parent AS name FROM forest "
               "WHERE parent NOT IN (SELECT child FROM forest)), "
               "walk AS (SELECT name, CAST(0 AS BIGINT) AS depth FROM taxroots "
               "UNION ALL SELECT f.child, w.depth + 1 FROM walk w "
               "JOIN forest f ON f.parent = w.name WHERE w.depth < 30) "
               "SELECT name, depth FROM walk")
        con = duckdb.connect()
        con.register("trip", self._triples())
        want = {n: d for n, d in con.execute(
            "WITH RECURSIVE " + sql[5:]).fetchall()}
        assert got == want

    def test_deep_chain_beyond_rounds_excluded(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import taxonomy_depth
        n = 8
        rows = [(f"n{i}", "subclass_of", f"n{i+1}") for i in range(n)]
        t = pa.table({
            "subj_norm": pa.array([r[0] for r in rows], pa.string()),
            "pred_norm": pa.array([r[1] for r in rows], pa.string()),
            "obj_norm": pa.array([r[2] for r in rows], pa.string()),
        })
        got = {r["name"]: r["depth"] for r in taxonomy_depth(
            rd.from_arrow(t), max_rounds=3).take_all()}
        # bounded walk: root n8 at 0, then exactly 3 levels
        assert got == {"n8": 0, "n7": 1, "n6": 2, "n5": 3}


class TestWebAnchors:
    def _pages(self) -> pa.Table:
        rows = [
            (0, "see [home](https://a.example.org/x) and [docs](https://a.example.org/d)"),
            (1, "![logo](img/logo.png) twice [home](https://a.example.org/x)"),
            (2, "no links here at all"),
            (3, ""),
            (4, "[same](rel/path) [same](rel/path) dup in one doc"),
            (5, "edge [empty]() and [spaced](not captured) ok"),
        ]
        return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                         "text": pa.array([r[1] for r in rows], pa.string())})

    def test_extraction_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.weblinks import extract_anchors, sql_web_anchors

        got = {(r["anchor"], r["target"], r["target_host"]): r["n"]
               for r in extract_anchors(
                   rd.from_arrow(self._pages()).repartition(3)).take_all()}
        assert got[("home", "https://a.example.org/x", "a.example.org")] == 2
        assert got[("logo", "img/logo.png", "")] == 1
        assert got[("same", "rel/path", "")] == 2
        assert ("empty", "", "") in got
        # '(not captured)' contains a space -> target regex rejects it
        assert not any(a == "spaced" for a, _, _ in got)

        con = duckdb.connect()
        con.register("pages_t", self._pages())
        want = {(a, t, h): n for a, t, h, n in con.execute(
            sql_web_anchors("SELECT doc_id, text FROM pages_t")).fetchall()}
        assert got == want


class TestCCNetBuckets:
    def _docs(self) -> pa.Table:
        # en: fluent docs repeat corpus-frequent bigrams; garble docs use
        # unique bigrams the LM never promotes past min_count.
        fluent = "the quick brown fox jumps over the lazy dog"
        rows = [
            (0, fluent + " " + fluent, "en"),
            (1, fluent, "en"),
            (2, "zq xv qj wk pz vb mm nn", "en"),
            (3, fluent + " again " + fluent, "en"),
            (4, "unique garble tokens here never repeated", "en"),
            (5, fluent, "en"),
            (6, "der schnelle braune fuchs", "de"),
            (7, "der schnelle braune fuchs springt", "de"),
            (8, "voellig anders geartetes zeug", "de"),
        ]
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        })

    def test_buckets_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.textstats import ccnet_buckets, sql_ccnet_buckets

        got = {r["doc_id"]: r for r in ccnet_buckets(
            rd.from_arrow(self._docs()).repartition(3), min_count=2).take_all()}
        assert len(got) == 9
        # per-lang split: every doc keeps its lang; labels map 0/1/2
        for r in got.values():
            assert r["ccnet_bucket"] == ["tail", "middle", "head"][r["bucket"]]
        # the repeated-fluent docs sit strictly above the garble docs in en
        assert got[0]["bucket"] > got[2]["bucket"]
        assert got[3]["bucket"] > got[4]["bucket"]

        con = duckdb.connect()
        con.register("documents", self._docs())
        for did, lang, bucket, lab in con.execute(
                sql_ccnet_buckets(min_count=2)).fetchall():
            assert got[did]["lang"] == lang
            assert got[did]["bucket"] == bucket
            assert got[did]["ccnet_bucket"] == lab


class TestQualityLogit:
    def _docs(self) -> pa.Table:
        rows = [
            (0, "the cat sat on the mat and it is a fine day for all of us "
                "to be out in the sun with the dog and the bird"),  # fluent
            (1, "zzzz qqqq kkkk " * 3),                  # no stopwords, short
            (2, "QWERTYUIOPASDFGH 12345 67890 !!!! ####"),  # no lowercase alpha
            (3, "x" * 2000),                             # one giant token
            (4, ""),                                     # empty
        ]
        return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                         "text": pa.array([r[1] for r in rows], pa.string())})

    def test_decisions_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.textstats import quality_logit, sql_quality_logit

        got = {r["doc_id"]: r for r in quality_logit(
            rd.from_arrow(self._docs()).repartition(2)).take_all()}
        assert got[0]["keep"] is True            # stopword-rich prose
        assert got[2]["keep"] is False           # alpha-free shouting
        assert got[3]["keep"] is False           # mean-token-length penalty
        assert got[4]["keep"] is False           # empty
        con = duckdb.connect()
        con.register("documents", self._docs())
        for did, logit, keep in con.execute(sql_quality_logit()).fetchall():
            assert got[did]["logit_micro"] == logit, did
            assert got[did]["keep"] == keep, did


class TestSimilarNodes:
    def _triples(self) -> pa.Table:
        # a and b share neighbors {n1, n2}; a also has n3 -> jac(a,b) = 2/3.
        # hub h links to everything but has degree > cap so generates no pairs.
        rows = [("a", "n1"), ("a", "n2"), ("a", "n3"),
                ("b", "n1"), ("b", "n2"),
                ("h", "a"), ("h", "b"), ("h", "n1"), ("h", "n2"), ("h", "n3")]
        return pa.table({
            "subj_norm": pa.array([r[0] for r in rows], pa.string()),
            "pred_norm": pa.array(["relatedto"] * len(rows), pa.string()),
            "obj_norm": pa.array([r[1] for r in rows], pa.string()),
        })

    def test_jaccard_hub_cap_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.stages.analytics import similar_nodes

        got = {(r["node_a"], r["node_b"]): r for r in similar_nodes(
            rd.from_arrow(self._triples()).repartition(3),
            cap=4, min_jac_micro=100_000).take_all()}
        # deg: a=4 (n1,n2,n3,h), b=3 (n1,n2,h); shared via n1,n2 (deg 3 each
        # incl. h edges... n1: a,b,h = 3 <= 4 OK) and via h? deg(h)=5 > cap.
        ab = got[("a", "b")]
        assert ab["common"] == 2
        assert ab["jac_micro"] == 1_000_000 * 2 // (4 + 3 - 2)

        sql = ("WITH trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst "
               "FROM t WHERE subj_norm <> obj_norm), "
               "und AS (SELECT src AS v, dst AS x FROM trip UNION SELECT dst, src FROM trip), "
               "deg AS (SELECT v, count(*) AS d FROM und GROUP BY 1), "
               "caps AS (SELECT u.v, u.x FROM und u JOIN deg ON deg.v = u.v WHERE deg.d <= 4), "
               "pairs AS (SELECT c1.x AS na, c2.x AS nb FROM caps c1 "
               "JOIN caps c2 ON c1.v = c2.v AND c1.x < c2.x), "
               "com AS (SELECT na, nb, CAST(count(*) AS BIGINT) AS common FROM pairs GROUP BY 1, 2) "
               "SELECT com.na, com.nb, com.common, "
               "CAST(1000000 * com.common // (da.d + db.d - com.common) AS BIGINT) AS jac "
               "FROM com JOIN deg da ON da.v = com.na JOIN deg db ON db.v = com.nb "
               "WHERE 1000000 * com.common // (da.d + db.d - com.common) >= 100000")
        con = duckdb.connect()
        con.register("t", self._triples())
        want = {(a, b): (c, j) for a, b, c, j in con.execute(sql).fetchall()}
        assert {k: (v["common"], v["jac_micro"]) for k, v in got.items()} == want


class TestHostSplit:
    def test_group_coherence(self, ray_session):
        import ray.data as rd
        from ontoray.extras.textstats import hash_split
        tbl = pa.table({
            "doc_id": pa.array(range(60), pa.int64()),
            "source": pa.array([f"host{i % 6}" for i in range(60)], pa.string()),
        })
        rows = hash_split(rd.from_arrow(tbl).repartition(4),
                          id_col="source", salt="hostsplit").take_all()
        by_host = {}
        for r in rows:
            by_host.setdefault(r["source"], set()).add(r["split"])
        # every host maps to exactly one split — leakage-safe by construction
        assert all(len(s) == 1 for s in by_host.values())


class TestPQCodes:
    def test_shape_subspace_independence_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.pq import pq_codes, sql_pq_codes

        rng = np.random.default_rng(7)
        dim, n = 8, 30
        vecs = rng.standard_normal((n, dim))
        tbl = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        got = {(r["vec_id"], r["subspace"]): r["code"] for r in pq_codes(
            rd.from_arrow(tbl).repartition(3), m=2, k=4, iters=2).take_all()}
        assert len(got) == n * 2
        assert all(0 <= c < 4 for c in got.values())

        con = duckdb.connect()
        con.register("embeddings", tbl)
        want = {(v, s): c for v, s, c in con.execute(
            sql_pq_codes(m=2, k=4, iters=2, dim=dim)).fetchall()}
        assert got == want


class TestSkyline:
    @staticmethod
    def _brute(pts):
        out = []
        for i, (x, y) in enumerate(pts):
            dom = any((bx >= x and by >= y and (bx > x or by > y))
                      for j, (bx, by) in enumerate(pts) if j != i)
            if not dom:
                out.append(i)
        return set(out)

    def test_vs_bruteforce_with_ties(self, ray_session):
        import ray.data as rd
        from ontoray.extras.skyline import skyline
        rng = np.random.default_rng(11)
        # small value range forces equal-x groups and exact (x, y) ties
        pts = [(int(a), int(b)) for a, b in rng.integers(0, 6, size=(80, 2))]
        tbl = pa.table({"k": pa.array(range(len(pts)), pa.int64()),
                        "x": pa.array([p[0] for p in pts], pa.int64()),
                        "y": pa.array([p[1] for p in pts], pa.int64())})
        got = skyline(rd.from_arrow(tbl).repartition(5), "k", "x", "y")
        assert set(got.column("k").to_pylist()) == self._brute(pts)

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.extras.skyline import skyline
        rng = np.random.default_rng(12)
        pts = rng.integers(0, 1000, size=(200, 2))
        tbl = pa.table({"k": pa.array(range(200), pa.int64()),
                        "x": pa.array(pts[:, 0], pa.int64()),
                        "y": pa.array(pts[:, 1], pa.int64())})
        a = skyline(rd.from_arrow(tbl).repartition(1), "k", "x", "y")
        b = skyline(rd.from_arrow(tbl).repartition(9), "k", "x", "y")
        assert sorted(a.column("k").to_pylist()) == sorted(b.column("k").to_pylist())


class TestGroupedGini:
    def test_known_values_and_sql(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.quantiles import grouped_gini
        # group a: all equal -> gini 0; group b: one holder -> (n-1)/n = 0.75;
        # group c: ties exercise the run closed-form.
        rows = [("a", 5)] * 4 + [("b", 0)] * 3 + [("b", 100)] + \
               [("c", 1), ("c", 1), ("c", 2), ("c", 2), ("c", 10)]
        tbl = pa.table({"g": pa.array([r[0] for r in rows], pa.string()),
                        "v": pa.array([r[1] for r in rows], pa.int64())})
        got = {r["g"]: r for r in grouped_gini(
            rd.from_arrow(tbl).repartition(3), "g", "v").take_all()}
        assert got["a"]["gini_micro"] == 0
        assert got["b"]["gini_micro"] == 750_000
        con = duckdb.connect()
        con.register("t", tbl)
        sql = ("WITH r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) rn, "
               "count(*) OVER (PARTITION BY g) nn, sum(v) OVER (PARTITION BY g) tot FROM t) "
               "SELECT g, CAST(1000000 * sum((2*rn - nn - 1) * v) // (max(nn) * max(tot)) AS BIGINT) "
               "FROM r GROUP BY 1")
        for g, gini in con.execute(sql).fetchall():
            assert got[g]["gini_micro"] == gini, g


class TestGroupedWinsorize:
    def test_clipping_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from fractions import Fraction
        from ontoray.extras.quantiles import grouped_winsorize, sql_grouped_winsorize
        rng = np.random.default_rng(5)
        vals = np.concatenate([rng.integers(10, 100, 95),
                               np.array([0, 1, 5000, 9000, 10000])])
        tbl = pa.table({"id": pa.array(range(100), pa.int64()),
                        "g": pa.array(["a"] * 100, pa.string()),
                        "v": pa.array(vals, pa.int64())})
        got = {r["id"]: r["clipped"] for r in grouped_winsorize(
            rd.from_arrow(tbl).repartition(4), "g", "v", "id",
            lo=Fraction(5, 100), hi=Fraction(95, 100)).take_all()}
        # extremes clipped, interior untouched
        assert max(got.values()) < 10000 and min(got.values()) > 0
        con = duckdb.connect()
        con.register("t", tbl)
        for rid, _, _, clipped in con.execute(sql_grouped_winsorize(
                "t", "g", "v", "id", 5, 100, 95, 100)).fetchall():
            assert got[rid] == clipped, rid


class TestSampleK:
    def test_exact_k_growth_stability_and_sql(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.textstats import sample_k, sql_sample_k
        tbl = pa.table({"doc_id": pa.array(range(500), pa.int64())})
        got = sample_k(rd.from_arrow(tbl).repartition(7), k=20)
        ids = got.column("doc_id").to_pylist()
        assert len(ids) == 20 == len(set(ids))
        con = duckdb.connect()
        con.register("documents", tbl)
        want = [r[0] for r in con.execute(sql_sample_k(k=20)).fetchall()]
        assert ids == want
        # growth stability: winners of the 500-row corpus that survive in the
        # 800-row corpus are exactly the 800-row winners' intersection
        big = pa.table({"doc_id": pa.array(range(800), pa.int64())})
        got2 = set(sample_k(rd.from_arrow(big), k=20).column("doc_id").to_pylist())
        # ranks are identity-pure: any old winner NOT in the new sample was
        # displaced by a smaller-rank newcomer, never reshuffled arbitrarily
        con.register("documents2", big)
        want2 = {r[0] for r in con.execute(sql_sample_k(k=20, table="documents2")).fetchall()}
        assert got2 == want2


class TestGroupedMAD:
    def test_known_values_and_sql(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.extras.quantiles import grouped_mad, sql_grouped_mad
        # a: {1,2,3,4,100} -> med 3 (rank ceil(5/2)=3), devs {2,1,0,1,97} -> mad 1
        # b: {10,10,10} -> med 10, mad 0
        rows = [("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 100),
                ("b", 10), ("b", 10), ("b", 10)]
        tbl = pa.table({"g": pa.array([r[0] for r in rows], pa.string()),
                        "v": pa.array([r[1] for r in rows], pa.int64())})
        got = {r["g"]: r for r in grouped_mad(
            rd.from_arrow(tbl).repartition(3), "g", "v").to_pylist()}
        assert got["a"]["med"] == 3 and got["a"]["mad"] == 1
        assert got["b"]["med"] == 10 and got["b"]["mad"] == 0
        con = duckdb.connect()
        con.register("t", tbl)
        for g, n, med, mad in con.execute(sql_grouped_mad("t", "g", "v")).fetchall():
            assert got[g]["n"] == n and got[g]["med"] == med and got[g]["mad"] == mad


class TestLabelPropagation:
    def _triples(self) -> pa.Table:
        # two 3-cliques joined by one bridge edge -> LPA should keep two
        # communities where components would merge them into one.
        edges = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
                 ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
                 ("a3", "b1")]
        return pa.table({
            "subj_norm": pa.array([e[0] for e in edges], pa.string()),
            "pred_norm": pa.array(["relatedto"] * len(edges), pa.string()),
            "obj_norm": pa.array([e[1] for e in edges], pa.string()),
        })

    def test_communities_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.stages.analytics import label_propagation

        got = {r["name"]: r["community"] for r in label_propagation(
            rd.from_arrow(self._triples()).repartition(3), rounds=3).take_all()}
        assert len(got) == 6
        # clique A converges to one label, clique B to another
        assert got["a1"] == got["a2"]
        assert got["b2"] == got["b3"]
        assert got["a1"] != got["b2"]

        sql = ("WITH trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst "
               "FROM t WHERE subj_norm <> obj_norm), "
               "und AS (SELECT src AS a, dst AS b FROM trip UNION SELECT dst, src FROM trip), "
               "lnodes AS (SELECT DISTINCT a AS name FROM und), "
               "l0 AS (SELECT name, name AS lab FROM lnodes)")
        for t in (1, 2, 3):
            sql += (f", n{t} AS (SELECT u.a AS v, l.lab, count(*) AS n "
                    f"FROM und u JOIN l{t-1} l ON l.name = u.b GROUP BY 1, 2)"
                    f", l{t} AS (SELECT v AS name, lab FROM ("
                    f"SELECT v, lab, row_number() OVER (PARTITION BY v "
                    f"ORDER BY n DESC, lab) AS rn FROM n{t}) WHERE rn = 1)")
        sql += " SELECT name, lab FROM l3"
        con = duckdb.connect()
        con.register("t", self._triples())
        want = dict(con.execute(sql).fetchall())
        assert got == want

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import label_propagation
        t = self._triples()
        a = {r["name"]: r["community"] for r in label_propagation(
            rd.from_arrow(t).repartition(1)).take_all()}
        b = {r["name"]: r["community"] for r in label_propagation(
            rd.from_arrow(t).repartition(6)).take_all()}
        assert a == b


class TestMarkovTransitions:
    def test_counts_probs_and_sql(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.stages.events import SQL_EVENTS_MARKOV, transition_counts
        # user 1: a -> b -> a (with a ts tie broken by event_id); user 2: b -> b
        ts = pa.array([1000, 2000, 2000, 5000, 6000], pa.timestamp("us"))
        tbl = pa.table({
            "event_id": pa.array([1, 3, 2, 10, 11], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "b", "b"], pa.string()),
        })
        # user 1 order: (1000,1)=a, (2000,2)=a, (2000,3)=b -> pairs a->a, a->b
        got = {(r["from_state"], r["to_state"]): r for r in transition_counts(
            rd.from_arrow(tbl).repartition(3)).take_all()}
        assert got[("a", "a")]["n"] == 1 and got[("a", "b")]["n"] == 1
        assert got[("b", "b")]["n"] == 1
        assert got[("a", "a")]["p_micro"] == 500_000
        con = duckdb.connect()
        con.register("events", tbl)
        want = {(f, t): (n, p) for f, t, n, p in
                con.execute(SQL_EVENTS_MARKOV).fetchall()}
        assert {k: (v["n"], v["p_micro"]) for k, v in got.items()} == want


class TestCoocPMIAndDensity:
    def test_pmi_and_density_vs_duckdb(self, ray_session, tmp_path):
        # build a tiny sf-dir-shaped documents.parquet so the sf_dir query
        # surface itself is exercised end to end
        import duckdb
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        from ontoray import queries as Q

        tbl = pa.table({
            "doc_id": pa.array(range(12), pa.int64()),
            "text": pa.array([f"filler text {i}" for i in range(12)], pa.string()),
            "lang": pa.array(["en"] * 12, pa.string()),
            "source": pa.array(["s1"] * 6 + ["s2"] * 6, pa.string()),
            "n_chars": pa.array([20] * 12, pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        sf = str(tmp_path)

        got_pmi = {(r["m1"], r["m2"]): (r["n_docs"], r["lift_micro"])
                   for r in Q.q_kg_cooc_pmi(sf).take_all()}
        got_den = {r["doc_id"]: r for r in Q.q_kg_entity_density(sf).take_all()}
        assert len(got_den) == 12
        con = duckdb.connect()
        con.register("documents", tbl)
        want_pmi = {(a, b): (n, l) for a, b, n, l in
                    con.execute(Q.sql_kg_cooc_pmi()).fetchall()}
        assert got_pmi == want_pmi and len(got_pmi) > 0
        for did, nm, nt, dm in con.execute(Q.sql_kg_entity_density()).fetchall():
            assert got_den[did]["n_mentions"] == nm
            assert got_den[did]["n_tokens"] == nt
            assert got_den[did]["density_micro"] == dm


class TestHITS:
    def _triples(self) -> pa.Table:
        # hub h1 points at authorities x, y, z; hub h2 points at x, y;
        # stray edge z -> q.  h1 should out-hub h2; x,y out-authority z.
        edges = [("h1", "x"), ("h1", "y"), ("h1", "z"),
                 ("h2", "x"), ("h2", "y"), ("z", "q")]
        return pa.table({
            "subj_norm": pa.array([e[0] for e in edges], pa.string()),
            "pred_norm": pa.array(["relatedto"] * len(edges), pa.string()),
            "obj_norm": pa.array([e[1] for e in edges], pa.string()),
        })

    def test_scores_and_sql_mirror(self, ray_session):
        import duckdb
        import ray.data as rd
        from ontoray.queries import _sql_hits
        from ontoray.stages.analytics import hits_scores

        got = {r["name"]: r for r in hits_scores(
            rd.from_arrow(self._triples()).repartition(3)).to_pylist()}
        assert got["h1"]["hub_micro"] == 1_000_000          # best hub
        assert got["h1"]["hub_micro"] > got["h2"]["hub_micro"] > 0
        assert got["x"]["auth_micro"] == got["y"]["auth_micro"] == 1_000_000
        assert got["x"]["auth_micro"] > got["z"]["auth_micro"]
        assert got["q"]["hub_micro"] == 0                   # no out-edges

        sql = ("WITH tnorm AS (SELECT subj_norm, obj_norm FROM t), "
               + _sql_hits(2).replace(
                   "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm)",
                   "trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM tnorm)"))
        con = duckdb.connect()
        con.register("t", self._triples())
        want = {n: (h, a) for n, h, a in con.execute(sql).fetchall()}
        assert {k: (v["hub_micro"], v["auth_micro"]) for k, v in got.items()} == want


class TestClusteringCoeff:
    def _triples(self) -> pa.Table:
        # K4 on a,b,c,d plus pendant d-e.  lcc: a,b,c = 1.0 (their 3
        # neighbors fully connected); d has neighbors {a,b,c,e}, 3 of the
        # C(4,2)=6 pairs connected -> 0.5; e degree 1 -> 0.
        edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                 ("b", "d"), ("c", "d"), ("d", "e"),
                 ("b", "a"),          # reverse duplicate must collapse
                 ("e", "e")]          # self-loop must drop
        return pa.table({
            "subj_norm": pa.array([e[0] for e in edges], pa.string()),
            "pred_norm": pa.array(["relatedto"] * len(edges), pa.string()),
            "obj_norm": pa.array([e[1] for e in edges], pa.string()),
        })

    def test_exact_values_and_sql_mirror(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import clustering_coeff

        got = {r["name"]: r for r in clustering_coeff(
            rd.from_arrow(self._triples()).repartition(3),
            "subj_norm", "obj_norm").take_all()}
        assert got["a"] == {"name": "a", "degree": 3, "n_tri": 3,
                            "lcc_micro": 1_000_000}
        assert got["d"]["degree"] == 4 and got["d"]["n_tri"] == 3
        assert got["d"]["lcc_micro"] == 500_000
        assert got["e"] == {"name": "e", "degree": 1, "n_tri": 0,
                            "lcc_micro": 0}

        sql = ("WITH trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM t), "
               "und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
               "FROM trip WHERE src <> dst), "
               "tris AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c FROM und e1 "
               "JOIN und e2 ON e2.a = e1.b "
               "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b), "
               "pernode AS (SELECT x, count(*) AS t FROM ("
               "SELECT a AS x FROM tris UNION ALL SELECT b FROM tris "
               "UNION ALL SELECT c FROM tris) GROUP BY x), "
               "udeg AS (SELECT x, count(*) AS d FROM ("
               "SELECT a AS x FROM und UNION ALL SELECT b FROM und) GROUP BY x) "
               "SELECT udeg.x, udeg.d, coalesce(p.t, 0), "
               "CASE WHEN udeg.d >= 2 THEN (2 * coalesce(p.t, 0) * 1000000) "
               "// (udeg.d * (udeg.d - 1)) ELSE 0 END "
               "FROM udeg LEFT JOIN pernode p ON p.x = udeg.x")
        con = duckdb.connect()
        con.register("t", self._triples())
        want = {n: (d, t, l) for n, d, t, l in con.execute(sql).fetchall()}
        assert {k: (v["degree"], v["n_tri"], v["lcc_micro"])
                for k, v in got.items()} == want

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import clustering_coeff
        t = self._triples()
        a = sorted((r["name"], r["degree"], r["n_tri"], r["lcc_micro"])
                   for r in clustering_coeff(rd.from_arrow(t).repartition(1),
                                             "subj_norm", "obj_norm").take_all())
        b = sorted((r["name"], r["degree"], r["n_tri"], r["lcc_micro"])
                   for r in clustering_coeff(rd.from_arrow(t).repartition(6),
                                             "subj_norm", "obj_norm").take_all())
        assert a == b


class TestKCore:
    def _triples(self, edges) -> pa.Table:
        return pa.table({
            "subj_norm": pa.array([e[0] for e in edges], pa.string()),
            "pred_norm": pa.array(["relatedto"] * len(edges), pa.string()),
            "obj_norm": pa.array([e[1] for e in edges], pa.string()),
        })

    def test_triangle_with_tail(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import kcore
        # triangle x,y,z with a 2-path tail z-w-v: 2-core = the triangle
        t = self._triples([("x", "y"), ("y", "z"), ("z", "x"),
                           ("z", "w"), ("w", "v")])
        got = {r["name"]: r["core_degree"] for r in kcore(
            rd.from_arrow(t).repartition(3), k=2,
            src_col="subj_norm", dst_col="obj_norm").to_pylist()}
        assert got == {"x": 2, "y": 2, "z": 2}

    def test_path_peels_to_empty(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import kcore
        t = self._triples([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
        got = kcore(rd.from_arrow(t), k=2,
                    src_col="subj_norm", dst_col="obj_norm").to_pylist()
        assert got == []

    def test_convergence_guard_raises(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import kcore
        t = self._triples([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
        with pytest.raises(RuntimeError, match="not converged"):
            kcore(rd.from_arrow(t), k=2, max_rounds=1,
                  src_col="subj_norm", dst_col="obj_norm")

    def test_partitioning_invariance_and_sql(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import kcore
        edges = [("x", "y"), ("y", "z"), ("z", "x"), ("z", "w"), ("w", "v"),
                 ("p", "q"), ("q", "r"), ("r", "p"), ("r", "x")]
        t = self._triples(edges)
        a = kcore(rd.from_arrow(t).repartition(1), k=2,
                  src_col="subj_norm", dst_col="obj_norm").to_pylist()
        b = kcore(rd.from_arrow(t).repartition(5), k=2,
                  src_col="subj_norm", dst_col="obj_norm").to_pylist()
        assert a == b
        ctes = ["trip AS (SELECT DISTINCT subj_norm AS src, obj_norm AS dst FROM t)",
                "u0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
                "greatest(src, dst) AS b FROM trip WHERE src <> dst)"]
        rounds = 6
        for r in range(1, rounds + 1):
            ctes.append(f"kd{r} AS MATERIALIZED (SELECT x, count(*) AS d FROM ("
                        f"SELECT a AS x FROM u{r-1} UNION ALL SELECT b FROM u{r-1}) GROUP BY x)")
            ctes.append(f"u{r} AS MATERIALIZED (SELECT e.a, e.b FROM u{r-1} e "
                        f"JOIN kd{r} da ON da.x = e.a JOIN kd{r} db ON db.x = e.b "
                        f"WHERE da.d >= 2 AND db.d >= 2)")
        sql = ("WITH " + ", ".join(ctes) +
               f" SELECT x, count(*) FROM (SELECT a AS x FROM u{rounds} "
               f"UNION ALL SELECT b FROM u{rounds}) GROUP BY x")
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.execute(sql).fetchall())
        assert {r["name"]: r["core_degree"] for r in a} == want


class TestTransitiveReduction:
    def _triples(self, edges, pred="subclass_of") -> pa.Table:
        return pa.table({
            "subj_norm": pa.array([e[0] for e in edges], pa.string()),
            "pred_norm": pa.array([pred] * len(edges), pa.string()),
            "obj_norm": pa.array([e[1] for e in edges], pa.string()),
        })

    def test_shortcut_flagged(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import transitive_reduction
        # chain a->b->c with shortcut a->c; unrelated d->e; self-loop f->f
        t = self._triples([("a", "b"), ("b", "c"), ("a", "c"),
                           ("d", "e"), ("f", "f")])
        got = {(r["child"], r["parent"]): r["redundant"]
               for r in transitive_reduction(
                   rd.from_arrow(t).repartition(3)).take_all()}
        assert got == {("a", "b"): False, ("b", "c"): False,
                       ("a", "c"): True, ("d", "e"): False}

    def test_flat_taxonomy_all_false(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import transitive_reduction
        t = self._triples([("a", "p"), ("b", "p"), ("c", "q")])
        got = {(r["child"], r["parent"]): r["redundant"]
               for r in transitive_reduction(rd.from_arrow(t)).take_all()}
        assert got == {("a", "p"): False, ("b", "p"): False,
                       ("c", "q"): False}

    def test_non_subclass_preds_ignored(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import transitive_reduction
        t = self._triples([("a", "b"), ("b", "c"), ("a", "c")],
                          pred="relatedto")
        assert transitive_reduction(rd.from_arrow(t)).take_all() == []


class TestHostRank:
    def _pages(self) -> pa.Table:
        rows = [
            ("https://a.example.org/p1",
             "see [x](https://hub.example/t) and [rel](img/pic.png)"),
            ("https://b.example.org/p2",
             "[y](https://hub.example/u) plus [z](http://a.example.org/q)"),
            ("https://hub.example/front", "[home](/) no external links"),
            ("nohost-url", "[x](https://hub.example/t)"),
        ]
        return pa.table({"url": pa.array([r[0] for r in rows], pa.string()),
                         "text": pa.array([r[1] for r in rows], pa.string())})

    def test_edges_and_sql_parity(self, ray_session):
        import ray.data as rd
        from ontoray.extras.weblinks import host_edges, sql_host_edges
        got = sorted((r["src"], r["dst"]) for r in
                     host_edges(rd.from_arrow(self._pages())
                                .repartition(2)).take_all())
        # relative links resolve on-host (self-link, dropped); hostless
        # page urls dropped
        assert got == [("a.example.org", "hub.example"),
                       ("b.example.org", "a.example.org"),
                       ("b.example.org", "hub.example")]
        con = duckdb.connect()
        con.register("p", self._pages())
        sql = "WITH " + sql_host_edges("SELECT url, text FROM p") + \
              " SELECT src, dst FROM trip ORDER BY 1, 2"
        assert got == con.execute(sql).fetchall()

    def test_hub_outranks_leaves(self, ray_session):
        import ray.data as rd
        from ontoray.extras.weblinks import host_edges
        from ontoray.stages.analytics import pagerank
        ranks = {r["name"]: r["rank"] for r in pagerank(
            host_edges(rd.from_arrow(self._pages()))).to_pylist()}
        assert ranks["hub.example"] > ranks["a.example.org"]
        assert ranks["a.example.org"] > ranks["b.example.org"]


class TestPCA1:
    def _embeds(self, n=60, seed=7) -> pa.Table:
        # dominant axis e0 with +-2 amplitude, small noise on e1..e3
        rng = np.random.default_rng(seed)
        amp = rng.uniform(-2, 2, n)
        vecs = np.zeros((n, 4))
        vecs[:, 0] = amp
        vecs[:, 1:] = rng.normal(0, 0.05, (n, 3))
        return pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})

    def test_dominant_direction_and_sql_parity(self, ray_session):
        import ray.data as rd
        from ontoray.extras.pca import pca1_power, sql_embed_pca1
        tbl = self._embeds()
        got = {r["vec_id"]: r["proj"] for r in pca1_power(
            rd.from_arrow(tbl).repartition(4)).take_all()}
        # projections must rank by the dominant coordinate (up to sign)
        amp = np.array(tbl.column("embedding").to_pylist())[:, 0]
        proj = np.array([got[i] for i in range(len(amp))], dtype=np.float64)
        corr = np.corrcoef(amp, proj)[0, 1]
        assert abs(corr) > 0.999
        con = duckdb.connect()
        con.register("embeddings", tbl)
        want = dict(con.execute(sql_embed_pca1()).fetchall())
        assert got == want

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.extras.pca import pca1_power
        tbl = self._embeds(n=30, seed=11)
        a = sorted(pca1_power(rd.from_arrow(tbl).repartition(1)).take_all(),
                   key=lambda r: r["vec_id"])
        b = sorted(pca1_power(rd.from_arrow(tbl).repartition(7)).take_all(),
                   key=lambda r: r["vec_id"])
        assert a == b

    def test_empty_input(self, ray_session):
        import ray.data as rd
        from ontoray.extras.pca import pca1_power
        tbl = self._embeds(n=0)
        assert pca1_power(rd.from_arrow(tbl)).to_pylist() == []


class TestKMeansOutliers:
    def test_planted_outlier_found_and_sql_parity(self, ray_session):
        import ray.data as rd
        from ontoray.extras.kmeans import kmeans_outliers, sql_kmeans_outliers
        rng = np.random.default_rng(3)
        vecs = np.concatenate([rng.normal(0, 0.1, (20, 4)),
                               rng.normal(1, 0.1, (20, 4))])
        # k=2 keeps both centroids pinned to the blobs, so the planted
        # point scores by distance to its blob's centroid (with k large
        # enough to isolate it, a singleton cluster gives d2 ~ 0 — correct
        # for this operator, wrong for this fixture).
        vecs[7] = [9.0, -9.0, 9.0, -9.0]          # planted garbage vector
        tbl = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        got = kmeans_outliers(rd.from_arrow(tbl).repartition(4), k=2,
                              topn=5).to_pylist()
        assert got[0]["vec_id"] == 7                # worst outlier leads
        assert got[0]["d2"] > got[1]["d2"]
        con = duckdb.connect()
        con.register("embeddings", tbl)
        want = [{"vec_id": v, "cluster": c, "d2": d} for v, c, d in
                con.execute(sql_kmeans_outliers(k=2, topn=5)).fetchall()]
        assert got == want

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.extras.kmeans import kmeans_outliers
        rng = np.random.default_rng(5)
        tbl = pa.table({
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in rng.normal(0, 1, (30, 3))],
                pa.list_(pa.float32()))})
        a = kmeans_outliers(rd.from_arrow(tbl).repartition(1), k=3,
                            topn=7).to_pylist()
        b = kmeans_outliers(rd.from_arrow(tbl).repartition(6), k=3,
                            topn=7).to_pylist()
        assert a == b


class TestNoDriverAdjacency:
    """VERDICT r3 #2 done-bar: triangle_census, clustering_coeff and
    random_walks must never collect the edge list to the driver — the old
    implementations built a broadcast adjacency dict via util.column_lists."""

    def test_trio_never_calls_column_lists(self, ray_session, monkeypatch):
        import pyarrow as pa
        import ray.data as rd
        import ontoray.util as U
        from ontoray.stages import analytics as A

        def forbidden(*a, **k):
            raise AssertionError(
                "column_lists called on a graph-trio path — driver-side "
                "edge collect is forbidden here")

        monkeypatch.setattr(U, "column_lists", forbidden)
        edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
        t = pa.table({"src": pa.array([s for s, _ in edges]),
                      "dst": pa.array([d for _, d in edges])})
        ds = rd.from_arrow(t).repartition(2)
        cen = A.triangle_census(ds)
        assert cen.to_pylist()[0]["n_triangles"] == 1
        lcc = {r["name"]: r["n_tri"]
               for r in A.clustering_coeff(ds).take_all()}
        assert lcc == {"a": 1, "b": 1, "c": 1, "d": 0}
        walks = A.random_walks(ds, length=2).take_all()
        assert {r["start"] for r in walks} == {"a", "b", "c", "d"}
        assert len(walks) == 4 * 3

"""Session-8 additions: Lorenz concentration curve, Heaps vocabulary-growth
bands, degree assortativity, and MMR diversified retrieval.  Each test checks
hand-computed semantics on a micro fixture AND bit-parity with the DuckDB
mirror."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _duck(views: dict) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name, tbl in views.items():
        con.register(name, tbl)
    return con


class TestLorenzHeaps:
    def test_orders_lorenz(self, ray_session, tmp_path):
        from ontoray.queries import SQL_ORDERS_LORENZ, q_orders_lorenz
        # 5 customers, one order each, distinct spends 100..500 cents
        orders = pa.table({
            "o_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = sorted(tuple(r.values()) for r in q_orders_lorenz(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders})
                      .execute(SQL_ORDERS_LORENZ).fetchall())
        assert got == want
        # deciles of 5 distinct values land customers in buckets 0,2,4,6,8;
        # cum_rev walks 100/1500, 300/1500, 600/1500, 1000/1500, 1500/1500
        assert got == [
            (0, 1, 100, 200000, 66666),
            (2, 1, 200, 400000, 200000),
            (4, 1, 300, 600000, 400000),
            (6, 1, 400, 800000, 666666),
            (8, 1, 500, 1000000, 1000000)]

    def test_orders_lorenz_multi_order_ties(self, ray_session, tmp_path):
        from ontoray.queries import SQL_ORDERS_LORENZ, q_orders_lorenz
        # per-customer sums collide (two customers at 300c) — value-ntile
        # puts ties in the SAME bucket on both sides
        orders = pa.table({
            "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
            "o_totalprice": pa.array([1.0, 2.0, 3.0, 9.0])})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = sorted(tuple(r.values()) for r in q_orders_lorenz(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders})
                      .execute(SQL_ORDERS_LORENZ).fetchall())
        assert got == want
        buckets = {row[0]: row[1] for row in got}
        assert sum(buckets.values()) == 3          # every customer counted
        # the two 300c customers share one bucket
        assert 2 in buckets.values()

    def test_docs_heaps(self, ray_session, tmp_path):
        from ontoray.queries import SQL_DOCS_HEAPS, q_docs_heaps
        # doc 0: bigrams {a b, b c} fd=0 -> band 0; doc 1 adds {b d} fd=1
        # -> band 1; doc 3 adds {x y} fd=3 -> band 2
        docs = pa.table({
            "doc_id": pa.array([0, 1, 3], pa.int64()),
            "text": pa.array(["a b c", "a b d", "x y"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_heaps(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_HEAPS).fetchall())
        assert got == want
        assert got == [(0, 2, 2), (1, 1, 3), (2, 1, 4)]


class TestAssortativityMmr:
    def test_kg_assortativity_star(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_assortativity_from
        # star graph: hub degree 3, leaves degree 1 -> assortativity -1;
        # the duplicate (c, a) triple must dedup to one edge first
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["c", "c", "c", "c"], pa.string()),
            "obj_norm": pa.array(["a", "b", "d", "a"], pa.string())}))
        rows = q_kg_assortativity_from(triples).to_pandas()\
            .to_dict("records")
        assert len(rows) == 1
        r = rows[0]
        assert r["n"] == 6                          # 3 edges x 2 directions
        assert r["corr"] == -1.0
        # mean endpoint degree is (3+1)/2 = 2 on both ends (cents scale)
        assert r["mean_x_cents"] == 200.0
        assert r["mean_y_cents"] == 200.0

    def test_kg_assortativity_regular(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_assortativity_from
        # 3-cycle: every degree 2 -> zero variance -> corr NULL
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["a", "b", "c"], pa.string()),
            "obj_norm": pa.array(["b", "c", "a"], pa.string())}))
        r = q_kg_assortativity_from(triples).to_pandas().to_dict("records")[0]
        assert r["n"] == 6
        assert r["corr"] is None or r["corr"] != r["corr"]  # NULL/NaN

    def test_embed_mmr_mirror_parity(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.extras.ann import query_vector
        from ontoray.queries import q_embed_mmr, sql_embed_mmr
        q = query_vector(2)
        p = np.array([-q[1], q[0]])                 # unit vector ⊥ q
        c, s = np.cos(np.radians(26.0)), np.sin(np.radians(26.0))
        # A (id 0) and C (id 2) mirror each other at ±26° from q — equal
        # relevance, mutual sim cos(52°)≈0.62; B (id 1) duplicates A
        # (sim 1.0).  Pure relevance ranks B second; MMR must demote it
        # below C (penalty gap 3e6·(1−0.62) ≫ micro-rounding noise).
        vecs = np.array([
            c * q + s * p,                          # id 0: A
            2.0 * (c * q + s * p),                  # id 1: B = dup of A
            c * q - s * p,                          # id 2: C, mirror of A
            -q,                                     # id 3: anti, rel -1
        ])
        emb = pa.table({
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = sorted(tuple(r.values()) for r in q_embed_mmr(
            str(tmp_path), m=4, k=3).to_pandas().to_dict("records"))
        want = sorted(_duck({"embeddings": emb})
                      .execute(sql_embed_mmr(str(tmp_path), m=4, k=3))
                      .fetchall())
        assert got == want
        by_id = {r[1]: r[0] for r in got}
        assert set(by_id) == {0, 1, 2}              # anti vector excluded
        assert by_id[1] == 3                        # dup demoted to last
        assert by_id[2] <= 2                        # mirror promoted

    def test_embed_mmr_k_exceeds_corpus(self, ray_session, tmp_path):
        from ontoray.queries import q_embed_mmr
        emb = pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        rows = q_embed_mmr(str(tmp_path), m=10, k=5).to_pandas()
        assert len(rows) == 2                       # truncates gracefully
        assert sorted(rows["rank"]) == [1, 2]


class TestStreaksQuantTwohopTopk:
    def test_orders_streaks(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import SQL_ORDERS_STREAKS, q_orders_streaks
        # cust 1: Jan+Jan(dup month)+Feb+Mar 1997 then Jun -> streak 3;
        # cust 2: Jan and May -> streak 1; Dec->Jan year rollover: cust 3
        # Dec 1996 + Jan 1997 -> streak 2 (month index is year*12+m)
        orders = pa.table({
            "o_custkey": pa.array([1, 1, 1, 1, 1, 2, 2, 3, 3], pa.int64()),
            "o_orderdate": pa.array(
                [dt.datetime(1997, 1, 5), dt.datetime(1997, 1, 20),
                 dt.datetime(1997, 2, 1), dt.datetime(1997, 3, 1),
                 dt.datetime(1997, 6, 1), dt.datetime(1997, 1, 1),
                 dt.datetime(1997, 5, 1), dt.datetime(1996, 12, 1),
                 dt.datetime(1997, 1, 1)], pa.timestamp("us"))})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = sorted(tuple(r.values()) for r in q_orders_streaks(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders})
                      .execute(SQL_ORDERS_STREAKS).fetchall())
        assert got == want
        assert got == [(1, 1), (2, 1), (3, 1)]

    def test_embed_quantize_error(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_EMBED_QUANTIZE_ERROR,
                                     q_embed_quantize_error)
        # zero vector -> sse 0 band 0; [1.0, 0.5]: 5e5 quantizes to 64,
        # recon 503937, err -3937 -> sse 15499969, band 23
        emb = pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0, 0.0], [1.0, 0.5]],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = sorted(tuple(r.values()) for r in q_embed_quantize_error(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"embeddings": emb})
                      .execute(SQL_EMBED_QUANTIZE_ERROR).fetchall())
        assert got == want
        assert got == [(0, 1, 0), (23, 1, 15499969)]

    def test_kg_twohop_path(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_twohop_from
        # path a-b-c-d (+ dup edge and a self loop, both must not count):
        # reach a,d = 2 (band 1), b,c = 3 (band 2)
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["a", "b", "c", "a", "a"], pa.string()),
            "obj_norm": pa.array(["b", "c", "d", "b", "a"], pa.string())}))
        got = sorted(tuple(r.values()) for r in q_kg_twohop_from(
            triples).to_pandas().to_dict("records"))
        assert got == [(1, 2, 4), (2, 2, 6)]

    def test_events_top_types_window(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_EVENTS_TOP_TYPES_WINDOW,
                                     q_events_top_types_window)
        # day 1: x3 y3 z2 w1 -> ranks x,y,z (tie x<y by name), w cut;
        # day 2: only q1 -> single row
        base = dt.datetime(2024, 1, 1)
        types = ["x", "x", "x", "y", "y", "y", "z", "z", "w"]
        ts = [base + dt.timedelta(minutes=i) for i in range(9)]
        types.append("q")
        ts.append(base + dt.timedelta(days=1, hours=2))
        ev = pa.table({
            "event_type": pa.array(types, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us"))})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_top_types_window(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_TOP_TYPES_WINDOW).fetchall())
        assert got == want
        d = 19723                                   # 2024-01-01 epoch days
        assert got == [(d, "x", 3, 1), (d, "y", 3, 2), (d, "z", 2, 3),
                       (d + 1, "q", 1, 1)]


class TestJaccardAbcPhashHapax:
    def test_kg_jaccard_shared_pair(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import jaccard_linkpred
        # a and b share neighbors z1, z2 (and nothing else): common 2,
        # union 2+2-2 -> jac 1.0; symmetric for (z1, z2)
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["a", "a", "b", "b"], pa.string()),
            "obj_norm": pa.array(["z1", "z2", "z1", "z2"], pa.string())}))
        got = sorted(tuple(r.values()) for r in jaccard_linkpred(
            triples).to_pandas().to_dict("records"))
        assert got == [("a", "b", 2, 1000000), ("z1", "z2", 2, 1000000)]

    def test_kg_jaccard_hub_cap(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import jaccard_linkpred
        # cap=1 disqualifies every shared neighbor (all have degree 2)
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["a", "a", "b", "b"], pa.string()),
            "obj_norm": pa.array(["z1", "z2", "z1", "z2"], pa.string())}))
        assert jaccard_linkpred(triples, cap=1).count() == 0

    def test_kg_jaccard_existing_edge_removed(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import jaccard_linkpred
        # triangle a-b, a-z, b-z: (a,b) share z but are ALREADY linked ->
        # removed by the anti-join; remaining pairs share nothing capped
        # above threshold except... a,b each neighbor {z, other}: (a,b)
        # out; no other pair has common >= 1 with jac >= 0.1? (a,z) linked,
        # (b,z) linked -> empty output
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["a", "a", "b"], pa.string()),
            "obj_norm": pa.array(["b", "z", "z"], pa.string())}))
        assert jaccard_linkpred(triples).count() == 0

    def test_parts_abc(self, ray_session, tmp_path):
        from ontoray.queries import SQL_PARTS_ABC, q_parts_abc
        # revenues 80/15/5 land exactly on the 80% and 95% cut points
        lineitem = pa.table({
            "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([40.0, 40.0, 15.0, 5.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])})
        pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
        got = sorted(tuple(r.values()) for r in q_parts_abc(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"lineitem": lineitem})
                      .execute(SQL_PARTS_ABC).fetchall())
        assert got == want
        assert got == [("A", 1, 8000), ("B", 1, 1500), ("C", 1, 500)]

    def test_docs_hapax(self, ray_session, tmp_path):
        from ontoray.queries import SQL_DOCS_HAPAX, q_docs_hapax
        docs = pa.table({
            "text": pa.array(["a a b", "x y x z"], pa.string()),
            "source": pa.array(["s1", "s2"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_hapax(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_HAPAX).fetchall())
        assert got == want
        assert got == [("s1", 2, 1, 500000), ("s2", 3, 2, 666666)]

    def test_hamming_candidate_pairs_unit(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import hamming_candidate_pairs
        # sig 0 vs 1: hamming 1 (pair); sig 0xFF00...: far from both;
        # two EQUAL sigs collide in all 4 bands but emit the pair once
        sigs = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "sig": pa.array([0, 1, 0x7FF0000000000000, 0], pa.int64())}))
        got = sorted(tuple(r.values()) for r in hamming_candidate_pairs(
            sigs, "k", "sig").to_pandas().to_dict("records"))
        assert got == [(1, 2, 1), (1, 4, 0), (2, 4, 1)]

    def test_multimodal_phash_neardup(self, ray_session, tmp_path):
        from ontoray.queries import (q_multimodal_phash_neardup,
                                     sql_multimodal_phash_neardup)
        # identical texts -> identical payload bytes -> identical fake
        # phash -> one hamming-0 pair; the third doc is unrelated
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["same body", "same body", "different"],
                             pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_multimodal_phash_neardup(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_multimodal_phash_neardup()).fetchall())
        assert got == want
        assert got == [("doc-0", "doc-1", 0)]


class TestPropsZipfNormLifespan:
    def test_events_props_extract(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_EVENTS_PROPS_EXTRACT,
                                     q_events_props_extract)
        ev = pa.table({
            "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
            "props": pa.array(['{"k": 5}', '{"k": 7}', "garbage",
                               '{"k": 2}'], pa.string())})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_props_extract(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_PROPS_EXTRACT).fetchall())
        assert got == want
        # the unparseable row drops; type a folds (5, 7)
        assert got == [("a", 2, 12, 5, 7), ("b", 1, 2, 2, 2)]

    def test_lm_zipf_coverage(self, ray_session, tmp_path):
        from ontoray.queries import SQL_LM_ZIPF_COVERAGE, q_lm_zipf_coverage
        docs = pa.table({
            "text": pa.array(["a a a a b b c", ""], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_lm_zipf_coverage(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_LM_ZIPF_COVERAGE).fetchall())
        assert got == want
        # 3 types only: probes 1 and 2 exist, probe 4 is absent both sides
        assert got == [(1, "a", 4, 571428), (2, "b", 2, 857142)]

    def test_embed_norm_hist(self, ray_session, tmp_path):
        from ontoray.queries import SQL_EMBED_NORM_HIST, q_embed_norm_hist
        emb = pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0, 0.0], [1.0, 0.0]],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = sorted(tuple(r.values()) for r in q_embed_norm_hist(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"embeddings": emb})
                      .execute(SQL_EMBED_NORM_HIST).fetchall())
        assert got == want
        # nsq 0 -> band 0; nsq 10^12 -> bit_length(10^12+1)-1 = 39
        assert got == [(0, 1), (39, 1)]

    def test_events_user_lifespan(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_EVENTS_USER_LIFESPAN,
                                     q_events_user_lifespan)
        base = dt.datetime(2024, 1, 1)
        ev = pa.table({
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([base, base + dt.timedelta(days=2, hours=12),
                            base], pa.timestamp("us"))})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_user_lifespan(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_USER_LIFESPAN).fetchall())
        assert got == want
        assert got == [(0, 1), (2, 1)]


class TestPpjoin:
    def test_docs_ppjoin(self, ray_session, tmp_path):
        from ontoray.queries import q_docs_ppjoin, sql_docs_ppjoin
        # bigram sets: doc0 {a b, b c, c d}, doc1 {a b, b c, c e} ->
        # common 2, union 4, jac exactly 0.5 (the threshold boundary);
        # doc2 disjoint; doc3 single-token -> no bigrams, absent
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d", "a b c e", "x y z", "solo"],
                             pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_ppjoin(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_docs_ppjoin()).fetchall())
        assert got == want
        assert got == [(0, 1, 2, 500000)]

    def test_docs_ppjoin_prefix_no_false_negatives(self, ray_session,
                                                   tmp_path):
        from ontoray.queries import q_docs_ppjoin, sql_docs_ppjoin
        # identical docs (jac 1.0) plus a decoy sharing only the COMMON
        # grams' high-df end — the survivor pair must still be found via
        # a prefix gram
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["p q r s", "p q r s", "p q zz"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_ppjoin(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_docs_ppjoin()).fetchall())
        assert got == want
        assert (0, 1, 3, 1000000) in got


class TestClosenessDriftLshRecall:
    def test_kg_closeness_path(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_closeness_from
        # path a-b-c, every node a seed (n_seeds=4 > 3 nodes):
        # ends reach {self,1,2} -> 2*1e6//3; middle -> 2*1e6//2
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["a", "b"], pa.string()),
            "obj_norm": pa.array(["b", "c"], pa.string())}))
        got = sorted(tuple(r.values()) for r in q_kg_closeness_from(
            triples).to_pandas().to_dict("records"))
        assert got == [("a", 3, 3, 666666), ("b", 3, 2, 1000000),
                       ("c", 3, 3, 666666)]

    def test_events_type_share_drift(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_EVENTS_TYPE_SHARE_DRIFT,
                                     q_events_type_share_drift)
        d1 = dt.datetime(2024, 1, 15, 9)
        d2 = dt.datetime(2024, 1, 16, 9)
        ev = pa.table({
            "event_type": pa.array(["x", "x", "x", "y", "x", "y"],
                                   pa.string()),
            "ts": pa.array([d1, d1, d1, d1, d2, d2],
                           pa.timestamp("us"))})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_type_share_drift(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_TYPE_SHARE_DRIFT).fetchall())
        assert got == want
        day2 = (d2 - dt.datetime(1970, 1, 1)).days
        assert got == [("x", day2, 500000, 750000, -250000),
                       ("y", day2, 500000, 250000, 250000)]

    def test_dedup_lsh_recall(self, ray_session, tmp_path):
        from ontoray.queries import q_dedup_lsh_recall, sql_dedup_lsh_recall
        # one exact-duplicate pair: LSH must find it (identical signatures
        # collide in every band) -> recall = precision = 1.0
        t = "alpha beta gamma delta epsilon zeta"
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([t, t, "one two three four five six"],
                             pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_dedup_lsh_recall(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_dedup_lsh_recall()).fetchall())
        assert got == want
        assert got == [(1, 1, 1, 1000000, 1000000)]


class TestAutocorrHhi:
    def test_events_autocorr(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import _sql_events_autocorr, q_events_autocorr
        # type x daily counts 1,2,3,4 -> perfectly increasing, lag-1
        # corr = 1.0; type y alternates 2,1,2,1 -> corr = -1.0
        base = dt.datetime(2024, 1, 1)
        rows_t, rows_ts = [], []
        for day, n in enumerate([1, 2, 3, 4]):
            for i in range(n):
                rows_t.append("x")
                rows_ts.append(base + dt.timedelta(days=day, minutes=i))
        for day, n in enumerate([2, 1, 2, 1]):
            for i in range(n):
                rows_t.append("y")
                rows_ts.append(base + dt.timedelta(days=day, minutes=i))
        ev = pa.table({"event_type": pa.array(rows_t, pa.string()),
                       "ts": pa.array(rows_ts, pa.timestamp("us"))})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = {r["event_type"]: r for r in q_events_autocorr(
            str(tmp_path)).to_pandas().to_dict("records")}
        want = {r[0]: r for r in _duck({"events": ev})
                .execute(_sql_events_autocorr()).fetchall()}
        assert set(got) == set(want) == {"x", "y"}
        for k in got:
            assert got[k]["n"] == want[k][1] == 3
            assert got[k]["corr"] == want[k][4]
        assert got["x"]["corr"] == 1.0
        assert got["y"]["corr"] == -1.0

    def test_supplier_hhi(self, ray_session, tmp_path):
        from ontoray.queries import SQL_SUPPLIER_HHI, q_supplier_hhi
        # NATION_7: one supplier -> monopoly 1e6;
        # NATION_8: two equal suppliers -> 500000
        supplier = pa.table({
            "s_suppkey": pa.array([20, 21, 22], pa.int64()),
            "s_name": pa.array(["s20", "s21", "s22"], pa.string()),
            "s_nationkey": pa.array([0, 1, 1], pa.int64()),
            "s_acctbal": pa.array([0.0, 0.0, 0.0])})
        nation = pa.table({
            "n_nationkey": pa.array([0, 1], pa.int64()),
            "n_name": pa.array(["NATION_7", "NATION_8"], pa.string()),
            "n_regionkey": pa.array([0, 0], pa.int64())})
        lineitem = pa.table({
            "l_suppkey": pa.array([20, 21, 22], pa.int64()),
            "l_extendedprice": pa.array([10.0, 5.0, 5.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0])})
        for name, tbl in [("supplier", supplier), ("nation", nation),
                          ("lineitem", lineitem)]:
            pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))
        got = sorted(tuple(r.values()) for r in q_supplier_hhi(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"supplier": supplier, "nation": nation,
                             "lineitem": lineitem})
                      .execute(SQL_SUPPLIER_HHI).fetchall())
        assert got == want
        assert got == [("NATION_7", 1, 1000, 1000000),
                       ("NATION_8", 2, 1000, 500000)]


class TestExpectationsProfile:
    def test_lineitem_expectations(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_LINEITEM_EXPECTATIONS,
                                     q_lineitem_expectations)
        lineitem = pa.table({
            "l_discount": pa.array([0.1, -0.2, 1.5, 0.0]),
            "l_quantity": pa.array([1.0, 0.0, 2.0, 3.0]),
            "l_extendedprice": pa.array([10.0, -1.0, 5.0, 5.0]),
            "l_tax": pa.array([0.0, 0.0, 2.0, 0.5]),
            "l_shipdate": pa.array(
                [dt.datetime(2024, 1, 1), None,
                 dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3)],
                pa.timestamp("us")),
            "l_returnflag": pa.array(["A", "Z", "N", "R"], pa.string())})
        pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
        got = sorted(tuple(r.values()) for r in q_lineitem_expectations(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"lineitem": lineitem})
                      .execute(SQL_LINEITEM_EXPECTATIONS).fetchall())
        assert got == want
        assert got == [
            ("discount_in_0_1", 2, 4), ("price_nonnegative", 1, 4),
            ("quantity_positive", 1, 4), ("returnflag_domain", 1, 4),
            ("shipdate_present", 1, 4), ("tax_in_0_1", 1, 4)]

    def test_docs_table_profile(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_DOCS_TABLE_PROFILE,
                                     q_docs_table_profile)
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["aa", "aa", None], pa.string()),
            "lang": pa.array(["en", "de", "en"], pa.string()),
            "source": pa.array(["s", "s", "s"], pa.string()),
            "n_chars": pa.array([2, 2, None], pa.int64())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_table_profile(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_TABLE_PROFILE).fetchall())
        assert got == want
        # NULL excluded from distinct on both sides (COUNT(DISTINCT))
        assert got == [
            ("doc_id", 3, 0, 3), ("lang", 3, 0, 2), ("n_chars", 3, 1, 1),
            ("source", 3, 0, 1), ("text", 3, 1, 1)]


class TestUniquenessMigration:
    def test_orders_key_uniqueness(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_ORDERS_KEY_UNIQUENESS,
                                     q_orders_key_uniqueness)
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 2, 3, 3, 3], pa.int64())})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = sorted(tuple(r.values()) for r in q_orders_key_uniqueness(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders})
                      .execute(SQL_ORDERS_KEY_UNIQUENESS).fetchall())
        assert got == want
        assert got == [(6, 3, 2, 5)]

    def test_custs_decile_migration(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (_sql_custs_decile_migration,
                                     q_custs_decile_migration)
        # 1997: custs 1..3 spend 100/200/300 -> deciles 0/3/6 (3 values,
        # lorenz-style value-ntile); 1998: cust 1 jumps to the top value,
        # custs 2,3 shrink.  Matrix counts only custs present both years.
        d97, d98 = dt.datetime(1997, 6, 1), dt.datetime(1998, 6, 1)
        orders = pa.table({
            "o_custkey": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
            "o_orderdate": pa.array([d97, d97, d97, d98, d98, d98],
                                    pa.timestamp("us")),
            "o_totalprice": pa.array([1.0, 2.0, 3.0, 9.0, 1.0, 2.0])})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = sorted(tuple(r.values()) for r in q_custs_decile_migration(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders})
                      .execute(_sql_custs_decile_migration()).fetchall())
        assert got == want
        # every cust appears exactly once in the matrix
        assert sum(r[2] for r in got) == 3
        # cust 1 (bottom decile 1997) lands in the TOP decile of 1998
        migr = {(r[0], r[1]) for r in got}
        assert any(f == 0 and t >= 6 for f, t in migr)


class TestMultimodalPackBands:
    def test_pack_media_prefix_sum(self, ray_session):
        import hashlib
        import ray.data as rd
        from ontoray.extras.multimodal import pack_media
        feats = rd.from_arrow(pa.table({
            "url": pa.array(["u0", "u1", "u2"], pa.string()),
            "width": pa.array([100, 200, 300], pa.int32()),
            "height": pa.array([10, 20, 30], pa.int32())}))
        rows = {r["url"]: r for r in pack_media(
            feats, budget_px=5000).to_pandas().to_dict("records")}
        # exclusive prefix sums along the md5 order, batches every 5000 px
        order = sorted(rows, key=lambda u: (
            hashlib.md5(f"mpack1:{u}".encode()).digest()[:8], u))
        acc = 0
        for u in order:
            assert rows[u]["px_start"] == acc
            assert rows[u]["media_batch"] == acc // 5000
            acc += rows[u]["px"]
        assert acc == 100 * 10 + 200 * 20 + 300 * 30

    def test_multimodal_pack_mirror(self, ray_session, tmp_path):
        from ontoray.extras.multimodal import sql_pack_media
        import __ray_entry__ as entry
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["alpha beta", "gamma", "delta eps"],
                             pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in entry._q_multimodal_pack(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_pack_media()).fetchall())
        assert got == want

    def test_multimodal_audio_bands(self, ray_session, tmp_path):
        from ontoray.extras.multimodal import sql_audio_rms_bands
        import __ray_entry__ as entry
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a", "bb", "ccc", "dddd"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in
                     entry._q_multimodal_audio_bands(
                         str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_audio_rms_bands()).fetchall())
        assert got == want
        assert sum(r[1] for r in got) == 4          # every clip banded


class TestDegreeGiniBigramAcc:
    def test_kg_degree_gini_star(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_degree_gini_from
        # star on 4 nodes: degrees 3,1,1,1 -> sorted 1,1,1,3;
        # num = Σ(2rn-n-1)x = (-3-1+1)·1 + 3·3 = 6; gini = 1e6·6//(4·6)
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["c", "c", "c"], pa.string()),
            "obj_norm": pa.array(["a", "b", "d"], pa.string())}))
        rows = q_kg_degree_gini_from(triples).to_pandas().to_dict("records")
        assert rows == [{"k": "all", "n": 4, "total": 6,
                         "gini_micro": 250000}]

    def test_kg_degree_gini_regular(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_degree_gini_from
        # 3-cycle: all degrees equal -> gini 0
        triples = rd.from_arrow(pa.table({
            "subj_norm": pa.array(["a", "b", "c"], pa.string()),
            "obj_norm": pa.array(["b", "c", "a"], pa.string())}))
        r = q_kg_degree_gini_from(triples).to_pandas().to_dict("records")[0]
        assert r["gini_micro"] == 0

    def test_lm_bigram_acc(self, ray_session, tmp_path):
        from ontoray.queries import SQL_LM_BIGRAM_ACC, q_lm_bigram_acc
        # bigrams: (a,b)x2, (a,c)x1, (b,a)x2, (c,a)x1  — doc "a b a b a c a"
        # pred(a)=b (mode 2), pred(b)=a, pred(c)=a;
        # correct mass = 2 + 2 + 1 = 5 of 6 pairs
        docs = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["a b a b a c a"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_lm_bigram_acc(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_LM_BIGRAM_ACC).fetchall())
        assert got == want
        assert got == [(6, 5, 833333)]

    def test_lm_bigram_acc_tie_break(self, ray_session, tmp_path):
        from ontoray.queries import SQL_LM_BIGRAM_ACC, q_lm_bigram_acc
        # (x,a) and (x,b) tie at 1 -> pred(x) = 'a' (lexicographic min);
        # doc2's (x,b) occurrence is then wrong: 1 of 2 correct... plus
        # trailing bigrams: "x a" has only (x,a); "x b" only (x,b)
        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x a", "x b"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_lm_bigram_acc(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_LM_BIGRAM_ACC).fetchall())
        assert got == want
        assert got == [(2, 1, 500000)]


class TestJoinSizeEst:
    def test_join_size_est(self, ray_session, tmp_path):
        from ontoray.queries import q_join_size_est, sql_join_size_est
        # keys 1 (1x2), 2 (2x1), 3 orders-only -> exact 1*2 + 2*1 = 4
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 2, 3], pa.int64())})
        lineitem = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64())})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
        got = sorted(tuple(r.values()) for r in q_join_size_est(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders, "lineitem": lineitem})
                      .execute(sql_join_size_est()).fetchall())
        assert got == want
        (exact, est, err), = got
        assert exact == 4
        assert est >= exact                         # CMS one-sided error
        assert err >= 0
        # 3 distinct keys in 1024 buckets: collisions vanishingly unlikely
        assert est == 4 and err == 0


class TestShipdelayVocabDrift:
    def test_lineitem_shipdelay_quantiles(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_LINEITEM_SHIPDELAY_QUANTILES,
                                     q_lineitem_shipdelay_quantiles)
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array([dt.datetime(1997, 1, 1)] * 2,
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string())})
        lineitem = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_shipdate": pa.array(
                [dt.datetime(1997, 1, 11), dt.datetime(1997, 2, 10),
                 dt.datetime(1997, 1, 6)], pa.timestamp("us"))})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
        got = sorted(tuple(r.values()) for r in
                     q_lineitem_shipdelay_quantiles(
                         str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders, "lineitem": lineitem})
                      .execute(SQL_LINEITEM_SHIPDELAY_QUANTILES).fetchall())
        assert got == want
        # URGENT delays {10, 40}: disc-quantile p50=10, p90=p99=40
        assert got == [("1-URGENT", 10, 40, 40), ("2-HIGH", 5, 5, 5)]

    def test_docs_vocab_drift(self, ray_session, tmp_path):
        from ontoray.extras.sketches import _md5_int60
        from ontoray.queries import q_docs_vocab_drift, sql_docs_vocab_drift
        # find one doc id in each md5 half so both halves are non-empty
        ids = list(range(20))
        hv = (_md5_int60(ids) % 2).tolist()
        a = next(i for i in ids if hv[i] == 0)
        b = next(i for i in ids if hv[i] == 1)
        docs = pa.table({
            "doc_id": pa.array([a, b], pa.int64()),
            "text": pa.array(["common onlya", "common onlyb"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_vocab_drift(
            str(tmp_path), k=5).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_docs_vocab_drift(k=5)).fetchall())
        assert got == want
        rows = {r[0]: r for r in got}
        # 'common' in both halves (df 1/1, sizes 1/1) -> score 0;
        # each exclusive token scores 1
        assert rows["common"][3] == 0
        assert rows["onlya"] == ("onlya", 1, 0, 1)
        assert rows["onlyb"] == ("onlyb", 0, 1, 1)


class TestRollingP90:
    def test_events_rolling_p90(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_EVENTS_ROLLING_P90,
                                     q_events_rolling_p90)
        base = dt.datetime(2024, 1, 1)
        # day0: {0.10, 0.20} -> p90 rank ceil(1.8)=2 -> 20c;
        # day1 window {10,20,30} -> 30c;
        # day8: window is days 2..8 -> only {0.05} -> 5c
        ev = pa.table({
            "event_type": pa.array(["a"] * 4, pa.string()),
            "ts": pa.array([base, base + dt.timedelta(hours=1),
                            base + dt.timedelta(days=1),
                            base + dt.timedelta(days=8)],
                           pa.timestamp("us")),
            "value": pa.array([0.10, 0.20, 0.30, 0.05])})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_rolling_p90(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_ROLLING_P90).fetchall())
        assert got == want
        d0 = (base - dt.datetime(1970, 1, 1)).days
        assert got == [("a", d0, 20), ("a", d0 + 1, 30), ("a", d0 + 8, 5)]


class TestKnnAccRrf:
    def test_embed_knn_acc_two_clusters(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.queries import q_embed_knn_acc, sql_embed_knn_acc
        # two tight clusters of 6 -> every 5-NN set is pure -> acc 1.0
        vecs, labs = [], []
        for i in range(6):
            vecs.append([1.0, 0.001 * i])
            labs.append(0)
        for i in range(6):
            vecs.append([0.001 * i, 1.0])
            labs.append(1)
        emb = pa.table({
            "vec_id": pa.array(list(range(12)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32())})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = sorted(tuple(r.values()) for r in q_embed_knn_acc(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"embeddings": emb})
                      .execute(sql_embed_knn_acc()).fetchall())
        assert got == want
        assert got == [(0, 6, 6, 1000000), (1, 6, 6, 1000000)]

    def test_ann_rrf_semantics(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.extras.ann import brute_force_topk, query_vector
        from ontoray.queries import q_ann_rrf
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((40, 4)).astype(np.float64)
        emb = pa.table({
            "vec_id": pa.array(list(range(40)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        out = q_ann_rrf(str(tmp_path)).to_pandas().to_dict("records")
        assert len(out) == 10
        scores = [r["rrf_micro"] for r in out]
        assert scores == sorted(scores, reverse=True)
        # a vector top-ranked by BOTH retrievers gets both 1/(60+1) terms
        assert scores[0] <= 2 * (1_000_000 // 61)
        assert all(r["rank"] == i + 1 for i, r in enumerate(out))


class TestTypeAffinity:
    def test_events_type_affinity(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_EVENTS_TYPE_AFFINITY,
                                     q_events_type_affinity)
        base = dt.datetime(2024, 1, 1)
        # user 1: session {x, y} then (>30 min later) session {x};
        # user 2: session {x, y}.  n_sessions=3, n_x=3, n_y=2, pair 2
        # -> lift = 1e6*2*3 // (3*2) = 1e6
        ev = pa.table({
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(
                [base, base + dt.timedelta(minutes=5),
                 base + dt.timedelta(hours=2), base, base +
                 dt.timedelta(minutes=1)], pa.timestamp("us")),
            "event_type": pa.array(["x", "y", "x", "y", "x"], pa.string())})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_type_affinity(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_TYPE_AFFINITY).fetchall())
        assert got == want
        assert got == [("x", "y", 2, 1000000)]


class TestDensityFertility:
    def test_lineitem_density_check(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_LINEITEM_DENSITY_CHECK,
                                     q_lineitem_density_check)
        # order 1: dense 1,2,3 OK; order 2: gap (1,3) — sum identity
        # catches it; order 3: duplicate (1,1,2) — max!=n catches it;
        # order 4: dup masking gap (1,2,2,... wait) use (1,1,4): n=3,
        # mx=4!=3 -> caught
        lineitem = pa.table({
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3, 3], pa.int64()),
            "l_linenumber": pa.array([1, 2, 3, 1, 3, 1, 1, 2], pa.int32())})
        pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
        got = sorted(tuple(r.values()) for r in q_lineitem_density_check(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"lineitem": lineitem})
                      .execute(SQL_LINEITEM_DENSITY_CHECK).fetchall())
        assert got == want
        assert got == [(3, 2, 666666)]

    def test_docs_fertility(self, ray_session, tmp_path):
        from ontoray.queries import SQL_DOCS_FERTILITY, q_docs_fertility
        docs = pa.table({
            "text": pa.array(["ab cd", "x"], pa.string()),
            "lang": pa.array(["en", "de"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_fertility(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_FERTILITY).fetchall())
        assert got == want
        # en: 2 tokens / 5 bytes -> 40e6 micro; de: 1/1 -> 100e6
        assert got == [("de", 1, 1, 100000000), ("en", 2, 5, 40000000)]


class TestConversionGrowth:
    def test_events_conversion_latency(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_EVENTS_CONVERSION_LATENCY,
                                     q_events_conversion_latency)
        base = dt.datetime(2024, 1, 1)
        # user 1: signup then purchase 90 min later -> 1h bucket;
        # user 2: purchase BEFORE signup -> dropped;
        # user 3: signup only -> dropped
        ev = pa.table({
            "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(
                ["signup", "purchase", "purchase", "signup", "signup"],
                pa.string()),
            "ts": pa.array(
                [base, base + dt.timedelta(minutes=90), base,
                 base + dt.timedelta(hours=1), base], pa.timestamp("us"))})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_conversion_latency(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_CONVERSION_LATENCY).fetchall())
        assert got == want
        assert got == [(1, 1)]

    def test_events_growth_accounting(self, ray_session, tmp_path):
        import datetime as dt
        from ontoray.queries import (SQL_EVENTS_GROWTH_ACCOUNTING,
                                     q_events_growth_accounting)
        base = dt.datetime(2024, 1, 1)
        d0 = (base - dt.datetime(1970, 1, 1)).days
        # day0: users 1,2 (both new); day1: user 1 (returning) + user 3
        # (new); duplicate events same day collapse
        ev = pa.table({
            "user_id": pa.array([1, 1, 2, 1, 3], pa.int64()),
            "ts": pa.array(
                [base, base + dt.timedelta(hours=2), base,
                 base + dt.timedelta(days=1), base + dt.timedelta(days=1)],
                pa.timestamp("us"))})
        pq.write_table(ev, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_growth_accounting(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": ev})
                      .execute(SQL_EVENTS_GROWTH_ACCOUNTING).fetchall())
        assert got == want
        assert got == [(d0, 2, 2, 0), (d0 + 1, 2, 1, 1)]

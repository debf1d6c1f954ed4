"""Session-9 additions: TPC-H Q9/Q12 shapes, referential-integrity audit,
and the integer trailing-8 EWMA.  Each test checks hand-computed semantics
on a micro fixture AND bit-parity with the DuckDB mirror."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _duck(views: dict) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name, tbl in views.items():
        con.register(name, tbl)
    return con


def _ts(s):
    return pd.Timestamp(s).to_pydatetime()


class TestNationProfit:
    def test_orders_nation_profit(self, ray_session, tmp_path):
        from ontoray.queries import (q_orders_nation_profit,
                                     sql_orders_nation_profit)
        part = pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": ["red widget", "blue rod", "cold widget"]})
        supplier = pa.table({
            "s_suppkey": pa.array([10, 11], pa.int64()),
            "s_nationkey": pa.array([0, 1], pa.int32())})
        nation = pa.table({
            "n_nationkey": pa.array([0, 1], pa.int32()),
            "n_name": ["ALPHA", "BETA"]})
        orders = pa.table({
            "o_orderkey": pa.array([100, 101], pa.int64()),
            "o_orderdate": pa.array(
                [_ts("1995-06-01"), _ts("1996-02-01")],
                pa.timestamp("us"))})
        lineitem = pa.table({
            "l_orderkey": pa.array([100, 100, 101], pa.int64()),
            "l_partkey": pa.array([1, 2, 3], pa.int64()),
            "l_suppkey": pa.array([10, 10, 11], pa.int64()),
            "l_extendedprice": [100.0, 50.0, 20.0],
            "l_discount": [0.1, 0.0, 0.25]})
        for n, t in [("part", part), ("supplier", supplier),
                     ("nation", nation), ("orders", orders),
                     ("lineitem", lineitem)]:
            pq.write_table(t, str(tmp_path / f"{n}.parquet"))
        got = sorted(tuple(r.values()) for r in q_orders_nation_profit(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({
            "part": part, "supplier": supplier, "nation": nation,
            "orders": orders, "lineitem": lineitem})
            .execute(sql_orders_nation_profit()).fetchall())
        assert got == want
        # part 2 (no 'widget') drops; ALPHA 1995: 100*0.9=90; BETA 1996: 15
        assert got == [("ALPHA", 1995, 90.0), ("BETA", 1996, 15.0)]


class TestFlagPriority:
    def test_lineitem_flag_priority(self, ray_session, tmp_path):
        from ontoray.queries import (q_lineitem_flag_priority,
                                     sql_lineitem_flag_priority)
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderpriority": ["1-URGENT", "5-LOW", "2-HIGH"]})
        lineitem = pa.table({
            "l_orderkey": pa.array([1, 1, 2, 3, 3], pa.int64()),
            "l_returnflag": ["A", "N", "A", "N", "N"],
            "l_shipdate": pa.array(
                [_ts("1997-03-01"), _ts("1996-01-01"), _ts("1997-06-01"),
                 _ts("1997-07-01"), _ts("1998-01-01")],
                pa.timestamp("us"))})
        for n, t in [("orders", orders), ("lineitem", lineitem)]:
            pq.write_table(t, str(tmp_path / f"{n}.parquet"))
        got = sorted(tuple(r.values()) for r in q_lineitem_flag_priority(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders, "lineitem": lineitem})
                      .execute(sql_lineitem_flag_priority()).fetchall())
        assert got == want
        # in-window lines: (1,A,high) (2,A,low) (3,N,high);
        # 1996 line and 1998-01-01 line fall outside [lo, hi)
        assert got == [("A", 1, 1), ("N", 1, 0)]


class TestFkIntegrity:
    def test_fk_integrity(self, ray_session, tmp_path):
        from ontoray.queries import SQL_FK_INTEGRITY, q_fk_integrity
        orders = pa.table({
            "o_orderkey": pa.array([5, 6, 7, 10], pa.int64()),
            "o_custkey": pa.array([1, 2, 3, 3], pa.int64()),
            "o_orderpriority": ["5-LOW", "5-LOW", "1-URGENT", "5-LOW"]})
        part = pa.table({
            "p_partkey": pa.array([3, 4, 6], pa.int64()),
            "p_type": ["PROMO", "PROMO", "PROMO"]})
        supplier = pa.table({
            "s_suppkey": pa.array([1, 2], pa.int64()),
            "s_nationkey": pa.array([4, 9], pa.int32())})
        customer = pa.table({
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_mktsegment": ["BUILDING", "BUILDING", "AUTOMOBILE"]})
        lineitem = pa.table({
            "l_orderkey": pa.array([5, 6, 7], pa.int64()),
            "l_partkey": pa.array([3, 4, 6], pa.int64()),
            "l_suppkey": pa.array([1, 2, 2], pa.int64())})
        for n, t in [("orders", orders), ("part", part),
                     ("supplier", supplier), ("customer", customer),
                     ("lineitem", lineitem)]:
            pq.write_table(t, str(tmp_path / f"{n}.parquet"))
        got = {r["check_name"]: r["n_orphans"]
               for r in q_fk_integrity(str(tmp_path)).to_pandas()
               .to_dict("records")}
        want = dict(_duck({
            "orders": orders, "part": part, "supplier": supplier,
            "customer": customer, "lineitem": lineitem})
            .execute(SQL_FK_INTEGRITY).fetchall())
        assert got == want
        # orders 5,10 lost (5-LOW & %5==0) -> lineitem orderkey 5 orphaned;
        # parts 3,6 lost (PROMO & %3==0) -> lineitem partkeys 3,6 orphaned;
        # supplier 1 lost (nationkey<5) -> lineitem suppkey 1 orphaned;
        # customer 3 survives (AUTOMOBILE), 1/2 survive (%3!=0) -> 0 orphans
        assert got == {"lineitem_orders": 1, "lineitem_part": 2,
                       "lineitem_supplier": 1, "orders_customer": 0}


class TestEwma:
    def test_events_ewma_sequential_equiv(self, ray_session, tmp_path):
        from ontoray.queries import SQL_EVENTS_EWMA, q_events_ewma
        # one user, 10 events with ts ties broken by event_id
        n = 10
        events = pa.table({
            "user_id": pa.array([7] * n, pa.int64()),
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array([_ts("2025-01-01")] * 3
                           + [_ts("2025-01-02")] * 7, pa.timestamp("us")),
            "value": [float(i) + 0.25 for i in range(n)]})
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_ewma(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(SQL_EVENTS_EWMA).fetchall())
        assert got == want
        # sequential reference: w = [128, 64, ..., 1] newest-first
        micros = [int(v * 1e6 + 0.5) for v in
                  [float(i) + 0.25 for i in range(n)]]
        ref = {}
        for i in range(n):
            ref[i] = sum(micros[i - k] * (1 << (7 - k))
                         for k in range(min(8, i + 1)))
        assert {eid: w for eid, _, w in got} == ref

    def test_events_ewma_multi_user(self, ray_session, tmp_path):
        from ontoray.queries import SQL_EVENTS_EWMA, q_events_ewma
        events = pa.table({
            "user_id": pa.array([1, 2, 1, 2], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([_ts("2025-01-01"), _ts("2025-01-01"),
                            _ts("2025-01-02"), _ts("2025-01-02")],
                           pa.timestamp("us")),
            "value": [1.0, 10.0, 2.0, 20.0]})
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_ewma(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(SQL_EVENTS_EWMA).fetchall())
        assert got == want
        # decay never crosses users: user1 = 1M*128 then 2M*128+1M*64
        by_eid = {eid: w for eid, _, w in got}
        assert by_eid[1] == 128_000_000
        assert by_eid[3] == 2_000_000 * 128 + 1_000_000 * 64


class TestTextrank:
    def test_docs_textrank(self, ray_session, tmp_path):
        from ontoray.queries import q_docs_textrank, sql_docs_textrank
        docs = pa.table({
            "text": ["data engine data", "engine scale", "data data"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_textrank(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_docs_textrank()).fetchall())
        assert got == want
        names = [g[0] for g in got]
        # self-loop bigram (data,data) dropped; graph = data<->engine<->scale
        assert names == ["data", "engine", "scale"]
        ranks = dict(got)
        # 'engine' has two in-neighbours, ranks highest
        assert ranks["engine"] > ranks["data"] > 0
        assert ranks["engine"] > ranks["scale"] > 0


class TestSurvival:
    def test_events_survival(self, ray_session, tmp_path):
        from ontoray.queries import SQL_EVENTS_SURVIVAL, q_events_survival
        day = 86_400_000_000
        # user 1 active days 0-2, user 2 day 1 only, user 3 days 2-3
        rows = [(1, 0), (1, 2), (2, 1), (3, 2), (3, 3)]
        events = pa.table({
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([d * day for _, d in rows], pa.timestamp("us"))})
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_survival(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(SQL_EVENTS_SURVIVAL).fetchall())
        assert got == want
        # day0: {1} at risk, 0 churn; day1: {1,2}, churn {2};
        # day2: {1,3}, churn {1}; day3: {3}, churn {3}
        assert got == [
            (0, 1, 0, 0),
            (1, 2, 1, 500_000),
            (2, 2, 1, 500_000),
            (3, 1, 1, 1_000_000)]


class TestEmbedRp:
    def test_embed_rp(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.extras.sketches import _md5_int60
        from ontoray.queries import q_embed_rp, sql_embed_rp
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(5, 4)).astype(np.float32)
        emb = pa.table({
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = sorted(tuple(r.values()) for r in q_embed_rp(
            str(tmp_path), r=3).to_pandas().to_dict("records"))
        want = sorted(_duck({"embeddings": emb})
                      .execute(sql_embed_rp(r=3, dim=4)).fetchall())
        assert got == want
        # sequential reference
        q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        keys = [f"rp_{j}_{d}" for j in range(3) for d in range(4)]
        S = (2 * (_md5_int60(keys) % 2) - 1).reshape(3, 4).astype(np.int64)
        ref = {(i, j): int(q[i] @ S[j]) for i in range(5) for j in range(3)}
        assert {(v, j): y for v, j, y in got} == ref


class TestHllSetOps:
    def test_hll_set_ops(self, ray_session, tmp_path):
        from ontoray.queries import q_hll_set_ops, sql_hll_set_ops
        docs = pa.table({
            "source": ["a", "a", "b", "c"],
            "text": ["x y z", "z w", "x y", "q r s t"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = {(r["s1"], r["s2"]): r for r in q_hll_set_ops(
            str(tmp_path)).to_pandas().to_dict("records")}
        want_rows = _duck({"documents": docs}) \
            .execute(sql_hll_set_ops()).fetchall()
        want = {(r[0], r[1]): r for r in want_rows}
        assert set(got) == set(want) == {("a", "b"), ("a", "c"), ("b", "c")}
        for k, g in got.items():
            assert (g["n_zero"], g["harmonic_num"], g["est"],
                    g["n_union_exact"]) == want[k][2:]
        # exact unions: a∪b = {x,y,z,w}, a∪c = {x,y,z,w,q,r,s,t},
        # b∪c = {x,y,q,r,s,t}
        assert got[("a", "b")]["n_union_exact"] == 4
        assert got[("a", "c")]["n_union_exact"] == 8
        assert got[("b", "c")]["n_union_exact"] == 6
        # linear-counting regime: estimate lands within 1 of exact
        for g in got.values():
            assert abs(g["est"] - g["n_union_exact"]) < 1.0


class TestCdcMerge:
    def test_docs_cdc_merge(self, ray_session, tmp_path):
        from ontoray.queries import SQL_DOCS_CDC_MERGE, q_docs_cdc_merge
        docs = pa.table({
            "doc_id": pa.array([10, 15, 13, 7], pa.int64()),
            "text": ["del me", "upd me", "src of insert", "plain"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_cdc_merge(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_CDC_MERGE).fetchall())
        assert got == want
        # 10 deleted; 15 updated; 13 spawns insert 1000013 and stays;
        # 7 passes through
        assert got == [
            (7, "plain", "base"),
            (13, "src of insert", "base"),
            (15, "upd me v2", "update"),
            (1000013, "new doc 13", "insert")]


class TestRangeJoin:
    def test_events_range_join(self, ray_session, tmp_path):
        from ontoray.queries import (q_events_range_join,
                                     sql_events_range_join)
        # clicks at t=0s and t=10000s; purchases at 500s, 7000s, 7300s
        # (user 1), purchase at 600s for user 2 (never joins user 1)
        us = 1_000_000
        events = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "ts": pa.array([0, 10_000 * us, 500 * us, 7000 * us,
                            7300 * us, 600 * us], pa.timestamp("us")),
            "event_type": ["click", "click", "purchase", "purchase",
                           "purchase", "purchase"],
        })
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_range_join(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(sql_events_range_join()).fetchall())
        assert got == want
        # click@0: purchases 500/7000 within 7200s (7300 not); click@10000:
        # 7000/7300 within 7200 back-window, 500 is 9500s away -> 2 each
        assert got == [(1, 1, 2), (2, 1, 2)]

    def test_events_range_join_cross_bucket(self, ray_session, tmp_path):
        from ontoray.queries import (q_events_range_join,
                                     sql_events_range_join)
        us = 1_000_000
        # click at bucket boundary minus 1s, purchase 2s later in the NEXT
        # bucket: only the neighbor replication finds it
        events = pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([9, 9], pa.int64()),
            "ts": pa.array([7199 * us, 7201 * us], pa.timestamp("us")),
            "event_type": ["click", "purchase"],
        })
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_range_join(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(sql_events_range_join()).fetchall())
        assert got == want == [(1, 9, 1)]


class TestBounce:
    def test_events_bounce(self, ray_session, tmp_path):
        from ontoray.queries import q_events_bounce, sql_events_bounce
        us = 1_000_000
        # user 1: [view@0, click@60s] one session (entry view),
        #         [purchase@5000s] second session -> bounce
        # user 2: [click@0] bounce
        events = pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([0, 60 * us, 5000 * us, 0], pa.timestamp("us")),
            "event_type": ["view", "click", "purchase", "click"],
        })
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_bounce(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(sql_events_bounce()).fetchall())
        assert got == want
        assert got == [("click", 1, 1, 1_000_000),
                       ("purchase", 1, 1, 1_000_000),
                       ("view", 1, 0, 0)]

    def test_events_bounce_tie_entry(self, ray_session, tmp_path):
        from ontoray.queries import q_events_bounce, sql_events_bounce
        # two events at the identical ts: event_id breaks the entry tie
        events = pa.table({
            "event_id": pa.array([9, 4], pa.int64()),
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([0, 0], pa.timestamp("us")),
            "event_type": ["view", "click"],
        })
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_bounce(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(sql_events_bounce()).fetchall())
        assert got == want == [("click", 1, 0, 0)]


class TestKnBigram:
    def test_lm_kn_bigram(self, ray_session, tmp_path):
        from ontoray.queries import q_lm_kn_bigram, sql_lm_kn_bigram
        docs = pa.table({"text": ["a b a b a c", "b a b a"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_lm_kn_bigram(
            str(tmp_path), min_count=1).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_lm_kn_bigram(min_count=1)).fetchall())
        assert got == want
        # bigrams: doc1 (a,b)(b,a)(a,b)(b,a)(a,c); doc2 (b,a)(a,b)(b,a)
        # c: (a,b)=3 (b,a)=4 (a,c)=1; B=3
        # u: a -> n_w1=4, f_w1=2 ; b -> n_w1=4, f_w1=1
        # v: b -> n1=1 ; a -> n1=1 ; c -> n1=1
        row = {(r[0], r[1]): r for r in got}
        n, n_w1, f_w1, n1 = row[("a", "b")][2:6]
        assert (n, n_w1, f_w1, n1) == (3, 4, 2, 1)
        t1 = (4 * 3 - 3) * 1_000_000 // (4 * 4)
        t2 = 3 * 2 * 1 * 1_000_000 // (4 * 4 * 3)
        assert row[("a", "b")][6] == t1 + t2
        # KN sanity: continuation mass keeps every seen bigram's p > 0 and
        # p(b|a) with n=3 beats p(c|a) with n=1
        assert row[("a", "b")][6] > row[("a", "c")][6] > 0


class TestIvfPq:
    def test_embed_ivfpq(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.queries import q_embed_ivfpq, sql_embed_ivfpq
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(40, 8)).astype(np.float32)
        emb = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = [tuple(r.values()) for r in q_embed_ivfpq(
            str(tmp_path), k=5, m=2, kc=4, kq=4, nprobe=2, iters=2)
            .to_pandas().to_dict("records")]
        want = _duck({"embeddings": emb}).execute(sql_embed_ivfpq(
            str(tmp_path), k=5, m=2, kc=4, kq=4, nprobe=2,
            iters=2)).fetchall()
        assert got == want
        assert len(got) == 5
        # ranking is by approx_dot desc with vec_id tie-break
        keys = [(-r[1], r[0]) for r in got]
        assert keys == sorted(keys)
        # non-vacuous ADC scores: the surrogate separates candidates
        # (correlation with true cosine is statistical, not asserted on a
        # 40×8 random fixture with 4-word codebooks)
        assert len({r[1] for r in got}) > 1

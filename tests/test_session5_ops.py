"""Session-5 additions: BPE merge learning, Flesch readability,
resource-allocation link prediction, TPC-H Q3/Q14 shapes, late-shipment
semi-join.  Each test checks semantics on a hand-built fixture AND
bit-parity with the DuckDB mirror."""

import duckdb
import numpy as np
import pyarrow as pa


class TestBpeMerges:
    def _docs(self) -> pa.Table:
        # 'aaa'/'abab' are the adversarial overlap cases for greedy
        # left-to-right merge application; 'lower'/'flower' share 'lo'/'we'.
        texts = ["aaa abab lower lower flower", "abab abab lower aaa",
                 "flower tower lower", ""]
        return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts, pa.string())})

    def test_greedy_merge_semantics(self):
        from ontoray.extras.bpe import _merge_word
        assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
        assert _merge_word(list("abab"), "a", "b") == ["ab", "ab"]
        assert _merge_word(["ab", "a", "b"], "a", "b") == ["ab", "ab"]
        assert _merge_word(list("xyz"), "a", "b") == ["x", "y", "z"]

    def test_engine_vs_sql(self, ray_session):
        import ray.data as rd
        from ontoray.extras.bpe import bpe_merges, sql_bpe_merges
        tbl = self._docs()
        got = bpe_merges(rd.from_arrow(tbl).repartition(3), k=5, min_count=1)
        eng = [(r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
               for r in got.to_pylist()]
        con = duckdb.connect()
        con.register("documents", tbl)
        sql = con.execute(sql_bpe_merges(k=5, min_count=1)).fetchall()
        assert eng == sql
        assert len(eng) == 5 and eng[0][0] == 1
        # most frequent first pair on this corpus: 'lower' x4 + 'flower' x2
        # contribute (l,o)/(o,w)/(w,e)/(e,r) x6, 'tower' adds to o,w/w,e/e,r;
        # ties broken lexicographically -> ('e','r') wins at 7.
        assert eng[0] == (1, "e", "r", 7)

    def test_exhaustion_stops_early(self, ray_session):
        import ray.data as rd
        from ontoray.extras.bpe import bpe_merges
        tbl = pa.table({"text": pa.array(["ab ab", "ab"], pa.string())})
        got = bpe_merges(rd.from_arrow(tbl), k=10, min_count=1).to_pylist()
        # one mergeable pair ('a','b'); afterwards every word is one symbol
        assert [(r["left_sym"], r["right_sym"]) for r in got] == [("a", "b")]


class TestReadability:
    def _docs(self) -> pa.Table:
        texts = ["the cat sat. the dog ran! ok?", "aaaa eeee iiii",
                 "", "..."]
        return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts, pa.string())})

    def test_engine_vs_sql(self, ray_session):
        import ray.data as rd
        from ontoray.extras.textstats import readability, sql_readability
        tbl = self._docs()
        got = {r["doc_id"]: r for r in readability(
            rd.from_arrow(tbl).repartition(2)).take_all()}
        # doc 0: 7 words, 3 sentence runs, 7 vowel groups
        assert got[0]["n_words"] == 7 and got[0]["n_sents"] == 3
        assert got[0]["n_syll"] == 7
        w, s, y = 7, 3, 7
        assert got[0]["flesch_micro"] == (206_835_000 - (1_015_000 * w) // s
                                          - (84_600_000 * y) // w)
        # zero-word docs (2: empty, 3: punctuation only) are dropped
        assert set(got) == {0, 1}
        assert got[1]["n_sents"] == 1                 # clamp
        con = duckdb.connect()
        con.register("documents", tbl)
        sql = con.execute(sql_readability()).fetchall()
        assert {(r["doc_id"], r["n_words"], r["n_sents"], r["n_syll"],
                 r["flesch_micro"]) for r in got.values()} == set(sql)


class TestResourceAllocation:
    def _triples(self) -> pa.Table:
        # star: hubs 'z1'(deg 2 via a,b) and 'z2'(deg 3 via a,b,c);
        # a-b share {z1, z2} -> ra = 1e9//2 + 1e9//3; a-c share {z2};
        # a-b NOT directly linked, but a-c IS -> a-c excluded.
        edges = [("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2"),
                 ("c", "z2"), ("a", "c")]
        return pa.table({
            "subj_norm": pa.array([e[0] for e in edges], pa.string()),
            "obj_norm": pa.array([e[1] for e in edges], pa.string()),
        })

    def test_semantics(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import resource_allocation
        got = {(r["node_a"], r["node_b"]): r for r in resource_allocation(
            rd.from_arrow(self._triples()).repartition(2),
            min_ra_nano=0).take_all()}
        # deg: a=3 (z1,z2,c), b=2, c=2 (z2,a), z1=2, z2=3
        ab = got[("a", "b")]
        assert ab["common"] == 2
        assert ab["ra_nano"] == 1_000_000_000 // 2 + 1_000_000_000 // 3
        assert ("a", "c") not in got                   # existing edge
        # b-c share z2 only
        assert got[("b", "c")]["ra_nano"] == 1_000_000_000 // 3

    def test_threshold(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import resource_allocation
        got = resource_allocation(
            rd.from_arrow(self._triples()), min_ra_nano=500_000_000
        ).take_all()
        # a-b (via z1 deg2 + z2 deg3 = 833M) and z1-z2 (via a deg3 + b deg2
        # = 833M) clear 500M; b-c (333M) does not.
        assert {(r["node_a"], r["node_b"]) for r in got} == {("a", "b"),
                                                             ("z1", "z2")}


class TestRelationalShapes:
    def _write_tables(self, tmp_path):
        import pyarrow.parquet as pq
        rng = np.random.default_rng(23)
        nc, no, nl = 40, 200, 600
        base = 820_454_400  # 1996-01-01 epoch seconds
        cust = pa.table({
            "c_custkey": pa.array(range(nc), pa.int64()),
            "c_mktsegment": pa.array(
                [["BUILDING", "MACHINERY"][i % 2] for i in range(nc)],
                pa.string()),
        })
        odate = (base + rng.integers(0, 1200, no) * 86_400) * 1_000_000
        orders = pa.table({
            "o_orderkey": pa.array(range(no), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
            "o_orderdate": pa.array(odate.tolist(), pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [f"{i % 3}-P" for i in range(no)], pa.string()),
        })
        okey = rng.integers(0, no, nl)
        sdate = odate[okey] + rng.integers(1, 120, nl) * 86_400 * 1_000_000
        li = pa.table({
            "l_orderkey": pa.array(okey, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, 50, nl), pa.int64()),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(100, 9000, nl), 2), pa.float64()),
            "l_discount": pa.array(
                np.round(rng.uniform(0, 0.1, nl), 2), pa.float64()),
            "l_shipdate": pa.array(sdate.tolist(), pa.timestamp("us")),
        })
        part = pa.table({
            "p_partkey": pa.array(range(50), pa.int64()),
            "p_type": pa.array(
                [["PROMO", "STANDARD", "ECONOMY"][i % 3] for i in range(50)],
                pa.string()),
        })
        for name, tbl in [("customer", cust), ("orders", orders),
                          ("lineitem", li), ("part", part)]:
            pq.write_table(tbl, tmp_path / f"{name}.parquet")
        return {"customer": cust, "orders": orders, "lineitem": li,
                "part": part}

    def _con(self, tables):
        con = duckdb.connect()
        for name, tbl in tables.items():
            con.register(name, tbl)
        return con

    def test_orders_q3(self, ray_session, tmp_path):
        from ontoray.queries import SQL_ORDERS_Q3, q_orders_q3
        tables = self._write_tables(tmp_path)
        got = sorted(
            (r["l_orderkey"], r["o_date_days"], round(r["revenue"], 2))
            for r in q_orders_q3(str(tmp_path)).to_pandas().to_dict("records"))
        sql = sorted((a, b, round(c, 2)) for a, b, c in
                     self._con(tables).execute(SQL_ORDERS_Q3).fetchall())
        assert got == sql and 0 < len(got) <= 10

    def test_lineitem_q14(self, ray_session, tmp_path):
        from ontoray.queries import SQL_LINEITEM_Q14, q_lineitem_q14
        tables = self._write_tables(tmp_path)
        got = q_lineitem_q14(str(tmp_path)).to_pylist()[0]
        pr, tr, pct = self._con(tables).execute(SQL_LINEITEM_Q14).fetchone()
        assert got["promo_revenue"] == pr
        assert got["total_revenue"] == tr
        assert got["promo_pct_micro"] == pct
        assert 0 < pct < 100_000_000                  # non-vacuous share

    def test_orders_late_ship(self, ray_session, tmp_path):
        from ontoray.queries import SQL_ORDERS_LATE_SHIP, q_orders_late_ship
        tables = self._write_tables(tmp_path)
        got = sorted((r["o_orderpriority"], r["n_late"]) for r in
                     q_orders_late_ship(str(tmp_path)).take_all())
        sql = sorted(self._con(tables).execute(
            SQL_ORDERS_LATE_SHIP).fetchall())
        assert got == sql and len(got) > 0
        assert sum(n for _, n in got) < 200           # not every order late

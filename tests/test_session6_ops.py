"""Session-6 additions: BPE encode (tokenizer apply step) and per-key CUSUM
change detection via parallel prefix.  Each test checks semantics on a
hand-built fixture AND bit-parity with the DuckDB mirror."""

import duckdb
import numpy as np
import pyarrow as pa


class TestBpeEncode:
    def _docs(self) -> pa.Table:
        texts = ["aaa abab lower lower flower", "abab abab lower aaa",
                 "flower tower lower", "", "zq"]
        return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts, pa.string())})

    def test_engine_vs_sql(self, ray_session):
        import ray.data as rd
        from ontoray.extras.bpe import bpe_encode, sql_bpe_encode
        tbl = self._docs()
        got = bpe_encode(rd.from_arrow(tbl).repartition(3), k=5, min_count=1)
        eng = sorted(tuple(r.values()) for r in got.to_pandas().to_dict("records"))
        con = duckdb.connect()
        con.register("documents", tbl)
        sql = sorted(con.execute(sql_bpe_encode(k=5, min_count=1)).fetchall())
        assert eng == sql
        # doc 3 is empty -> no row
        assert len(eng) == 4

    def test_compression_semantics(self, ray_session):
        import ray.data as rd
        from ontoray.extras.bpe import bpe_encode
        # one word repeated: after enough merges it is a single symbol
        tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array(["abcd abcd abcd"], pa.string())})
        row = bpe_encode(rd.from_arrow(tbl), k=3,
                         min_count=1).to_pandas().to_dict("records")[0]
        assert row["n_words"] == 3
        assert row["n_chars_tok"] == 12
        assert row["n_bpe_tokens"] == 3          # 'abcd' fully merged
        assert row["ratio_micro"] == 1_000_000 * 3 // 12

    def test_exhaustion_safe(self, ray_session):
        """k far beyond the mergeable-pair supply must not wipe the corpus
        (the bb{i} sentinel row in the SQL mirror guards the same case)."""
        import ray.data as rd
        from ontoray.extras.bpe import bpe_encode, sql_bpe_encode
        tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                        "text": pa.array(["ab ab", "ab"], pa.string())})
        got = bpe_encode(rd.from_arrow(tbl), k=8, min_count=1)
        eng = sorted(tuple(r.values()) for r in got.to_pandas().to_dict("records"))
        con = duckdb.connect()
        con.register("documents", tbl)
        sql = sorted(con.execute(sql_bpe_encode(k=8, min_count=1)).fetchall())
        assert eng == sql
        assert eng[0][3] == 2 and eng[1][3] == 1   # n_bpe_tokens fully merged


class TestCusumScan:
    def _events(self, n_per_key=40, keys=("click", "view")) -> pa.Table:
        rng = np.random.default_rng(7)
        rows = {"event_type": [], "event_id": [], "ts": [], "value": []}
        eid = 0
        for k in keys:
            base = 10.0 if k == "click" else 3.0
            for i in range(n_per_key):
                rows["event_type"].append(k)
                rows["event_id"].append(eid)
                # spread across 3 epoch-days to exercise the cross-bucket
                # offset fold, with ts ties inside a day
                rows["ts"].append((i % 3) * 86_400_000_000 + (i // 3) * 1000)
                # a level shift halfway through = the change CUSUM detects
                shift = 5.0 if i >= n_per_key // 2 else 0.0
                rows["value"].append(base + shift + float(rng.normal(0, 0.5)))
                eid += 1
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "value": pa.array(rows["value"], pa.float64()),
        })

    def test_engine_vs_sql(self, ray_session):
        import ray.data as rd
        from ontoray.stages.events import SQL_EVENTS_CUSUM, cusum_scan
        tbl = self._events()
        got = cusum_scan(rd.from_arrow(tbl).repartition(5))
        eng = sorted(tuple(r.values())
                     for r in got.to_pandas().to_dict("records"))
        con = duckdb.connect()
        con.register("events", tbl)
        sql = sorted(con.execute(SQL_EVENTS_CUSUM).fetchall())
        assert eng == sql

    def test_closed_form_matches_sequential(self, ray_session):
        """The parallel-prefix closed form equals the classic sequential
        recursion s_i = max(0, s_{i-1} + delta_i)."""
        import ray.data as rd
        from ontoray.stages.events import cusum_scan
        tbl = self._events(n_per_key=25, keys=("x",))
        out = cusum_scan(rd.from_arrow(tbl)).to_pandas()
        out = out.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        vm = {}
        df = tbl.to_pandas()
        df["vm"] = np.floor(df["value"] * 1_000_000 + 0.5).astype(np.int64)
        mu = int(df["vm"].sum()) // len(df)
        df = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
        s, seq = 0, []
        for v in df["vm"]:
            s = max(0, s + int(v) - mu)
            seq.append(s)
        assert out["cusum_micro"].tolist() == seq

    def test_detects_shift(self, ray_session):
        """CUSUM must be materially larger after the injected level shift."""
        import ray.data as rd
        from ontoray.stages.events import cusum_scan
        tbl = self._events(n_per_key=60, keys=("click",))
        out = cusum_scan(rd.from_arrow(tbl)).to_pandas()
        df = tbl.to_pandas().sort_values(["ts", "event_id"])
        order = df["event_id"].tolist()
        by_id = dict(zip(out["event_id"], out["cusum_micro"]))
        path = [by_id[i] for i in order]
        early = max(path[: len(path) // 4])
        late = max(path[-len(path) // 4:])
        assert late > early * 2


def _duck(views: dict) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name, tbl in views.items():
        con.register(name, tbl)
    return con


class TestRelationalShapes:
    """Q18/Q16/Q19/Q22 shapes on a hand-built micro star schema."""

    def _star(self):
        import datetime as dt
        lineitem = pa.table({
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3, 3, 3], pa.int64()),
            "l_partkey": pa.array([10, 11, 10, 12, 11, 10, 12, 13, 11], pa.int64()),
            "l_suppkey": pa.array([100, 101, 100, 102, 101, 100, 102, 103, 101], pa.int64()),
            "l_quantity": pa.array([50.0, 50.0, 50.0, 5.0, 10.0, 50.0, 50.0, 50.0, 50.0]),
            "l_extendedprice": pa.array([100.5, 200.25, 50.0, 10.0, 20.0,
                                         30.0, 40.0, 55.5, 60.0]),
            "l_discount": pa.array([0.1, 0.0, 0.05, 0.02, 0.04, 0.0, 0.1, 0.03, 0.06]),
            "l_shipdate": pa.array([dt.datetime(1997, 2, 1)] * 9,
                                   pa.timestamp("us")),
        })
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 8, 7], pa.int64()),
            "o_orderstatus": pa.array(["F", "O", "F"]),
            "o_totalprice": pa.array([350.75, 30.0, 185.5]),
            "o_orderdate": pa.array([dt.datetime(1999, 1, 1),
                                     dt.datetime(2001, 1, 1),
                                     dt.datetime(1998, 6, 1)],
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "2-HIGH"]),
        })
        customer = pa.table({
            "c_custkey": pa.array([7, 8, 9, 10], pa.int64()),
            "c_name": pa.array(["ann", "bob", "cat", "dan"]),
            "c_nationkey": pa.array([0, 1, 0, 1], pa.int32()),
            "c_acctbal": pa.array([900.0, 100.0, 5000.0, -20.0]),
            "c_mktsegment": pa.array(["BUILDING", "BUILDING", "MACHINERY",
                                      "AUTOMOBILE"]),
        })
        supplier = pa.table({
            "s_suppkey": pa.array([100, 101, 102, 103], pa.int64()),
            "s_name": pa.array(["s0", "s1", "s2", "s3"]),
            "s_nationkey": pa.array([0, 1, 0, 1], pa.int32()),
            "s_acctbal": pa.array([5000.0, 500.0, 2000.0, 3000.0]),
        })
        part = pa.table({
            "p_partkey": pa.array([10, 11, 12, 13], pa.int64()),
            "p_name": pa.array(["pa", "pb", "pc", "pd"]),
            "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#34",
                                 "Brand#13"]),
            "p_type": pa.array(["t1", "t2", "t1", "t2"]),
            "p_size": pa.array([7, 14, 28, 1], pa.int32()),
            "p_retailprice": pa.array([1.0, 2.0, 3.0, 4.0]),
        })
        return {"lineitem": lineitem, "orders": orders,
                "customer": customer, "supplier": supplier, "part": part}

    def _sf_dir(self, tmp_path, views):
        import pyarrow.parquet as pq
        for name, tbl in views.items():
            pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))
        return str(tmp_path)

    def _cmp(self, got_ds, sql, views):
        got = sorted(tuple(r.values())
                     for r in got_ds.to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(sql).fetchall())
        assert got == want
        return got

    def test_orders_bigqty(self, ray_session, tmp_path):
        from ontoray.queries import SQL_ORDERS_BIGQTY, q_orders_bigqty
        views = self._star()
        sf = self._sf_dir(tmp_path, views)
        # orders 1 (150) and 3 (200) fail > 250? no: order 3 = 50*4 = 200;
        # threshold 250 -> none pass; use the callable's min_qty override
        got = q_orders_bigqty(sf, min_qty=149)
        rows = sorted(tuple(r.values())
                      for r in got.to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(
            SQL_ORDERS_BIGQTY.replace("> 250", "> 149")).fetchall())
        assert rows == want
        assert len(rows) == 2          # orders 1 (sum 150) and 3 (sum 200)
        assert {r[0] for r in rows} == {"ann"}

    def test_parts_supplier_cnt(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_PARTS_SUPPLIER_CNT,
                                     q_parts_supplier_cnt)
        views = self._star()
        sf = self._sf_dir(tmp_path, views)
        rows = self._cmp(q_parts_supplier_cnt(sf),
                         SQL_PARTS_SUPPLIER_CNT, views)
        # supplier 101 (acctbal 500 < 1000) is blocked everywhere;
        # Brand#13 part 13 excluded; part 11 only had supplier 101 -> gone.
        by_key = {(b, t, s): c for b, t, s, c in rows}
        assert by_key[("Brand#12", "t1", 7)] == 1        # only supp 100
        assert ("Brand#23", "t2", 14) not in by_key      # 101 blocked
        assert by_key[("Brand#34", "t1", 28)] == 1       # supp 102

    def test_lineitem_disjunct_rev(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_LINEITEM_DISJUNCT_REV,
                                     q_lineitem_disjunct_rev)
        views = self._star()
        sf = self._sf_dir(tmp_path, views)
        rows = self._cmp(q_lineitem_disjunct_rev(sf),
                         SQL_LINEITEM_DISJUNCT_REV, views)
        # qualifying rows: part 12 (Brand#34, size 28) with qty 20-30 -> none
        # (qtys are 5 and 50); part 11 (Brand#23 size 14) qty 10 and 50 -> one;
        # part 10 (Brand#12 size 7) qty in 1..11 -> none (50s).  n_items == 1.
        assert rows[0][0] == 1

    def test_custs_above_avg_idle(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_CUSTS_ABOVE_AVG_IDLE,
                                     q_custs_above_avg_idle)
        views = self._star()
        sf = self._sf_dir(tmp_path, views)
        rows = self._cmp(q_custs_above_avg_idle(sf),
                         SQL_CUSTS_ABOVE_AVG_IDLE, views)
        # positive balances: 900, 100, 5000 -> avg 2000; only cust 9 (5000,
        # MACHINERY, never ordered) qualifies; cust 8 ordered in 2001 (recent).
        assert rows == [("MACHINERY", 1, 500000)]


class TestSpanDedupKeepFirst:
    def _docs(self) -> pa.Table:
        a = "w0 w1 w2 w3 w4 w5 w6 w7 x0 x1 x2 x3 x4 x5 x6 x7"
        b = "w0 w1 w2 w3 w4 w5 w6 w7 y0 y1 y2 y3 y4 y5 y6 y7"
        c = "x0 x1 x2 x3 x4 x5 x6 x7 tail"
        return pa.table({"doc_id": pa.array([3, 1, 2], pa.int64()),
                         "text": pa.array([a, b, c], pa.string())})

    def test_engine_vs_sql(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import (span_dedup_keep_first,
                                          sql_span_dedup_keep_first)
        tbl = self._docs()
        got = span_dedup_keep_first(rd.from_arrow(tbl).repartition(3))
        eng = sorted(tuple(r.values())
                     for r in got.to_pandas().to_dict("records"))
        con = duckdb.connect()
        con.register("documents", tbl)
        sql = sorted(con.execute(sql_span_dedup_keep_first()).fetchall())
        assert eng == sql

    def test_keep_first_semantics(self, ray_session):
        import ray.data as rd
        from ontoray.extras.dedup import span_dedup_keep_first
        got = {r["doc_id"]: r for r in span_dedup_keep_first(
            rd.from_arrow(self._docs())).to_pandas().to_dict("records")}
        # tile 'w0..w7' occurs in docs 1 and 3 -> doc 1 (lower id) keeps it;
        # tile 'x0..x7' occurs in docs 2 and 3 -> doc 2 keeps it;
        # doc 3 loses both of its tiles.
        assert got[1]["n_kept"] == 2 and got[1]["n_dropped"] == 0
        assert got[2]["n_kept"] == 2 and got[2]["n_dropped"] == 0
        assert got[3]["n_tiles"] == 2 and got[3]["n_kept"] == 0


class TestDimStats:
    def test_engine_vs_sql(self, ray_session):
        import ray.data as rd
        from ontoray.extras.pca import dim_stats, sql_dim_stats
        rng = np.random.default_rng(3)
        vecs = (rng.normal(0, 0.3, (40, 5)).astype(np.float32))
        tbl = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        got = dim_stats(rd.from_arrow(tbl).repartition(4))
        eng = sorted(tuple(r.values())
                     for r in got.to_pandas().to_dict("records"))
        con = duckdb.connect()
        con.register("embeddings", tbl)
        sql = sorted(con.execute(sql_dim_stats()).fetchall())
        assert eng == sql
        assert len(eng) == 5 and all(r[1] == 40 for r in eng)

    def test_partition_invariance(self, ray_session):
        import ray.data as rd
        from ontoray.extras.pca import dim_stats
        vecs = [[0.1, -0.2], [0.3, 0.4], [-0.5, 0.0]]
        tbl = pa.table({"embedding": pa.array(vecs, pa.list_(pa.float32()))})
        a = sorted(tuple(r.values()) for r in dim_stats(
            rd.from_arrow(tbl)).to_pandas().to_dict("records"))
        b = sorted(tuple(r.values()) for r in dim_stats(
            rd.from_arrow(tbl).repartition(3)).to_pandas().to_dict("records"))
        assert a == b
        assert a[0][0] == 1 and a[0][4] == -500000   # dim 1 min = -0.5 micro


class TestArgminShareFlows:
    """Q2 argmin-join-back, Q7 nation flows, Q11 global share, snapshot diff."""

    def _schema(self, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq
        tables = {
            "lineitem": pa.table({
                "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
                "l_partkey": pa.array([10, 10, 10, 11, 11], pa.int64()),
                "l_suppkey": pa.array([100, 101, 102, 100, 101], pa.int64()),
                "l_extendedprice": pa.array([50.0, 40.0, 40.0, 70.0, 80.0]),
                "l_discount": pa.array([0.1, 0.0, 0.0, 0.5, 0.0]),
            }),
            "orders": pa.table({
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([7, 8, 7], pa.int64()),
                "o_orderdate": pa.array([dt.datetime(1999, 3, 1),
                                         dt.datetime(1999, 9, 1),
                                         dt.datetime(2000, 1, 1)],
                                        pa.timestamp("us")),
            }),
            "customer": pa.table({
                "c_custkey": pa.array([7, 8], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int32()),
            }),
            "supplier": pa.table({
                "s_suppkey": pa.array([100, 101, 102], pa.int64()),
                "s_name": pa.array(["s0", "s1", "s2"]),
                "s_nationkey": pa.array([0, 1, 1], pa.int32()),
            }),
            "nation": pa.table({
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["ALPHA", "BETA"]),
                "n_regionkey": pa.array([0, 0], pa.int32()),
            }),
            "region": pa.table({
                "r_regionkey": pa.array([0], pa.int32()),
                "r_name": pa.array(["AFRICA"]),
            }),
            "part": pa.table({
                "p_partkey": pa.array([10, 11], pa.int64()),
                "p_name": pa.array(["pa", "pb"]),
                "p_size": pa.array([5, 50], pa.int32()),
            }),
        }
        for name, tbl in tables.items():
            pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))
        return str(tmp_path), tables

    def test_parts_min_supplier(self, ray_session, tmp_path):
        from ontoray.queries import q_parts_min_supplier, sql_parts_min_supplier
        sf, views = self._schema(tmp_path)
        got = sorted(tuple(r.values()) for r in q_parts_min_supplier(sf)
                     .to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(sql_parts_min_supplier()).fetchall())
        assert got == want
        # part 10 offers: s100 min 50, s101 min 40, s102 min 40 -> TIE at
        # 4000 cents between s1 and s2 (both surface); part 11 size 50 > 10
        # filtered out.
        assert len(got) == 2
        assert {g[2] for g in got} == {"s1", "s2"}

    def test_orders_nation_flows(self, ray_session, tmp_path):
        from ontoray.queries import SQL_ORDERS_NATION_FLOWS, q_orders_nation_flows
        sf, views = self._schema(tmp_path)
        got = sorted(tuple(r.values()) for r in q_orders_nation_flows(sf)
                     .to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_ORDERS_NATION_FLOWS).fetchall())
        assert got == want
        # order 1 (cust 7/ALPHA, 1999): supp 100 (ALPHA) rev 50*0.9 = 45
        # and supp 101 (BETA) rev 40; order 3 (cust 7/ALPHA, 2000): supp
        # 101 (BETA) rev 80.
        by_key = {(a, b, y): (n, c) for a, b, y, n, c in got}
        assert by_key[("ALPHA", "ALPHA", 1999)] == (1, 4500)
        assert by_key[("BETA", "ALPHA", 1999)] == (1, 4000)
        assert by_key[("BETA", "ALPHA", 2000)] == (1, 8000)

    def test_parts_value_share(self, ray_session, tmp_path):
        from ontoray.queries import SQL_PARTS_VALUE_SHARE, q_parts_value_share
        sf, views = self._schema(tmp_path)
        got = sorted(tuple(r.values()) for r in q_parts_value_share(sf)
                     .to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_PARTS_VALUE_SHARE).fetchall())
        assert got == want
        # both parts are far above 1/2000 of total on this fixture
        assert [g[0] for g in got] == [10, 11]

    def test_exact_share_boundary(self, ray_session, tmp_path):
        """Strict > on the cross-multiplication: a part at EXACTLY 1/denom
        of total must be excluded on both engines."""
        import pyarrow.parquet as pq
        from ontoray.queries import q_parts_value_share
        li = pa.table({
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_extendedprice": pa.array([1.0, 3.0]),
        })
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        got = q_parts_value_share(str(tmp_path), denom=4).to_pandas()
        # totals: 100 + 300 = 400 cents; part 1 = exactly 1/4 -> excluded
        assert got["l_partkey"].tolist() == [2]

    def test_docs_snapshot_diff(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from ontoray.queries import SQL_DOCS_SNAPSHOT_DIFF, q_docs_snapshot_diff
        docs = pa.table({
            "doc_id": pa.array(list(range(24)), pa.int64()),
            "text": pa.array([f"doc body {i}" for i in range(24)]),
        })
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_snapshot_diff(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs}).execute(
            SQL_DOCS_SNAPSHOT_DIFF).fetchall())
        assert got == want
        by = {}
        for did, st in got:
            by.setdefault(st, []).append(did)
        # added: % 10 == 0 (old excluded) except doc 0? 0 % 10 == 0 ->
        # old-missing, new has it (0 % 10 != 1) -> added: 0, 10, 20
        assert by["added"] == [0, 10, 20]
        # removed: % 10 == 1 -> new-missing: 1, 11, 21
        assert by["removed"] == [1, 11, 21]
        # changed: % 7 == 3 and present in both: 3, 17 (10 is added,
        # 24 out of range)
        assert by["changed"] == [3, 17]


class TestSupplierWaitBlame:
    def test_engine_vs_sql_and_semantics(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq
        from ontoray.queries import SQL_SUPPLIER_WAIT_BLAME, q_supplier_wait_blame
        d0 = dt.datetime(1999, 1, 1)
        late = dt.datetime(1999, 6, 1)     # > 60 days after d0
        ok = dt.datetime(1999, 1, 15)
        lineitem = pa.table({
            # order 1: supps 100 (late) + 101 (on time) -> blame 100
            # order 2: supps 100 + 101 both late -> nl=2, no blame
            # order 3: single supplier late -> ns=1, no blame
            # order 4: status 'O' -> excluded entirely
            "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4], pa.int64()),
            "l_suppkey": pa.array([100, 101, 100, 101, 100, 100, 101],
                                  pa.int64()),
            "l_shipdate": pa.array([late, ok, late, late, late, late, ok],
                                   pa.timestamp("us")),
        })
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderdate": pa.array([d0] * 4, pa.timestamp("us")),
            "o_orderstatus": pa.array(["F", "F", "F", "O"]),
        })
        supplier = pa.table({
            "s_suppkey": pa.array([100, 101], pa.int64()),
            "s_name": pa.array(["slow", "fast"]),
        })
        views = {"lineitem": lineitem, "orders": orders,
                 "supplier": supplier}
        for name, tbl in views.items():
            pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))
        got = sorted(tuple(r.values()) for r in q_supplier_wait_blame(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_SUPPLIER_WAIT_BLAME).fetchall())
        assert got == want
        assert got == [("slow", 1)]


class TestWhiten:
    def test_engine_vs_sql(self, ray_session):
        import ray.data as rd
        from ontoray.extras.pca import sql_whiten, whiten
        rng = np.random.default_rng(11)
        vecs = rng.normal(0, [0.1, 5.0, 1.0], (30, 3)).astype(np.float32)
        vecs[:, 2] = 0.25                      # zero-variance dim -> z = 0
        tbl = pa.table({
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        got = whiten(rd.from_arrow(tbl).repartition(4))
        eng = sorted(tuple(r.values())
                     for r in got.to_pandas().to_dict("records"))
        con = duckdb.connect()
        con.register("embeddings", tbl)
        sql = sorted(con.execute(sql_whiten()).fetchall())
        assert eng == sql
        assert len(eng) == 90
        # zero-variance dim rows are exactly 0
        assert all(z == 0.0 for _, d, z in eng if d == 3)

    def test_standardizes(self, ray_session):
        """Mean of z per dim ~ 0, population std ~ 1 (up to rounding)."""
        import ray.data as rd
        from ontoray.extras.pca import whiten
        rng = np.random.default_rng(2)
        vecs = rng.normal(3.0, 2.0, (200, 2)).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        df = whiten(rd.from_arrow(tbl)).to_pandas()
        for d in (1, 2):
            z = df[df["dim"] == d]["z"]
            assert abs(z.mean()) < 1e-3
            assert abs(z.std(ddof=0) - 1.0) < 1e-3


class TestMultiSourceBfs:
    def _triples(self, edges) -> pa.Table:
        return pa.table({
            "subj_norm": pa.array([a for a, _ in edges], pa.string()),
            "pred_norm": pa.array(["related_to"] * len(edges), pa.string()),
            "obj_norm": pa.array([b for _, b in edges], pa.string()),
        })

    def test_distances_exact(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import multi_source_bfs
        # path a-b-c-d-e plus an isolated pair f-g
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                 ("f", "g")]
        got = multi_source_bfs(rd.from_arrow(self._triples(edges)),
                               n_seeds=2, max_hops=3)
        rows = {(r["seed"], r["name"]): r["dist"]
                for r in got.to_pandas().to_dict("records")}
        import hashlib
        nodes = sorted({x for e in edges for x in e},
                       key=lambda x: (hashlib.md5(
                           f"{x}:bfs".encode()).hexdigest(), x))
        seeds = set(nodes[:2])
        assert {s for s, _ in rows} == seeds
        for s in seeds:
            assert rows[(s, s)] == 0
        # brute-force check every reported distance
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for s in seeds:
            dist, frontier = {s: 0}, [s]
            for h in (1, 2, 3):
                nxt = [v for u in frontier for v in adj[u] if v not in dist]
                for v in nxt:
                    dist.setdefault(v, h)
                frontier = list(dict.fromkeys(nxt))
            want = {(s, v): d for v, d in dist.items()}
            assert {k: v for k, v in rows.items() if k[0] == s} == want

    def test_max_hops_bound(self, ray_session):
        import ray.data as rd
        from ontoray.stages.analytics import multi_source_bfs
        edges = [(f"n{i}", f"n{i+1}") for i in range(9)]
        got = multi_source_bfs(rd.from_arrow(self._triples(edges)),
                               n_seeds=1, max_hops=2).to_pandas()
        assert got["dist"].max() == 2
        assert len(got) <= 5


class TestCohortDauMauCalibration:
    def test_orders_cohort_ltv(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq
        from ontoray.queries import SQL_ORDERS_COHORT_LTV, q_orders_cohort_ltv
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 8, 8], pa.int64()),
            "o_orderdate": pa.array([dt.datetime(1998, 5, 1),
                                     dt.datetime(1999, 2, 1),
                                     dt.datetime(1999, 11, 1),
                                     dt.datetime(1999, 3, 1),
                                     dt.datetime(1999, 4, 1)],
                                    pa.timestamp("us")),
            "o_totalprice": pa.array([10.0, 20.0, 30.5, 5.25, 4.75]),
        })
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = sorted(tuple(r.values()) for r in q_orders_cohort_ltv(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"orders": orders})
                      .execute(SQL_ORDERS_COHORT_LTV).fetchall())
        assert got == want
        # cust 7 cohort 1998 (orders in 1998 + 2x1999), cust 8 cohort 1999
        assert got == [(1998, 1998, 1, 1000), (1998, 1999, 2, 5050),
                       (1999, 1999, 2, 1000)]

    def test_events_dau_mau(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq
        from ontoray.queries import SQL_EVENTS_DAU_MAU, q_events_dau_mau
        rows = []
        # Jan: users 1,2 on day 1; user 1 again on day 2 (twice -> distinct)
        rows += [(1, dt.datetime(2024, 1, 1, 8)), (2, dt.datetime(2024, 1, 1, 9)),
                 (1, dt.datetime(2024, 1, 2, 8)), (1, dt.datetime(2024, 1, 2, 9))]
        # Feb: user 3 only
        rows += [(3, dt.datetime(2024, 2, 10, 1))]
        events = pa.table({
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
        })
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_dau_mau(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(SQL_EVENTS_DAU_MAU).fetchall())
        assert got == want
        # Jan: dau day1=2, day2=1 -> sum 3 over 2 days; mau=2;
        # stickiness = 1e6*3 // (2*2) = 750000.  Feb: 1/1/1 -> 1e6.
        assert got == [(202401, 3, 2, 2, 750000), (202402, 1, 1, 1, 1000000)]

    def test_kg_conf_calibration(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_conf_calibration_from
        trip = pa.table({
            "subj_norm": pa.array(["a", "b", "c", "d"], pa.string()),
            "pred_norm": pa.array(["p"] * 4, pa.string()),
            "obj_norm": pa.array(["x", "y", "z", "w"], pa.string()),
            "conf": pa.array([0.9, 0.9, 0.75, 0.65], pa.float32()),
            "n_obs": pa.array([4, 2, 10, 1], pa.int64()),
        })
        got = sorted(tuple(r.values()) for r in q_kg_conf_calibration_from(
            rd.from_arrow(trip).repartition(2))
            .to_pandas().to_dict("records"))
        assert got == [(6, 1, 1, 1000000), (7, 1, 10, 10000000),
                       (9, 2, 6, 3000000)]

"""Session-7 additions: TPC-H Q4/Q5/Q8/Q13 shapes on a hand-built micro
star schema.  Each test checks semantics on the fixture AND bit-parity
with the DuckDB mirror."""

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _duck(views: dict) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name, tbl in views.items():
        con.register(name, tbl)
    return con


def _star(tmp_path) -> dict:
    """Micro star schema: 2 regions, 3 nations, 3 customers, 2 suppliers,
    2 parts, 4 orders, 6 lineitems — crafted so every new shape is
    non-vacuous (a slow order, a local-supplier line, a zero-order
    customer, both share buckets)."""
    region = pa.table({"r_regionkey": pa.array([0, 1], pa.int64()),
                       "r_name": pa.array(["ASIA", "EUROPE"], pa.string())})
    nation = pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["NATION_7", "NATION_8", "NATION_9"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64())})
    customer = pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64())})
    supplier = pa.table({
        "s_suppkey": pa.array([20, 21], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64())})
    part = pa.table({
        "p_partkey": pa.array([30, 31], pa.int64()),
        "p_type": pa.array(["PROMO", "ECONOMY"], pa.string())})
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 10, 11, 12], pa.int64()),
        "o_orderdate": pa.array(
            [dt.datetime(1997, 3, 1), dt.datetime(1997, 6, 1),
             dt.datetime(1997, 9, 1), dt.datetime(1996, 2, 1)],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "2-HIGH", "1-URGENT", "3-MEDIUM"], pa.string())})
    lineitem = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 3, 4], pa.int64()),
        "l_partkey": pa.array([30, 31, 30, 30, 31, 30], pa.int64()),
        "l_suppkey": pa.array([20, 21, 21, 21, 20, 20], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 80.0, 40.0, 20.0, 60.0]),
        "l_discount": pa.array([0.1, 0.0, 0.5, 0.0, 0.25, 0.0]),
        # order 1 has a line 40 days late; others within 30 days
        "l_shipdate": pa.array(
            [dt.datetime(1997, 4, 10), dt.datetime(1997, 3, 5),
             dt.datetime(1997, 6, 10), dt.datetime(1997, 9, 20),
             dt.datetime(1997, 9, 2), dt.datetime(1996, 2, 10)],
            pa.timestamp("us"))})
    views = {"region": region, "nation": nation, "customer": customer,
             "supplier": supplier, "part": part, "orders": orders,
             "lineitem": lineitem}
    for name, tbl in views.items():
        pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))
    return views


class TestQ4Q5Q8Q13:
    def test_orders_priority_exists(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_ORDERS_PRIORITY_EXISTS,
                                     q_orders_priority_exists)
        views = _star(tmp_path)
        got = sorted(tuple(r.values()) for r in q_orders_priority_exists(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_ORDERS_PRIORITY_EXISTS)
                      .fetchall())
        assert got == want
        # only order 1 (URGENT) has a >30-day-late line, counted ONCE
        assert got == [("1-URGENT", 1)]

    def test_orders_local_revenue(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_ORDERS_LOCAL_REVENUE,
                                     q_orders_local_revenue)
        views = _star(tmp_path)
        got = sorted(tuple(r.values()) for r in q_orders_local_revenue(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_ORDERS_LOCAL_REVENUE)
                      .fetchall())
        assert got == want
        # local lines in 1997/ASIA: o1/l1 (cust nat0, supp nat0, 90.00) and
        # o3/l3 (cust nat1, supp nat1, 40.00); order 4 is 1996.
        assert got == [("NATION_7", 9000), ("NATION_8", 4000)]

    def test_nation_market_share(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_NATION_MARKET_SHARE,
                                     q_nation_market_share)
        views = _star(tmp_path)
        got = sorted(tuple(r.values()) for r in q_nation_market_share(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_NATION_MARKET_SHARE)
                      .fetchall())
        assert got == want
        # PROMO lines into ASIA custs (order 4's cust 12 is EUROPE — out):
        # 1997 o1/l1 (supp nat0=NATION_7, 9000c), o2/l3 (nat1, 4000c),
        # o3/l4 (nat1, 4000c) -> num 9000 / den 17000
        assert got == [(1997, 9000, 17000, 529411)]

    def test_custs_order_histogram(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_CUSTS_ORDER_HISTOGRAM,
                                     q_custs_order_histogram)
        views = _star(tmp_path)
        # add a zero-order customer
        cust = pa.table({"c_custkey": pa.array([10, 11, 12, 13], pa.int64()),
                         "c_nationkey": pa.array([0, 1, 2, 2], pa.int64())})
        pq.write_table(cust, str(tmp_path / "customer.parquet"))
        views["customer"] = cust
        got = sorted(tuple(r.values()) for r in q_custs_order_histogram(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_CUSTS_ORDER_HISTOGRAM)
                      .fetchall())
        assert got == want
        # cust 10 -> 2 orders, 11/12 -> 1 each, 13 -> 0
        assert got == [(0, 1), (1, 2), (2, 1)]


class TestQ15Q17BasketLangid:
    def test_supplier_top_revenue(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_SUPPLIER_TOP_REVENUE,
                                     q_supplier_top_revenue)
        views = _star(tmp_path)
        # give suppliers names and put two lines in the Q1-1997 window with
        # a revenue TIE between both suppliers
        supp = pa.table({"s_suppkey": pa.array([20, 21], pa.int64()),
                         "s_nationkey": pa.array([0, 1], pa.int64()),
                         "s_name": pa.array(["S20", "S21"], pa.string())})
        pq.write_table(supp, str(tmp_path / "supplier.parquet"))
        views["supplier"] = supp
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_partkey": pa.array([30, 31, 30], pa.int64()),
            "l_suppkey": pa.array([20, 21, 21], pa.int64()),
            "l_extendedprice": pa.array([100.0, 60.0, 40.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
            "l_shipdate": pa.array(
                [dt.datetime(1997, 2, 1), dt.datetime(1997, 3, 1),
                 dt.datetime(1997, 3, 15)], pa.timestamp("us"))})
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        views["lineitem"] = li
        got = sorted(tuple(r.values()) for r in q_supplier_top_revenue(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_SUPPLIER_TOP_REVENUE)
                      .fetchall())
        assert got == want
        # both suppliers total 10000 cents -> tie preserved
        assert got == [(20, "S20", 10000), (21, "S21", 10000)]

    def test_lineitem_small_qty(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_LINEITEM_SMALL_QTY,
                                     q_lineitem_small_qty)
        views = _star(tmp_path)
        part = pa.table({"p_partkey": pa.array([30, 31], pa.int64()),
                         "p_type": pa.array(["PROMO", "ECONOMY"], pa.string()),
                         "p_brand": pa.array(["Brand#1", "Brand#2"],
                                             pa.string())})
        pq.write_table(part, str(tmp_path / "part.parquet"))
        views["part"] = part
        # part 30 (Brand#1): quantities 1, 10, 10, 10 -> avg 7.75,
        # 0.2*avg = 1.55 -> only the q=1 line (price 7.00) qualifies
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "l_partkey": pa.array([30, 30, 30, 30, 31], pa.int64()),
            "l_suppkey": pa.array([20] * 5, pa.int64()),
            "l_quantity": pa.array([1.0, 10.0, 10.0, 10.0, 1.0]),
            "l_extendedprice": pa.array([7.0, 70.0, 70.0, 70.0, 5.0]),
            "l_discount": pa.array([0.0] * 5),
            "l_shipdate": pa.array([dt.datetime(1997, 2, 1)] * 5,
                                   pa.timestamp("us"))})
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        views["lineitem"] = li
        got = sorted(tuple(r.values()) for r in q_lineitem_small_qty(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_LINEITEM_SMALL_QTY)
                      .fetchall())
        assert got == want
        assert got == [(1, 700)]

    def test_basket_brand_lift(self, ray_session, tmp_path):
        from ontoray.queries import SQL_BASKET_BRAND_LIFT, q_basket_brand_lift
        views = _star(tmp_path)
        part = pa.table({"p_partkey": pa.array([30, 31, 32], pa.int64()),
                         "p_type": pa.array(["PROMO"] * 3, pa.string()),
                         "p_brand": pa.array(["A", "B", "C"], pa.string())})
        pq.write_table(part, str(tmp_path / "part.parquet"))
        views["part"] = part
        # order 1: {A, B} (A twice -> distinct), order 2: {A, B, C},
        # order 3: {C}
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
            "l_partkey": pa.array([30, 30, 31, 30, 31, 32, 32], pa.int64()),
            "l_suppkey": pa.array([20] * 7, pa.int64()),
            "l_extendedprice": pa.array([1.0] * 7),
            "l_discount": pa.array([0.0] * 7),
            "l_quantity": pa.array([1.0] * 7),
            "l_shipdate": pa.array([dt.datetime(1997, 2, 1)] * 7,
                                   pa.timestamp("us"))})
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        views["lineitem"] = li
        got = sorted(tuple(r.values()) for r in q_basket_brand_lift(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_BASKET_BRAND_LIFT).fetchall())
        assert got == want
        # n_orders=3; AB in 2 of (nA=2, nB=2) -> 1e6*2*3//4 = 1500000;
        # AC in 1 of (2,2) -> 750000; BC in 1 of (2,2) -> 750000
        assert got == [("A", "B", 2, 2, 2, 1500000),
                       ("A", "C", 1, 2, 2, 750000),
                       ("B", "C", 1, 2, 2, 750000)]

    def test_docs_lang_confusion(self, ray_session, tmp_path):
        from ontoray.queries import (q_docs_lang_confusion,
                                     sql_docs_lang_confusion)
        # 'the and of' -> en profile; declared labels differ on purpose
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["the cat and the dog of note",
                              "the cat and the dog of note",
                              "zzz qqq"], pa.string()),
            "lang": pa.array(["en", "de", "en"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_lang_confusion(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_docs_lang_confusion()).fetchall())
        assert got == want
        assert ("de", "en", 1) in got and ("en", "und", 1) in got


class TestRecallInterarrivalReciprocityOpen:
    def test_events_interarrival(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_EVENTS_INTERARRIVAL,
                                     q_events_interarrival)
        # user 1 type a: gaps 30s (bucket 0), 90min (capped to 60);
        # user 1 type b: single event (no gap); user 2 type a: gap 5min
        rows = [
            (1, 1, "a", dt.datetime(2024, 1, 1, 10, 0, 0)),
            (2, 1, "a", dt.datetime(2024, 1, 1, 10, 0, 30)),
            (3, 1, "a", dt.datetime(2024, 1, 1, 11, 30, 30)),
            (4, 1, "b", dt.datetime(2024, 1, 1, 10, 0, 0)),
            (5, 2, "a", dt.datetime(2024, 1, 1, 10, 0, 0)),
            (6, 2, "a", dt.datetime(2024, 1, 1, 10, 5, 0)),
        ]
        events = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us"))})
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_interarrival(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(SQL_EVENTS_INTERARRIVAL).fetchall())
        assert got == want
        assert got == [("a", 0, 1), ("a", 5, 1), ("a", 60, 1)]

    def test_kg_edge_reciprocity(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_edge_reciprocity_from
        trip = pa.table({
            "subj_norm": pa.array(["a", "b", "a", "c", "d"], pa.string()),
            "pred_norm": pa.array(["p", "q", "r", "p", "p"], pa.string()),
            "obj_norm": pa.array(["b", "a", "b", "d", "d"], pa.string()),
            "conf": pa.array([0.9] * 5, pa.float32()),
            "n_obs": pa.array([1] * 5, pa.int64())})
        # directed distinct pairs (self-loop d->d dropped): a->b, b->a, c->d
        # -> 3 edges, a<->b reciprocated (2 edges)
        got = q_kg_edge_reciprocity_from(
            rd.from_arrow(trip).repartition(2)).to_pandas()
        assert got.to_dict("records") == [
            {"n_edges": 3, "n_recip_edges": 2,
             "reciprocity_micro": 666666}]

    def test_orders_open_by_month(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_ORDERS_OPEN_BY_MONTH,
                                     q_orders_open_by_month)
        views = _star(tmp_path)
        # order 1: Jan->Mar (last ship Mar); order 2: Feb, no lineitem
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 10], pa.int64()),
            "o_orderdate": pa.array([dt.datetime(1997, 1, 15),
                                     dt.datetime(1997, 2, 10)],
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string())})
        li = pa.table({
            "l_orderkey": pa.array([1, 1], pa.int64()),
            "l_partkey": pa.array([30, 30], pa.int64()),
            "l_suppkey": pa.array([20, 20], pa.int64()),
            "l_extendedprice": pa.array([1.0, 1.0]),
            "l_discount": pa.array([0.0, 0.0]),
            "l_quantity": pa.array([1.0, 1.0]),
            "l_shipdate": pa.array([dt.datetime(1997, 2, 1),
                                    dt.datetime(1997, 3, 20)],
                                   pa.timestamp("us"))})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        views["orders"], views["lineitem"] = orders, li
        got = sorted(tuple(r.values()) for r in q_orders_open_by_month(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_ORDERS_OPEN_BY_MONTH)
                      .fetchall())
        assert got == want
        # Jan: 1 open; Feb: 2 (order2 opens+closes Feb -> delta rows at
        # 199702 (+1) and 199703 (-1)); Mar: 1 (order1 still open), Apr: 0
        assert got == [(199701, 1), (199702, 2), (199703, 1), (199704, 0)]

    def test_ann_recall_eval_perfect_on_tiny(self, ray_session, tmp_path):
        # semantics-only check on the real sf0.001 tables is covered by the
        # driver gate; here: recall over identical inputs is k-bounded and
        # the micro ratio uses division last
        from ontoray.queries import q_ann_recall_eval
        row = q_ann_recall_eval("/root/testdata/sf0.001", k=5)\
            .to_pandas().to_dict("records")[0]
        assert row["k"] == 5
        assert 0 <= row["n_hits"] <= 5
        assert row["recall_micro"] == 1_000_000 * row["n_hits"] // 5


class TestCouplingReorderCosineWordlen:
    def test_kg_coupling(self, ray_session):
        import ray.data as rd
        from ontoray.queries import q_kg_coupling_from
        trip = pa.table({
            "subj_norm": pa.array(["a", "a", "b", "b", "c", "c"],
                                  pa.string()),
            "pred_norm": pa.array(["p"] * 6, pa.string()),
            "obj_norm": pa.array(["x", "y", "x", "y", "x", "z"],
                                 pa.string()),
            "conf": pa.array([0.9] * 6, pa.float32()),
            "n_obs": pa.array([1] * 6, pa.int64())})
        # a&b share {x,y} (2); a&c share {x} (1, below min); b&c share {x}
        got = sorted(tuple(r.values()) for r in q_kg_coupling_from(
            rd.from_arrow(trip).repartition(2)).to_pandas()
            .to_dict("records"))
        assert got == [("a", "b", 2)]

    def test_orders_reorder_interval(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_ORDERS_REORDER_INTERVAL,
                                     q_orders_reorder_interval)
        views = _star(tmp_path)
        # cust 10: gaps 10 days (1 week) and 400 days (capped 52);
        # cust 11: single order
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([10, 10, 10, 11], pa.int64()),
            "o_orderdate": pa.array(
                [dt.datetime(1997, 1, 1), dt.datetime(1997, 1, 11),
                 dt.datetime(1998, 2, 15), dt.datetime(1997, 5, 1)],
                pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string())})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        views["orders"] = orders
        got = sorted(tuple(r.values()) for r in q_orders_reorder_interval(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_ORDERS_REORDER_INTERVAL)
                      .fetchall())
        assert got == want
        assert got == [(1, 1), (52, 1)]

    def test_embed_cosine_hist(self, ray_session, tmp_path):
        from ontoray.queries import SQL_EMBED_COSINE_HIST, q_embed_cosine_hist
        # ids 0..5 with a GAP at 3: pairs (0,1),(1,2),(4,5); vectors chosen
        # for exact cosines 1.0, -1.0, 0.0
        emb = pa.table({
            "vec_id": pa.array([0, 1, 2, 4, 5], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [2.0, 0.0], [-1.0, 0.0],
                 [0.0, 3.0], [5.0, 0.0]],
                pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = sorted(tuple(r.values()) for r in q_embed_cosine_hist(
            str(tmp_path), bucket_size=4).to_pandas().to_dict("records"))
        want = sorted(_duck({"embeddings": emb})
                      .execute(SQL_EMBED_COSINE_HIST).fetchall())
        assert got == want
        # cos buckets: 1.0 -> 10, -1.0 -> -10, 0.0 -> 0
        assert got == [(-10, 1), (0, 1), (10, 1)]

    def test_embed_cosine_hist_bucket_boundary(self, ray_session, tmp_path):
        from ontoray.queries import q_embed_cosine_hist
        # ids straddling a bucket boundary at 4 (bucket_size=4): the pair
        # (3,4) must be computed exactly once via the duplicated lead row
        emb = pa.table({
            "vec_id": pa.array([3, 4], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [1.0, 0.0]],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = q_embed_cosine_hist(str(tmp_path), bucket_size=4)\
            .to_pandas().to_dict("records")
        assert got == [{"cos_bucket": 10, "n_pairs": 1}]

    def test_docs_wordlen_profile(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_DOCS_WORDLEN_PROFILE,
                                     q_docs_wordlen_profile)
        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["ab abc ab", "x " + "y" * 30], pa.string()),
            "lang": pa.array(["en", "de"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_wordlen_profile(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_WORDLEN_PROFILE).fetchall())
        assert got == want
        # en: two len-2, one len-3; de: len-1 and len-30 capped to 20
        assert got == [("de", 1, 1), ("de", 20, 1), ("en", 2, 2),
                       ("en", 3, 1)]


class TestYoySurvivorshipOverlap:
    def test_orders_yoy_growth(self, ray_session, tmp_path):
        from ontoray.queries import SQL_ORDERS_YOY_GROWTH, q_orders_yoy_growth
        views = _star(tmp_path)
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_custkey": pa.array([10, 10, 10, 11, 11], pa.int64()),
            "o_orderdate": pa.array(
                [dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1),
                 dt.datetime(1998, 6, 1), dt.datetime(1997, 5, 1),
                 dt.datetime(1998, 5, 1)],
                pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 5, pa.string()),
            "o_totalprice": pa.array([100.0, 80.0, 70.0, 7.0, 3.33])})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        views["orders"] = orders
        got = sorted(tuple(r.values()) for r in q_orders_yoy_growth(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck(views).execute(SQL_ORDERS_YOY_GROWTH).fetchall())
        assert got == want
        # NATION_7 (cust 10): 1997=10000c, 1998=15000c -> +50%;
        # NATION_8 (cust 11): 700c -> 333c: 1e6*(-367)/700 = -524285.71,
        # TRUNCATED toward zero (DuckDB // semantics), not floored
        assert got == [("NATION_7", 1998, 15000, 10000, 500000),
                       ("NATION_8", 1998, 333, 700, -524285)]

    def test_docs_dedup_survivorship(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_DOCS_DEDUP_SURVIVORSHIP,
                                     q_docs_dedup_survivorship)
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["dup", "dup", "dup", "solo", "other"],
                             pa.string()),
            "source": pa.array(["web", "web", "book", "book", "web"],
                               pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_dedup_survivorship(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_DEDUP_SURVIVORSHIP).fetchall())
        assert got == want
        # winner of 'dup' is doc 0 (web); doc 1 (web) and 2 (book) drop
        assert got == [("book", 2, 1, 1), ("web", 3, 2, 1)]

    def test_docs_source_overlap(self, ray_session, tmp_path):
        from ontoray.queries import (SQL_DOCS_SOURCE_OVERLAP,
                                     q_docs_source_overlap)
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "b c d", "c d e x"], pa.string()),
            "source": pa.array(["s1", "s2", "s3"], pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_source_overlap(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(SQL_DOCS_SOURCE_OVERLAP).fetchall())
        assert got == want
        # s1={a,b,c}, s2={b,c,d}, s3={c,d,e,x}
        assert got == [("s1", "s2", 2, 3, 3, 500000),
                       ("s1", "s3", 1, 3, 4, 166666),
                       ("s2", "s3", 2, 3, 4, 400000)]

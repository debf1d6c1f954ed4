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

"""Session-10 additions: containment dedup pairs, filtered ANN, PQ-ADC
refine, session path analysis, and the grouped-argmax favorite-brand join.
Each test checks hand-computed semantics on a micro fixture AND bit-parity
with the DuckDB mirror."""

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


class TestContainment:
    def test_containment_vs_mirror_and_asymmetry(self, ray_session, tmp_path):
        from ontoray.extras.dedup import sql_containment_pairs
        from ontoray.queries import q_docs_containment
        # doc 2 is a small quote fully contained in doc 1; doc 3 unrelated.
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["alpha beta gamma delta epsilon zeta",
                     "beta gamma delta epsilon",
                     "one two three four five six seven"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = sorted(tuple(r.values()) for r in q_docs_containment(
            str(tmp_path), threshold=0.5).to_pandas().to_dict("records"))
        want = sorted(_duck({"documents": docs})
                      .execute(sql_containment_pairs()).fetchall())
        assert got == want
        # doc2 has 2 trigram shingles, both inside doc1's 4 -> containment 1.0
        assert len(got) == 1
        (a, b, c, na, nb, cont) = got[0]
        assert (a, b, cont) == (1, 2, 1.0) and c == 2 and (na, nb) == (4, 2)
        # the same pair's jaccard is 2/4 = 0.5 — below the 0.8 dedup bar,
        # which is exactly the asymmetric case containment exists to catch
        from ontoray.extras.dedup import jaccard_pairs
        import ray.data as rd
        j = jaccard_pairs(rd.read_parquet(str(tmp_path / "documents.parquet")),
                          threshold=0.8).take_all()
        assert j == []


class TestAnnFiltered:
    def test_filtered_topk(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.queries import q_ann_filtered, sql_ann_filtered
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((30, 4)).astype(np.float32)
        emb = pa.table({
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([i % 7 for i in range(30)], pa.int32())})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = q_ann_filtered(str(tmp_path), k=5, mod=3).to_pandas()
        want = _duck({"embeddings": emb}).execute(
            sql_ann_filtered(str(tmp_path), k=5, mod=3)).fetch_df()
        assert sorted(map(tuple, got.values.tolist())) == \
            sorted(map(tuple, want.values.tolist()))
        # every returned id satisfies the predicate
        assert all((v % 7) % 3 == 0 for v in got["vec_id"])


class TestAnnRefine:
    def test_refine_vs_mirror_and_recall(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.queries import q_ann_refine, sql_ann_refine
        from ontoray.extras.ann import brute_force_topk, query_vector
        rng = np.random.default_rng(9)
        vecs = rng.standard_normal((40, 4)).astype(np.float32)
        emb = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = q_ann_refine(str(tmp_path), k=3, r=8, m=2, kq=2,
                           iters=2).to_pandas()
        want = _duck({"embeddings": emb}).execute(
            sql_ann_refine(str(tmp_path), k=3, r=8, m=2, kq=2,
                           iters=2)).fetch_df()
        assert sorted(map(tuple, got.values.tolist())) == \
            sorted(map(tuple, want.values.tolist()))
        # with r = corpus size the refine answer IS the exact answer
        import ray.data as rd
        full = q_ann_refine(str(tmp_path), k=3, r=40, m=2, kq=2,
                            iters=2).to_pandas()
        exact = brute_force_topk(
            rd.read_parquet(str(tmp_path / "embeddings.parquet")),
            query_vector(4), k=3).to_pandas()
        assert sorted(full["vec_id"]) == sorted(exact["vec_id"])


class TestEventsPaths:
    def test_paths(self, ray_session, tmp_path):
        from ontoray.queries import q_events_paths, sql_events_paths
        base = pd.Timestamp("2024-01-01 10:00:00")
        # user 1: session A (view>click>buy>extra), session B (view) after
        # a 2h gap; user 2: one session (click>click)
        rows = [
            (1, 1, base, "view"), (2, 1, base + pd.Timedelta("5min"), "click"),
            (3, 1, base + pd.Timedelta("10min"), "buy"),
            (4, 1, base + pd.Timedelta("15min"), "extra"),
            (5, 1, base + pd.Timedelta("3h"), "view"),
            (6, 2, base, "click"), (7, 2, base + pd.Timedelta("1min"), "click"),
        ]
        events = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2].to_pydatetime() for r in rows],
                           pa.timestamp("us")),
            "event_type": [r[3] for r in rows]})
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = sorted(tuple(r.values()) for r in q_events_paths(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"events": events})
                      .execute(sql_events_paths()).fetchall())
        assert got == want
        # depth=3 truncates session A; singleton and repeat paths counted
        assert got == [("click>click", 1), ("view", 1),
                       ("view>click>buy", 1)]


class TestFavoriteBrand:
    def test_argmax_with_tie(self, ray_session, tmp_path):
        from ontoray.queries import (q_custs_favorite_brand,
                                     sql_custs_favorite_brand)
        part = pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": ["Brand#B", "Brand#A", "Brand#C"]})
        orders = pa.table({
            "o_orderkey": pa.array([10, 11, 12], pa.int64()),
            "o_custkey": pa.array([100, 100, 200], pa.int64())})
        # cust 100: Brand#B qty 5, Brand#A qty 5 (tie -> Brand#A);
        # cust 200: Brand#C qty 1
        lineitem = pa.table({
            "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
            "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
            "l_quantity": [5.0, 3.0, 2.0, 1.0]})
        for n, t in [("part", part), ("orders", orders),
                     ("lineitem", lineitem)]:
            pq.write_table(t, str(tmp_path / f"{n}.parquet"))
        got = sorted(tuple(r.values()) for r in q_custs_favorite_brand(
            str(tmp_path)).to_pandas().to_dict("records"))
        want = sorted(_duck({"part": part, "orders": orders,
                             "lineitem": lineitem})
                      .execute(sql_custs_favorite_brand()).fetchall())
        assert got == want
        assert got == [("Brand#A", 1), ("Brand#C", 1)]

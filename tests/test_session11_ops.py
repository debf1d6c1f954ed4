"""Session-11 additions: bloom-filter FPR referee, cluster-stratified
coreset sampling, grouped OLS revenue trend, sliding 7-day WAU, and
idf-weighted Jaccard near-dup pairs.  Each test checks hand-computed
semantics on a micro fixture AND bit-parity with the DuckDB mirror."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _duck(views: dict) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name, tbl in views.items():
        con.register(name, tbl)
    return con


class TestBloomFprEval:
    def test_fpr_vs_mirror_nonvacuous(self, ray_session, tmp_path):
        from ontoray.queries import q_bloom_fpr_eval, sql_bloom_fpr_eval
        orders = pa.table({
            "o_orderkey": pa.array(list(range(1, 41)), pa.int64())})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        # 40 keys x 2 hashes into 64 bits -> heavily loaded, FPs guaranteed
        got = q_bloom_fpr_eval(str(tmp_path), m_bits=64, kh=2,
                               n_probe=200).to_pandas()
        want = _duck({"orders": orders}).execute(
            sql_bloom_fpr_eval(m_bits=64, kh=2, n_probe=200)).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        row = got.iloc[0]
        assert row["n_train"] == 40
        assert 0 < row["n_bits_set"] <= 64
        # load factor ~0.7+ of 64 bits: the probe MUST see false positives
        assert row["n_fp"] > 0
        assert row["fpr_micro"] == row["n_fp"] * 1_000_000 // 200

    def test_sparse_filter_low_fpr(self, ray_session, tmp_path):
        from ontoray.queries import q_bloom_fpr_eval
        orders = pa.table({"o_orderkey": pa.array([1, 2, 3], pa.int64())})
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        got = q_bloom_fpr_eval(str(tmp_path), m_bits=4096, kh=2,
                               n_probe=500).to_pandas().iloc[0]
        # 3 keys in 4096 bits: expected FPR ~ (6/4096)^2 ~ 2e-6
        assert got["n_fp"] <= 1


class TestEmbedCoreset:
    def test_cap_and_mirror(self, ray_session, tmp_path):
        import numpy as np
        from ontoray.queries import q_embed_coreset, sql_embed_coreset
        rng = np.random.default_rng(7)
        # two well-separated blobs of 6 vectors each, dim 4
        vecs = np.concatenate([
            rng.normal(0.0, 0.05, (6, 4)), rng.normal(5.0, 0.05, (6, 4))])
        emb = pa.table({
            "vec_id": pa.array(list(range(12)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        got = q_embed_coreset(str(tmp_path), k=2, cap=3,
                              iters=1).to_pandas()
        want = _duck({"embeddings": emb}).execute(
            sql_embed_coreset(k=2, cap=3, iters=1)).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        # every cell capped at 3, ranks are 1..n within the cell
        per = got.groupby("cluster")["rn"].agg(["count", "max"])
        assert (per["count"] <= 3).all()
        assert (per["max"] == per["count"]).all()
        # 12 vectors across <=2 cells with cap 3: truncation MUST fire
        assert 1 <= len(got) < 12 and len(got) <= 6


class TestOrdersTrend:
    def test_known_slope_vs_mirror(self, ray_session, tmp_path):
        from ontoray.queries import q_orders_trend, sql_orders_trend
        nation = pa.table({
            "n_nationkey": pa.array([0, 1], pa.int32()),
            "n_name": ["ALPHA", "BETA"]})
        customer = pa.table({
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_nationkey": pa.array([0, 1], pa.int32())})
        dates = [pd.Timestamp(s).date() for s in
                 ["2024-01-15", "2024-02-10", "2024-03-05", "2024-01-20"]]
        orders = pa.table({
            "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
            "o_totalprice": [1.00, 2.00, 3.00, 9.99],
            "o_orderdate": pa.array(dates, pa.date32())})
        for n, t in [("nation", nation), ("customer", customer),
                     ("orders", orders)]:
            pq.write_table(t, str(tmp_path / f"{n}.parquet"))
        x0 = 2024 * 12  # month index of 2024-01 -> x = 0, 1, 2
        got = q_orders_trend(str(tmp_path), x0=x0).to_pandas()
        want = _duck({"nation": nation, "customer": customer,
                      "orders": orders}).execute(sql_orders_trend(x0=x0)).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        a = got.set_index("n_name").loc["ALPHA"]
        # y = 100, 200, 300 cents at x = 0, 1, 2 -> slope 100 cents/month
        assert a["n_months"] == 3 and a["num"] == 600 and a["den"] == 6
        assert a["slope"] == 100.0
        b = got.set_index("n_name").loc["BETA"]
        assert b["n_months"] == 1 and b["den"] == 0 and b["slope"] == 0.0


class TestEventsWau:
    def test_sliding_window_vs_mirror(self, ray_session, tmp_path):
        from ontoray.queries import q_events_wau, sql_events_wau
        base = pd.Timestamp("2024-01-01 08:00:00")
        rows = [  # (user, ts)
            (1, base), (2, base), (2, base + pd.Timedelta(hours=1)),
            (2, base + pd.Timedelta(days=3)),
            (3, base + pd.Timedelta(days=19)),
        ]
        events = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1].to_pydatetime() for r in rows],
                           pa.timestamp("us"))})
        pq.write_table(events, str(tmp_path / "events.parquet"))
        got = q_events_wau(str(tmp_path)).to_pandas()
        want = _duck({"events": events}).execute(sql_events_wau()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        d0 = int(base.value // 1000) // 86_400_000_000
        by_day = dict(zip(got["day"], got["wau"]))
        # observed days only; day0+3 still sees both users' day-0 activity;
        # day0+19 is >6 days past everything but user 3
        assert by_day == {d0: 2, d0 + 3: 2, d0 + 19: 1}


class TestWeightedJaccard:
    def test_idf_weighting_kills_boilerplate(self, ray_session, tmp_path):
        from ontoray.extras.dedup import sql_weighted_jaccard_pairs
        from ontoray.queries import q_docs_weighted_jaccard
        template = "copyright footer terms"
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                f"unique alpha beta gamma delta {template}",
                f"unique alpha beta gamma delta {template}",
                f"xx {template}",
                f"yy {template}"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = q_docs_weighted_jaccard(str(tmp_path)).to_pandas()
        want = _duck({"documents": docs}).execute(
            sql_weighted_jaccard_pairs()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        # docs 3/4 share ONLY the df=4 template shingle: unweighted Jaccard
        # would be 1/3 (>= 0.3 threshold) but the idf weight (10^6 // 4)
        # drops the weighted ratio to ~0.11 -> pruned.  The identical pair
        # survives at exactly 1.0.
        pairs = {(r["doc_a"], r["doc_b"]): r["wj_micro"]
                 for r in got.to_dict("records")}
        assert set(pairs) == {(1, 2)}
        assert pairs[(1, 2)] == 1_000_000


class TestTypoPairs:
    def test_lev1_kernel_exact(self):
        from ontoray.extras.dedup import _lev_is_one
        try:
            import Levenshtein  # noqa: F401
            have_ref = True
        except ImportError:
            have_ref = False

        def ref(a, b):
            # classic DP, the definition
            la, lb = len(a), len(b)
            prev = list(range(lb + 1))
            for i in range(1, la + 1):
                cur = [i] + [0] * lb
                for j in range(1, lb + 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                                 prev[j - 1] + (a[i - 1] != b[j - 1]))
                prev = cur
            return prev[lb]

        import random
        rng = random.Random(7)
        alpha = "abcd"
        for _ in range(500):
            a = "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(1, 8)))
            b = "".join(rng.choice(alpha)
                        for _ in range(rng.randrange(1, 8)))
            assert _lev_is_one(a, b) == (ref(a, b) == 1), (a, b)
        assert have_ref or True  # ref DP is the oracle; lib optional

    def test_symspell_blocking_vs_mirror(self, ray_session, tmp_path):
        import ray.data as rd

        from ontoray.extras.dedup import sql_typo_pairs, typo_pairs
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "widget widget widget widget widget wdget",   # deletion
                "widget bolts bolts bolts bolts boltz",       # substitution
                "bolts widgget",                              # insertion
                "rare raare",   # neither side frequent -> pruned
                "widget bolts"]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"),
                             columns=["text"])
        got = typo_pairs(ds, min_freq=5, min_len=4).to_pandas()
        want = _duck({"documents": docs}).execute(sql_typo_pairs()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        pairs = {(r["tok_a"], r["tok_b"]) for r in got.to_dict("records")}
        # deletion, substitution, insertion all found through the shared
        # deletion-variant block; the rare/raare pair fails the
        # max(n) >= min_freq floor
        assert pairs == {("wdget", "widget"), ("bolts", "boltz"),
                         ("widget", "widgget")}

    def test_injected_query_nonvacuous_vs_mirror(self, ray_session):
        from ontoray.queries import q_vocab_typo_pairs, sql_vocab_typo_pairs
        sf = "/root/testdata/sf0.001"
        got = q_vocab_typo_pairs(sf).to_pandas()
        con = duckdb.connect()
        for t in ("documents",):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf}/{t}.parquet')")
        want = con.execute(sql_vocab_typo_pairs()).df()
        assert len(got) == len(want) > 0
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w


class TestSnmPairs:
    def test_window_and_boundary_vs_mirror(self, ray_session, tmp_path):
        import ray.data as rd

        from ontoray.extras.dedup import snm_pairs, sql_snm_pairs
        # 12 docs: sorted-by-prefix neighbors 1/2 and 7/8 are near-dups;
        # 1 and 12 are near-dups but FAR APART in sort order -> SNM must
        # miss them (the documented trade); ranks straddle several w=3
        # rank blocks so boundary replication is exercised.
        mk = lambda p, body: f"{p} {body}"
        docs = pa.table({
            "doc_id": pa.array(list(range(1, 13)), pa.int64()),
            "text": [
                mk("aaa", "common text body one two three"),
                mk("aab", "common text body one two three"),
                mk("bbb", "totally different words here now"),
                mk("ccc", "unrelated content alpha beta gamma"),
                mk("ddd", "unrelated content delta epsilon zeta"),
                mk("eee", "more filler text goes right here"),
                mk("fff", "shared duplicate payload four five six"),
                mk("ffg", "shared duplicate payload four five six"),
                mk("ggg", "yet another unique document body"),
                mk("hhh", "final unique document text body"),
                mk("iii", "penultimate unique words in doc"),
                mk("zzz", "common text body one two three")]})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        ds = rd.read_parquet(str(tmp_path / "documents.parquet"),
                             columns=["doc_id", "text"])
        got = snm_pairs(ds, window=3, threshold=0.5).to_pandas()
        want = _duck({"documents": docs}).execute(
            sql_snm_pairs(window=3, threshold=0.5)).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        pairs = {(r["doc_a"], r["doc_b"]) for r in got.to_dict("records")}
        assert (1, 2) in pairs and (7, 8) in pairs
        assert (1, 12) not in pairs and (2, 12) not in pairs


class TestZorderLayout:
    def test_blocks_vs_mirror_and_pruning(self, ray_session, tmp_path):
        import numpy as np
        import ray.data as rd

        from ontoray.extras.layout import sql_zorder_layout, zorder_layout
        rng = np.random.RandomState(11)
        n = 4000
        x = rng.randint(0, 1000, n)
        y = rng.randint(0, 1000, n)
        tbl = pa.table({
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "tie": pa.array(np.arange(n), pa.int64())})
        pq.write_table(tbl, str(tmp_path / "pts.parquet"))
        ds = rd.read_parquet(str(tmp_path / "pts.parquet"))
        got = zorder_layout(ds, "x", "y", "tie",
                            block_rows=128).to_pandas()
        want = _duck({"pts": tbl}).execute(sql_zorder_layout(
            "pts", "x", "y", "tie", block_rows=128)).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        # the whole point: on uniform 2-d data a quarter-square probe scans
        # a MINORITY of z-ordered blocks (zone maps prune the rest)
        frac = got["scanned"].mean()
        assert 0 < frac < 0.5, frac
        assert int(got["n"].sum()) == n


class TestSourceLangChi2:
    def test_known_grid_vs_mirror(self, ray_session, tmp_path):
        from ontoray.queries import (q_docs_source_lang_chi2,
                                     sql_docs_source_lang_chi2)
        # 2x2 with a strong association: s1->en, s2->de (plus noise)
        src = ["s1"] * 10 + ["s2"] * 10
        lang = ["en"] * 9 + ["de"] + ["de"] * 8 + ["en"] * 2
        docs = pa.table({
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "source": pa.array(src, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "text": pa.array(["x"] * 20, pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = q_docs_source_lang_chi2(str(tmp_path)).to_pandas()
        want = _duck({"documents": docs}).execute(
            sql_docs_source_lang_chi2()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        # hand check the (s1, en) cell: o=9, r=10, c=11, n=20
        # e_micro = 10*11*1e6 // 20 = 5_500_000; dev = 3_500_000
        # chi2_milli = dev^2 // (e_micro * 1000) = 12_250e9 // 5.5e9 = 2227
        cell = got[(got.source == "s1") & (got.lang == "en")].iloc[0]
        assert (cell.o, cell.r_tot, cell.c_tot, cell.n) == (9, 10, 11, 20)
        assert cell.chi2_milli == (3_500_000 ** 2) // (5_500_000 * 1000)
        # all four cells present, chi2 symmetric-ish and large
        assert len(got) == 4
        assert got.chi2_milli.sum() > 9_000  # chi2 ~ 9.9 for this table


class TestBenford:
    def test_known_digits_vs_mirror(self, ray_session, tmp_path):
        from ontoray.queries import q_lineitem_benford, sql_lineitem_benford
        # prices whose cents values have known first digits:
        # 1.00->100(d1), 2.50->250(d2), 0.99->99(d9), 35.00->3500(d3),
        # 0.00 dropped (c=0), 9.99->999(d9)
        li = pa.table({
            "l_extendedprice": pa.array([1.00, 2.50, 0.99, 35.00, 0.00,
                                         9.99], pa.float64())})
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        got = q_lineitem_benford(str(tmp_path)).to_pandas()
        want = _duck({"lineitem": li}).execute(sql_lineitem_benford()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        by_d = dict(zip(got["digit"], got["o"]))
        assert by_d == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0,
                        9: 2}
        assert got["n"].iloc[0] == 5  # the zero-cents row is excluded
        # hand check digit 1: o=1, e_micro = 5 * 301030
        e = 5 * 301030
        dev = 1_000_000 - e
        assert int(got[got.digit == 1]["chi2_milli"].iloc[0]) == \
            (dev * dev) // (e * 1000)


class TestDowHour:
    def test_known_timestamps_vs_mirror(self, ray_session, tmp_path):
        import numpy as np
        # 1970-01-01 00:30 UTC = Thursday(4) hour 0;
        # 1970-01-04 23:10 UTC = Sunday(0) hour 23 (x2)
        us = [30 * 60_000_000,
              3 * 86_400_000_000 + 23 * 3_600_000_000 + 600_000_000,
              3 * 86_400_000_000 + 23 * 3_600_000_000 + 660_000_000]
        events = pa.table({
            "ts": pa.array(np.array(us, np.int64), pa.timestamp("us"))})
        pq.write_table(events, str(tmp_path / "events.parquet"))
        from ontoray.queries import q_events_dow_hour, sql_events_dow_hour
        got = q_events_dow_hour(str(tmp_path)).to_pandas()
        want = _duck({"events": events}).execute(sql_events_dow_hour()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        cells = {(r["dow"], r["hour"]): r["n"] for r in got.to_dict("records")}
        assert cells == {(4, 0): 1, (0, 23): 2}


class TestAdviceNullSafety:
    """ADVICE r3 regressions: NULL text / NULL grid keys must be treated
    identically by the engine and its DuckDB mirror."""

    def test_kappa_null_text(self, ray_session, tmp_path):
        from ontoray.queries import q_docs_kappa, sql_docs_kappa
        texts = ["a" * 250 + " " * 50, None, "short", " " * 60, None,
                 "b" * 300]
        docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts, pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = q_docs_kappa(str(tmp_path)).to_pandas()
        want = _duck({"documents": docs}).execute(sql_docs_kappa()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        # the two NULL docs land in both_neg alongside "short"
        assert int(got["n"].iloc[0]) == 6
        assert int(got["both_neg"].iloc[0]) >= 3

    def test_chi2_null_keys_dropped(self, ray_session, tmp_path):
        from ontoray.queries import (q_docs_source_lang_chi2,
                                     sql_docs_source_lang_chi2)
        src = ["s1", "s1", None, "s2", "s2", None]
        lang = ["en", "de", "en", None, "de", None]
        docs = pa.table({
            "doc_id": pa.array(range(6), pa.int64()),
            "source": pa.array(src, pa.string()),
            "lang": pa.array(lang, pa.string())})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        got = q_docs_source_lang_chi2(str(tmp_path)).to_pandas()
        want = _duck({"documents": docs}).execute(
            sql_docs_source_lang_chi2()).df()
        g = sorted(tuple(r) for r in got.reindex(
            sorted(got.columns), axis=1).itertuples(index=False, name=None))
        w = sorted(tuple(r) for r in want.reindex(
            sorted(want.columns), axis=1).itertuples(index=False, name=None))
        assert g == w
        # only the 3 fully-keyed rows survive: (s1,en), (s1,de), (s2,de)
        assert int(got["n"].iloc[0]) == 3
        assert len(got) == 4  # complete 2x2 grid over surviving vocabularies


class TestRealDecodeKernels:
    """VERDICT r3 #9: real dependency-free decode slots — a synthesized BMP
    and WAV payload decoded through the actor pool, checked against
    hand-computed features; non-BMP/WAV payloads still raise."""

    @staticmethod
    def _bmp(width, height, pixel_fn):
        """Minimal bottom-up 24-bit BMP; pixel_fn(x, y) -> (b, g, r)."""
        import struct
        stride = ((width * 3 + 3) // 4) * 4
        rows = b""
        for y in reversed(range(height)):       # bottom-up storage
            row = b"".join(bytes(pixel_fn(x, y)) for x in range(width))
            rows += row + b"\x00" * (stride - len(row))
        body = rows
        header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                  + struct.pack("<iiHHIIiiII", 40, 0, 0, 0, 0, 0, 0, 0, 0, 0))
        # patch the info header properly: size/w/h/planes/bpp/compression
        info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                           len(body), 2835, 2835, 0, 0)
        return b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54) + info + body

    @staticmethod
    def _wav(samples, rate=8000, channels=1):
        import struct
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * 2, channels * 2, 16)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    def test_bmp_through_actor_pool(self, ray_session):
        import numpy as np
        import ray.data as rd
        from ontoray.extras.multimodal import decode_images
        # 10x6 two-tone: left half dark gray, right half white
        payload = self._bmp(10, 6, lambda x, y: (40, 40, 40) if x < 5
                            else (255, 255, 255))
        ds = rd.from_arrow(pa.table({
            "url": pa.array(["img-1"], pa.string()),
            "payload": pa.array([payload], pa.binary())}))
        row = decode_images(ds, fake=False).take_all()[0]
        assert (row["width"], row["height"]) == (10, 6)
        assert row["n_bytes"] == len(payload)
        # luma: gray=40, white=255, half each
        want_luma = ((40 + 255) / 2) / 255.0
        assert abs(row["mean_luma"] - want_luma) < 1e-6
        # ahash: width 10 splits into index cells [2,2,1,1,1,1,1,1], so the
        # x>=5 white half covers the right FIVE grid columns in every row
        bits = format(row["phash"], "064b")
        rows8 = [bits[i * 8:(i + 1) * 8] for i in range(8)]
        # height 6 -> row cells [1]*6 + two EMPTY cells (score 0 -> bits 0)
        assert rows8 == ["00011111"] * 6 + ["00000000"] * 2, rows8

    def test_wav_through_actor_pool(self, ray_session):
        import math
        import ray.data as rd
        from ontoray.extras.multimodal import decode_audio
        n, rate = 8000, 8000                     # exactly 1 s
        samples = [int(20000 * math.sin(2 * math.pi * 440 * i / rate))
                   for i in range(n)]
        payload = self._wav(samples, rate=rate)
        clipped = self._wav([32767, -32768, 0, 5], rate=rate)
        ds = rd.from_arrow(pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "payload": pa.array([payload, clipped], pa.binary())}))
        rows = {r["url"]: r for r in decode_audio(ds, fake=False).take_all()}
        a = rows["a"]
        assert a["duration_ms"] == 1000 and a["sample_rate"] == rate
        # sine RMS ~ amplitude/sqrt(2)
        assert abs(a["rms"] - (20000 / 32768.0) / math.sqrt(2)) < 0.01
        assert not a["clipping"]
        assert rows["b"]["clipping"]

    def test_non_bmp_raises(self, ray_session):
        import pytest
        from ontoray.extras.multimodal import DecodeImage, DecodeAudio
        with pytest.raises(NotImplementedError, match="BMP"):
            DecodeImage(fake=False)._decode(b"\x89PNG not a bmp" * 10)
        with pytest.raises(NotImplementedError, match="PCM16"):
            DecodeAudio(fake=False)._decode(b"ID3 not a wav" * 10)

    @staticmethod
    def _png(width, height, pixel_fn, channels=3, filters=None):
        """Minimal 8-bit non-interlaced PNG; pixel_fn(x, y) -> channel
        tuple.  ``filters``: per-row filter types (default all 0) — rows
        are filtered FORWARD per the spec so the decoder must reconstruct."""
        import struct
        import zlib
        color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        bpp = channels
        raw_rows = [bytes(b for x in range(width) for b in pixel_fn(x, y))
                    for y in range(height)]
        filters = filters or [0] * height
        out = b""
        prev = bytes(width * channels)
        for y, row in enumerate(raw_rows):
            f = filters[y]
            if f == 0:
                enc = row
            elif f == 1:
                enc = bytes((row[i] - (row[i - bpp] if i >= bpp else 0)) & 255
                            for i in range(len(row)))
            elif f == 2:
                enc = bytes((row[i] - prev[i]) & 255 for i in range(len(row)))
            elif f == 3:
                enc = bytes((row[i] - (((row[i - bpp] if i >= bpp else 0)
                                        + prev[i]) >> 1)) & 255
                            for i in range(len(row)))
            else:                                  # Paeth
                def paeth(a, b, c):
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    return a if (pa_ <= pb and pa_ <= pc_) else \
                        (b if pb <= pc_ else c)
                enc = bytes((row[i] - paeth(row[i - bpp] if i >= bpp else 0,
                                            prev[i],
                                            prev[i - bpp] if i >= bpp else 0))
                            & 255 for i in range(len(row)))
            out += bytes([f]) + enc
            prev = row

        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", zlib.crc32(ctype + body)))

        ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(out)) + chunk(b"IEND", b""))

    def test_png_matches_bmp_features(self, ray_session):
        """The same pixel grid decoded from PNG (all five filter types
        exercised) and BMP must yield identical luma/ahash features."""
        import ray.data as rd
        from ontoray.extras.multimodal import decode_images

        def px_rgb(x, y):                          # gradient + blocks
            return ((x * 23 + y * 7) % 256, (x * 5) % 256, (y * 41) % 256)

        w, h = 13, 10
        png = self._png(w, h, px_rgb, channels=3,
                        filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
        bmp = self._bmp(w, h, lambda x, y: tuple(reversed(px_rgb(x, y))))
        ds = rd.from_arrow(pa.table({
            "url": pa.array(["png-1", "bmp-1"], pa.string()),
            "payload": pa.array([png, bmp], pa.binary())}))
        rows = {r["url"]: r for r in decode_images(ds, fake=False).take_all()}
        p, b = rows["png-1"], rows["bmp-1"]
        assert (p["width"], p["height"]) == (b["width"], b["height"]) == (w, h)
        assert abs(p["mean_luma"] - b["mean_luma"]) < 1e-6
        assert p["phash"] == b["phash"]

    def test_png_gray_and_alpha_variants(self, ray_session):
        from ontoray.extras.multimodal import DecodeImage
        d = DecodeImage(fake=False)
        gray = self._png(6, 4, lambda x, y: (x * 40 % 256,), channels=1)
        w, h, luma, _ = d._decode(gray)
        assert (w, h) == (6, 4) and 0.0 < luma < 1.0
        rgba = self._png(6, 4, lambda x, y: (10, 20, 30, 255), channels=4)
        w2, h2, luma2, _ = d._decode(rgba)
        want = (0.299 * 10 + 0.587 * 20 + 0.114 * 30) / 255.0
        assert (w2, h2) == (6, 4) and abs(luma2 - want) < 1e-6

    def test_png_unsupported_variants_raise(self, ray_session):
        import struct
        import zlib

        import pytest
        from ontoray.extras.multimodal import DecodeImage
        d = DecodeImage(fake=False)

        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", zlib.crc32(ctype + body)))

        # palette (color type 3) and 16-bit depth are out of scope
        for bitd, color in ((8, 3), (16, 2)):
            ihdr = struct.pack(">IIBBBBB", 4, 4, bitd, color, 0, 0, 0)
            payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                       + chunk(b"IDAT", zlib.compress(b"\x00" * 8))
                       + chunk(b"IEND", b""))
            with pytest.raises(NotImplementedError, match="PNG variant"):
                d._decode(payload)

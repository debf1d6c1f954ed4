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

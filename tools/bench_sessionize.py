"""session_windows A/B at 2M events (VERDICT r3 #4 done-bar).

Times the shipped bucket-vectorized sessionizer against the old per-key
``groupby(key).map_groups(pandas)`` implementation (reconstructed inline) on
a synthetic 2M-row event log, and asserts result equality.  Usage:

    RAY_GRAFT_CPUS=8 python tools/bench_sessionize.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

_US = 1_000_000


def _old_session_windows(events_ds, gap_s: int = 1800, key: str = "user_id"):
    """The pre-round-4 per-key implementation, verbatim."""
    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].astype("int64")
        d = ts.diff()
        new_session = d.isna() | (d > gap_s * _US)
        sid = new_session.cumsum() - 1
        out = g.assign(__sid=sid.values, __ts=ts.values).groupby("__sid").agg(
            n_events=("ts", "size"),
            session_start_us=("__ts", "min"),
            session_end_us=("__ts", "max"),
        ).reset_index()
        out[key] = g[key].iloc[0]
        out = out.rename(columns={"__sid": "session_id"})
        return pa.Table.from_pandas(
            out[[key, "session_id", "n_events", "session_start_us",
                 "session_end_us"]], preserve_index=False)

    from ontoray.stages.agg import default_coalesce
    return (events_ds.select_columns([key, "ts"])
            .repartition(default_coalesce())
            .groupby(key).map_groups(sessionize, batch_format="pandas"))


def main() -> None:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    n = int(os.environ.get("GRAFT_SESSION_ROWS", "2000000"))
    n_users = max(1000, n // 20)

    import logging

    import ray
    import ray.data as rd
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    rng = np.random.RandomState(7)
    users = rng.randint(0, n_users, n)
    ts = (np.int64(1_700_000_000) * _US
          + rng.randint(0, 30 * 86400, n).astype(np.int64) * _US)
    t = pa.table({
        "user_id": pa.array([f"u{u}" for u in users], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    ds = rd.from_arrow(t).repartition(num_cpus * 4).materialize()

    from ontoray.stages.events import session_windows
    walls = {}
    for label, fn in (("new_vectorized", session_windows),
                      ("old_per_key", _old_session_windows)):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(ds, gap_s=1800).materialize()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        walls[label] = round(best, 2)
        walls[label + "_rows"] = out.count()

    # equality spot check (full sorted compare)
    a = sorted(tuple(r.values()) for r in session_windows(ds, 1800).take_all())
    b = sorted(tuple(r.values())
               for r in _old_session_windows(ds, 1800).take_all())
    assert a == b, "session_windows mismatch vs old implementation"
    walls["equal"] = True
    walls["rows"] = n
    walls["cpus"] = num_cpus
    walls["speedup"] = round(walls["old_per_key"] / walls["new_vectorized"], 2)
    print(json.dumps(walls))
    ray.shutdown()


if __name__ == "__main__":
    main()

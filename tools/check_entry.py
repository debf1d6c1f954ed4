"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from ``__ray_entry__`` against the parquet
tables in the given sf_dir and, where an ``oracle_sql()`` entry exists,
compares row count, column-name set, and an order-insensitive value hash
against DuckDB.  Usage:

    python tools/check_entry.py [/root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(result, rd.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    # Optional committed gate log (the judge-replayable artifact asked for
    # by VERDICT r3 #1): one JSON record per query.
    log_path = os.environ.get("CHECK_ENTRY_JSON")
    log: list[dict] = []

    def record(name, status, wall, rows_ray=None, rows_sql=None,
               cols_ok=None, hash_ok=None, vhash=None, err=None):
        if log_path:
            log.append({"name": name, "status": status,
                        "wall_s": round(wall, 2), "rows_ray": rows_ray,
                        "rows_sql": rows_sql, "cols_ok": cols_ok,
                        "hash_ok": hash_ok, "value_hash": vhash, "err": err})

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {str(e)[:160]}")
            record(name, "fail", time.perf_counter() - t0,
                   err=f"ray {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        wall = time.perf_counter() - t0
        if name not in sqls:
            print(f"ROWS {name}: {len(ray_df)} rows, cols={sorted(ray_df.columns)} ({wall:.1f}s)")
            record(name, "rows_only", wall, rows_ray=len(ray_df))
            n_pass += 1
            continue
        try:
            sql_df = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: sql error {type(e).__name__}: {str(e)[:160]}")
            record(name, "fail", wall,
                   err=f"sql {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        ok_rows = len(ray_df) == len(sql_df)
        ok_cols = sorted(ray_df.columns) == sorted(sql_df.columns)
        ok_hash = value_hash(ray_df) == value_hash(sql_df) if ok_rows and ok_cols else False
        record(name, "pass" if (ok_rows and ok_cols and ok_hash) else "fail",
               wall, rows_ray=len(ray_df), rows_sql=len(sql_df),
               cols_ok=ok_cols, hash_ok=ok_hash,
               vhash=value_hash(ray_df) if ok_hash else None)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name}: {len(ray_df)} rows match ({wall:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(ray_df)}/{len(sql_df)} cols_ok={ok_cols} hash_ok={ok_hash}")
            if ok_cols and not ok_hash:
                merged_cols = sorted(ray_df.columns)
                a = ray_df.reindex(merged_cols, axis=1)
                b = sql_df.reindex(merged_cols, axis=1)
                sa = set(tuple(str(v) for v in r) for r in a.itertuples(index=False, name=None))
                sb = set(tuple(str(v) for v in r) for r in b.itertuples(index=False, name=None))
                print("   only-ray   :", list(sa - sb)[:3])
                print("   only-oracle:", list(sb - sa)[:3])
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if log_path:
        import json
        with open(log_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": log}, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

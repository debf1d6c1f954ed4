"""CLI: write a deterministic synthetic pages corpus (FIXTURES.md §1-2).

    python tools/make_corpus.py --rows 20000 --seed 42 --out /tmp/pages
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=20000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", required=True)
    p.add_argument("--shards", type=int, default=8,
                   help="parquet files to write (read parallelism)")
    args = p.parse_args()

    import pyarrow.parquet as pq
    from ontoray.pages import make_pages_corpus

    table = make_pages_corpus(args.rows, args.seed)
    os.makedirs(args.out, exist_ok=True)
    n = table.num_rows
    per = (n + args.shards - 1) // args.shards
    for i in range(args.shards):
        sl = table.slice(i * per, per)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(args.out, f"pages-{i:04d}.parquet"))
    print(f"wrote {n} rows to {args.out} in {args.shards} shards")


if __name__ == "__main__":
    main()

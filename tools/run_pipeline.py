"""CLI entry point — the `ray job submit` surface.

    ray job submit -- python tools/run_pipeline.py \
        --input /data/pages --output /data/kg --checkpoint-dir /data/ckpt \
        --fingerprint crawl-2025-01

Runs the full KG-construction pipeline over a Parquet pages directory,
checkpoint-resumable (re-submitting the same job with the same fingerprint
resumes from the last complete stage), and writes the node/edge/entity
Parquet tables plus a JSON summary.  Owns its Ray session (standalone only;
the driver/test harnesses never import this module).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages parquet file/dir")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--fingerprint", default="", help="input fingerprint for resume")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: autodetect)")
    p.add_argument("--lang", default="en")
    p.add_argument("--no-curation", action="store_true")
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--linker-concurrency", type=int, default=None)
    p.add_argument("--extractor-concurrency", type=int, default=None)
    p.add_argument("--evaluate", action="store_true",
                   help="run the functional query suite + Schema.org "
                        "validation over the built graph and add the scores "
                        "to the summary")
    args = p.parse_args(argv)

    import logging

    import ray
    import ray.data as rd
    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ontoray.config import PipelineConfig
    from ontoray.pipelines.kg import run_kg_pipeline
    from ontoray.stages.export import write_graph_outputs
    from ontoray.stages.reporting import run_summary

    cpus = int(ray.cluster_resources().get("CPU", 8))
    cfg = PipelineConfig(
        batch_size=args.batch_size,
        linker_concurrency=args.linker_concurrency or max(2, cpus // 2),
        extractor_concurrency=args.extractor_concurrency or max(2, cpus // 2),
        checkpoint_dir=args.checkpoint_dir,
    )

    t0 = time.perf_counter()
    pages = rd.read_parquet(args.input)
    result = run_kg_pipeline(pages, cfg=cfg, curate_graph=not args.no_curation,
                             fingerprint=args.fingerprint)
    extra = {
        **run_summary(result.entities),
        "wall_s": round(time.perf_counter() - t0, 2),
        "fingerprint": args.fingerprint,
    }
    if args.evaluate:
        import pyarrow as pa

        from ontoray.evaluation.query_suite import run_query_suite
        from ontoray.evaluation.validator import (validate_jsonld_ds,
                                                  validation_report)
        from ontoray.stages.export import entities_to_jsonld

        extra["query_suite"] = run_query_suite(result.nodes, result.edges)

        def fmt(batch: pa.Table) -> pa.Table:
            objs = entities_to_jsonld(batch.to_pylist())
            return pa.table({"jsonld": pa.array(
                [json.dumps(o, sort_keys=True) for o in objs], pa.string())})

        extra["jsonld_validation"] = validation_report(
            validate_jsonld_ds(result.entities.map_batches(fmt, batch_format="pyarrow")))
    summary = write_graph_outputs(result, args.output, summary_extra=extra)
    print(json.dumps(summary, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

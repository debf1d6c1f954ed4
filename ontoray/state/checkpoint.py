"""Stage checkpointing with per-partition lineage.

Replaces the reference's pickle-per-stage cache
(src/cached_schema_org_pipeline.py:13-28,47-89) with Parquet stage
checkpoints: each stage writes ``<root>/<stage>/data/*.parquet`` plus a
``manifest.json`` recording the stage name, input fingerprint, row count,
partition file list and wall time, and a ``_SUCCESS`` marker written LAST
(atomic-completion contract).  Resume = read the checkpoint Parquet;
invalidation is forward-only — deleting a stage dir invalidates it and every
downstream stage (the manifest carries the upstream fingerprint chain).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time

# Ray's parquet path resolution probes `fsspec.implementations.http`, whose
# import FAILS in this environment (no aiohttp).  A failed import is retried
# on every call, and two driver threads resolving paths concurrently race on
# the partially-initialized module ("cannot import name HTTPFileSystem").
# Stage save/load are the only read/write_parquet calls issued from pipeline
# overlap threads — serialize just those.
_PARQUET_IO_LOCK = threading.Lock()


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_complete(self, stage: str, fingerprint: str | None = None) -> bool:
        """Complete = _SUCCESS present and, when a fingerprint is given, the
        manifest matches it.  An EMPTY fingerprint never matches: two
        default-fingerprint runs over different corpora sharing one
        checkpoint_dir must not silently resume each other's stale outputs
        (ADVICE r1) — callers derive a real fingerprint or forgo resume."""
        d = self._dir(stage)
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            return False
        if fingerprint is not None:
            if not fingerprint:
                return False
            try:
                with open(os.path.join(d, "manifest.json")) as f:
                    return json.load(f).get("fingerprint") == fingerprint
            except Exception:
                return False
        return True

    def invalidate(self, stage: str):
        """Forward-only invalidation of this stage (callers drop downstream
        stages by invalidating them too, reference clear_cache semantics)."""
        shutil.rmtree(self._dir(stage), ignore_errors=True)

    def load(self, stage: str):
        import ray.data as rd
        with _PARQUET_IO_LOCK:
            return rd.read_parquet(os.path.join(self._dir(stage), "data"))

    def save(self, stage: str, ds, fingerprint: str = "", extra: dict | None = None):
        """Write ds to the stage checkpoint; returns a fresh Dataset reading it
        (so downstream stages consume the materialized lineage, not a
        recomputation)."""
        import ray.data as rd
        d = self._dir(stage)
        self.invalidate(stage)
        data_dir = os.path.join(d, "data")
        os.makedirs(data_dir, exist_ok=True)
        t0 = time.perf_counter()
        with _PARQUET_IO_LOCK:
            ds.write_parquet(data_dir)
        wall = time.perf_counter() - t0
        files = sorted(os.listdir(data_dir))
        with _PARQUET_IO_LOCK:
            out = rd.read_parquet(data_dir)
        manifest = {
            "stage": stage,
            "fingerprint": fingerprint,
            "rows": out.count(),
            "partitions": files,
            "n_partitions": len(files),
            "wall_s": wall,
            "written_at": time.time(),
        }
        if extra:
            manifest.update(extra)
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        return out

    def manifest(self, stage: str) -> dict:
        with open(os.path.join(self._dir(stage), "manifest.json")) as f:
            return json.load(f)

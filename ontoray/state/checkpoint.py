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

    # --- per-partition (intra-stage) resume --------------------------------

    def begin_partitioned(self, stage: str, fingerprint: str) -> set[int]:
        """Open (or resume) a partitioned stage attempt.  Markers from an
        attempt with a DIFFERENT (or empty) fingerprint are stale — the whole
        stage is invalidated rather than silently resumed.  Returns the set
        of partitions already completed by a matching attempt."""
        d = self._dir(stage)
        attempt = os.path.join(d, "attempt.json")
        prev = None
        if os.path.exists(attempt):
            try:
                with open(attempt) as f:
                    prev = json.load(f).get("fingerprint")
            except Exception:
                prev = None
        if not fingerprint or prev != fingerprint:
            if prev is not None or os.path.exists(d):
                self.invalidate(stage)
        os.makedirs(d, exist_ok=True)
        with open(attempt, "w") as f:
            json.dump({"fingerprint": fingerprint, "started_at": time.time()}, f)
        return self.completed_partitions(stage)

    def completed_partitions(self, stage: str) -> set[int]:
        """Partition ids whose ``part-XXXXX._OK`` marker landed (each marker
        is written atomically AFTER its data file — a crash mid-stage leaves
        exactly the finished partitions marked)."""
        ok_dir = os.path.join(self._dir(stage), "parts_ok")
        if not os.path.isdir(ok_dir):
            return set()
        return {int(f[5:10]) for f in os.listdir(ok_dir)
                if f.startswith("part-") and f.endswith("._OK")}

    def rebase(self, stage: str, new_fingerprint: str, drop_parts) -> None:
        """Re-target a completed partitioned stage at a NEW input fingerprint
        while dropping only the named partitions — the surgical primitive
        behind incremental (append-only) corpus updates: the seal and
        manifest come off, attempt.json points at the new fingerprint, the
        dropped partitions' data files + markers are deleted, and everything
        else resumes as already-complete under the new attempt."""
        d = self._dir(stage)
        if not new_fingerprint:
            raise ValueError("rebase requires a non-empty fingerprint")
        if not os.path.isdir(d):
            return                      # nothing checkpointed: full compute
        for f in ("_SUCCESS", "manifest.json"):
            p = os.path.join(d, f)
            if os.path.exists(p):
                os.remove(p)
        with open(os.path.join(d, "attempt.json"), "w") as f:
            json.dump({"fingerprint": new_fingerprint,
                       "started_at": time.time(), "rebased": True}, f)
        for p in drop_parts:
            for path in (os.path.join(d, "data", f"part-{p:05d}.parquet"),
                         os.path.join(d, "parts_ok", f"part-{p:05d}._OK")):
                if os.path.exists(path):
                    os.remove(path)

    def load_partitions(self, stage: str, parts):
        """Dataset over a SUBSET of a partitioned stage's files — file-level
        input pruning for downstream per-partition recompute.  Returns None
        when none of the requested partitions has a file (empty partitions
        never write one — they stay nominally 'missing' but carry no rows)."""
        import ray.data as rd
        data_dir = os.path.join(self._dir(stage), "data")
        files = [os.path.join(data_dir, f"part-{p:05d}.parquet") for p in sorted(parts)]
        files = [f for f in files if os.path.exists(f)]
        if not files:
            return None
        with _PARQUET_IO_LOCK:
            return rd.read_parquet(files)

    def save_partitioned(self, stage: str, ds, part_col: str,
                         fingerprint: str = "", extra: dict | None = None,
                         keep_part_col: bool = False,
                         sort_keys: list[str] | None = None):
        """Write ``ds`` as one parquet file PER VALUE of ``part_col`` with an
        atomic per-partition completion marker (tmp + rename), so a killed run
        resumes by recomputing ONLY the unmarked partitions (the caller
        filters its input to ``missing`` before building ``ds``).  One keyed
        shuffle co-locates each partition — the price of resumable output.

        Returns a Dataset reading the full stage directory."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        d = self._dir(stage)
        data_dir = os.path.join(d, "data")
        ok_dir = os.path.join(d, "parts_ok")
        os.makedirs(data_dir, exist_ok=True)
        os.makedirs(ok_dir, exist_ok=True)
        already = self.completed_partitions(stage)
        t0 = time.perf_counter()

        def write_partition(g: pa.Table) -> pa.Table:
            part = g.column(part_col)[0].as_py()
            out = g if keep_part_col else g.drop_columns([part_col])
            if sort_keys:
                # Deterministic within-file order (hash partition + local
                # sort = a fully deterministic layout), sort_mode analog.
                out = out.sort_by([(k, "ascending") for k in sort_keys])
            final = os.path.join(data_dir, f"part-{part:05d}.parquet")
            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(out, tmp)
            os.replace(tmp, final)
            # Marker lands ONLY after the data rename (ordered, atomic); kept
            # out of data/ so parquet readers never see it.
            marker = os.path.join(ok_dir, f"part-{part:05d}._OK")
            tmp_m = marker + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp_m, "w") as f:
                f.write("ok\n")
            os.replace(tmp_m, marker)
            return pa.table({"part": pa.array([part], pa.int64()),
                             "rows": pa.array([out.num_rows], pa.int64())})

        acks = (ds.groupby(part_col)
                .map_groups(write_partition, batch_format="pyarrow").take_all())
        written = sorted(r["part"] for r in acks)
        wall = time.perf_counter() - t0

        with _PARQUET_IO_LOCK:
            out_ds = rd.read_parquet(
                [os.path.join(data_dir, f) for f in sorted(os.listdir(data_dir))
                 if f.endswith(".parquet")])
        manifest = {
            "stage": stage,
            "fingerprint": fingerprint,
            "rows": out_ds.count(),
            "partitions": sorted(already | set(written)),
            "n_partitions": len(already | set(written)),
            "written_partitions": written,     # lineage: THIS run's recompute scope
            "resumed_partitions": sorted(already),
            "wall_s": wall,
            "written_at": time.time(),
        }
        if extra:
            manifest.update(extra)
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        return out_ds

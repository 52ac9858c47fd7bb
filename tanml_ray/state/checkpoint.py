"""Per-partition checkpoint manifest + resumable validation runs.

The reference recomputes everything on rerun
(/root/reference/tanml/ui/views/profiling.py:424-428 — no persistence);
resumability is mandated by BASELINE.json north_rule: "resumable from
checkpoint with per-partition lineage + metrics".

Design (SURVEY.md §4.1 "Checkpoint / resume"):
  - partition = input parquet file (the natural resume unit)
  - lineage id = sha256(input file list + file sizes + mtimes + config
    + code version) — any change invalidates the checkpoint (mtime_ns
    catches a regenerated partition with identical name+size)
  - manifest.json: {lineage_id, partitions: {pid: {state, rows,
    violations, elapsed_us, constraints: {...}}}}, written atomically
    (tmp + rename) after every WAVE of partitions, so a killed run
    loses at most one wave of work
  - per-partition violation parquet: out_dir/violations/<pid>.parquet
  - global checks (uniqueness across partitions) run once after all
    partitions are done — they are not per-partition resumable and
    are recomputed on the final wave (documented limitation: a shuffle
    has no mid-stage checkpoint)
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from tanml_ray.sources.ingest import read_parquet_clean

ENGINE_VERSION = "1"


def lineage_id(input_files: list[str], config: dict[str, Any]) -> str:
    h = hashlib.sha256()
    h.update(ENGINE_VERSION.encode())
    for f in sorted(input_files):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
    h.update(json.dumps(config, sort_keys=True, default=str).encode())
    return h.hexdigest()[:16]


@dataclass
class Manifest:
    path: str
    lineage: str
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def load_or_create(cls, path: str, lineage: str) -> "Manifest":
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            if data.get("lineage_id") == lineage:
                return cls(path=path, lineage=lineage,
                           partitions=data.get("partitions", {}))
            # lineage mismatch → stale checkpoint, start fresh
        return cls(path=path, lineage=lineage)

    def done(self, pid: str) -> bool:
        return self.partitions.get(pid, {}).get("state") == "done"

    def mark_done(self, pid: str, **metrics: Any) -> None:
        self.partitions[pid] = {"state": "done", **metrics}

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"lineage_id": self.lineage, "updated_at": time.time(),
                       "partitions": self.partitions}, f, indent=1, default=str)
        os.replace(tmp, self.path)


def run_resumable_validation(input_dir: str, out_dir: str,
                             wave_size: int = 16,
                             constraints=None) -> dict[str, Any]:
    """Resumable flagship validation over a directory of pages parquet.

    Returns summary incl. `processed_partitions` (how many actually ran
    this invocation — 0 on a fully-checkpointed rerun) and
    `skipped_partitions`.
    """
    import ray.data as rd

    from tanml_ray.pipelines.validate import ValidateBatch
    from tanml_ray.stages.constraints import default_pages_constraints

    files = sorted(os.path.join(input_dir, f) for f in os.listdir(input_dir)
                   if f.endswith(".parquet"))
    cons = constraints if constraints is not None else default_pages_constraints()
    config = {"constraints": sorted(c.constraint_id for c in cons),
              "wave_size_invariant": True}
    lid = lineage_id(files, config)

    os.makedirs(os.path.join(out_dir, "violations"), exist_ok=True)
    manifest = Manifest.load_or_create(os.path.join(out_dir, "manifest.json"), lid)

    todo = [f for f in files if not manifest.done(os.path.basename(f))]
    processed = 0
    for w in range(0, len(todo), wave_size):
        wave = todo[w:w + wave_size]
        ds = read_parquet_clean(wave, include_paths=True)
        mixed = ds.map_batches(ValidateBatch(constraints=cons),
                               batch_format="pyarrow").materialize()

        def _only(kind):
            return mixed.map_batches(
                lambda t, k=kind: t.filter(pc.equal(t.column("kind"), k)),
                batch_format="pyarrow")

        # violations per partition (small; gathered driver-side per wave)
        v_tables: dict[str, list[pa.Table]] = {}
        for t in _only("violation").select_columns(
                ["partition_id", "constraint_id", "url", "offending_value"]) \
                .iter_batches(batch_size=8192, batch_format="pyarrow"):
            for pid in pc.unique(t.column("partition_id")).to_pylist():
                sub = t.filter(pc.equal(t.column("partition_id"), pid))
                v_tables.setdefault(pid, []).append(sub)

        # per-partition status metrics
        stats: dict[str, dict[str, Any]] = {}
        for t in _only("status").iter_batches(batch_size=8192, batch_format="pyarrow"):
            for r in t.to_pylist():
                s = stats.setdefault(r["partition_id"],
                                     {"rows": 0, "violations": 0, "elapsed_us": 0,
                                      "constraints": {}})
                c = s["constraints"].setdefault(
                    r["constraint_id"], {"rows": 0, "violations": 0})
                c["rows"] += r["rows"]
                c["violations"] += r["violations"]
                s["violations"] += r["violations"]
                s["elapsed_us"] = max(s["elapsed_us"], r["elapsed_us"])
        for pid, s in stats.items():
            s["rows"] = max(c["rows"] for c in s["constraints"].values())

        for f in wave:
            pid = os.path.basename(f)
            tables = v_tables.get(pid)
            vpath = os.path.join(out_dir, "violations", pid)
            if tables:
                pq.write_table(pa.concat_tables(tables), vpath)
            elif os.path.exists(vpath):
                os.remove(vpath)
            s = stats.get(pid, {"rows": 0, "violations": 0, "elapsed_us": 0,
                                "constraints": {}})
            manifest.mark_done(pid, **s,
                               status="fail" if s["violations"] else "pass")
            processed += 1
        manifest.save()

    total_rows = sum(p.get("rows", 0) for p in manifest.partitions.values())
    total_viol = sum(p.get("violations", 0) for p in manifest.partitions.values())
    return {
        "lineage_id": lid,
        "partitions": len(files),
        "processed_partitions": processed,
        "skipped_partitions": len(files) - len(todo),
        "rows": total_rows,
        "total_violations": total_viol,
        "failed_partitions": sum(1 for p in manifest.partitions.values()
                                 if p.get("status") == "fail"),
    }

"""S10/J2 — per-partition lineage manifests and the resume protocol.

The reference checkpoints by rewriting a single mappings JSON after *every* document
(apps/legacy/src/utils/file.ts:36-59) with a timestamped backup before mutation
(rename.ts:6-16), and resumes by filtering out already-successful entries
(rename.ts:61-64). At 10^12 documents a single shared file is impossible; the
Ray-native equivalent is:

  * deterministic partition ids — a pure function of the sorted input file list
    (NOT of cluster size), so a resumed run sees identical partitions
    (SURVEY.md §7.4 "deterministic resume");
  * one output directory per partition, written to a temp name and atomically
    renamed (os.replace), so a partition is either absent or complete;
  * one manifest JSON per partition (counts, bytes, wall time, input lineage,
    status) written after the data rename — the commit record;
  * resume = partition-level anti-join: skip partitions whose manifest is complete
    (J2 at partition granularity).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionManifest:
    partition_id: int
    input_files: list[str]
    status: str = "pending"  # pending | complete | failed
    n_rows: int = 0
    n_success: int = 0
    routes: dict = field(default_factory=dict)
    bytes_out: int = 0
    wall_s: float = 0.0
    started_at: float = 0.0
    finished_at: float = 0.0
    error: str = ""
    # truncated Ray Data stats for the partition's execution (observability;
    # optional so manifests from older runs still load)
    exec_stats: str = ""
    # per-output-file url range {basename: [min, max]} recorded at commit
    # time from parquet footer statistics — lets a point lookup
    # (checkpoint.lookup_url) prune files WITHOUT opening their footers
    # (O(1) footer reads at many-thousand-partition scale). Optional:
    # manifests from older runs load with {} and lookups fall back to
    # per-file footer pruning.
    url_ranges: dict = field(default_factory=dict)


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def partition_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part-{pid:05d}")


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{pid:05d}.json")


def plan_partitions(input_files: list[str], num_partitions: int) -> list[list[str]]:
    """Deterministic contiguous split of the SORTED file list into num_partitions
    groups. Pure function of (files, num_partitions) — never of cluster size."""
    files = sorted(input_files)
    n = len(files)
    num_partitions = max(1, min(num_partitions, n))
    bounds = [round(i * n / num_partitions) for i in range(num_partitions + 1)]
    return [files[bounds[i] : bounds[i + 1]] for i in range(num_partitions)]


def group_plan_path(out_dir: str) -> str:
    return os.path.join(manifest_dir(out_dir), "groups.json")


def load_group_plan(out_dir: str) -> list[list[str]]:
    """The persisted APPEND-ONLY group plan (incremental ingest): group i =
    list of input file basenames. Returns [] for a fresh out_dir."""
    path = group_plan_path(out_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def extend_group_plan(out_dir: str, basenames: list[str],
                      files_per_group: int) -> list[list[str]]:
    """Assign input files not yet in the plan to NEW groups (sorted, chunked
    by ``files_per_group``) and persist atomically BEFORE any processing —
    restart-safe: a crash between plan write and processing just resumes.

    Append-only contract: files already assigned keep their group forever
    (their manifests stay valid no matter what arrives later); a planned file
    missing from the input is an error (deletion is not supported — crawl
    archives are append-only)."""
    plan = load_group_plan(out_dir)
    assigned = {f for g in plan for f in g}
    have = set(basenames)
    missing = assigned - have
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} file(s) in the persisted group plan are absent "
            f"from the input (e.g. {sorted(missing)[:3]}); incremental ingest "
            "is append-only — restore the files or use a fresh out_dir.")
    new = sorted(have - assigned)
    for i in range(0, len(new), files_per_group):
        plan.append(new[i:i + files_per_group])
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = group_plan_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(plan, f, indent=1)
    os.replace(tmp, group_plan_path(out_dir))
    return plan


def load_manifest(out_dir: str, pid: int) -> PartitionManifest | None:
    path = manifest_path(out_dir, pid)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return PartitionManifest(**json.load(f))
    except (ValueError, TypeError):
        return None  # torn write → treat as not-done; the data dir rename is atomic


class PartitionPlanChanged(RuntimeError):
    """Resume attempted with a different partition plan than the manifests were
    written under — silently skipping by pid would drop/duplicate input files."""


def is_complete(out_dir: str, pid: int,
                expected_files: list[str] | None = None) -> bool:
    m = load_manifest(out_dir, pid)
    done = (m is not None and m.status == "complete"
            and os.path.isdir(partition_dir(out_dir, pid)))
    if done and expected_files is not None and m.input_files != expected_files:
        raise PartitionPlanChanged(
            f"partition {pid}: manifest covers {len(m.input_files)} file(s) "
            f"{m.input_files[:2]}… but the current plan assigns "
            f"{len(expected_files)} file(s) {expected_files[:2]}…. Resume "
            "requires the same input file list and --partitions as the "
            "original run (partition ids are a pure function of both); "
            "use a fresh out_dir or the original parameters."
        )
    return done


def write_manifest(out_dir: str, m: PartitionManifest) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir, m.partition_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def commit_partition_dir(out_dir: str, pid: int, tmp_data_dir: str) -> None:
    """Atomically publish a partition's data directory."""
    final = partition_dir(out_dir, pid)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp_data_dir, final)


def summarize(out_dir: str, num_partitions: int) -> dict:
    """Fold per-partition manifests into the run summary (A1 final counters,
    rename.ts:91-95)."""
    total = {"partitions": 0, "complete": 0, "n_rows": 0, "n_success": 0,
             "bytes_out": 0, "wall_s": 0.0, "routes": {}}
    for pid in range(num_partitions):
        m = load_manifest(out_dir, pid)
        if m is None:
            continue
        total["partitions"] += 1
        if m.status == "complete":
            total["complete"] += 1
            total["n_rows"] += m.n_rows
            total["n_success"] += m.n_success
            total["bytes_out"] += m.bytes_out
            total["wall_s"] += m.wall_s
            for k, v in (m.routes or {}).items():
                total["routes"][k] = total["routes"].get(k, 0) + v
    total["generated_at"] = time.time()
    path = os.path.join(manifest_dir(out_dir), "summary.json")
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(total, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return total

"""CLI batch entry point — the analogue of the reference's flagship CLI
(apps/legacy/rename.ts: scan → extract → derive names → persist mapping,
resumable), re-expressed as a checkpointed partitioned Ray Data run.

Usage:
    python -m janet_ray run --input <pages_parquet_dir> --out <out_dir> \
        [--partitions 16] [--no-resume] [--num-cpus 8]

The CLI owns the Ray session (library code never calls ray.init —
__ray_entry__.py contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="janet_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="checkpointed extraction run over a pages dir")
    run.add_argument("--input", required=True, help="dir of pages parquet shards")
    run.add_argument("--out", required=True, help="output dir (parquet + _manifest)")
    run.add_argument("--partitions", type=int, default=16)
    run.add_argument("--no-resume", action="store_true",
                     help="recompute even complete partitions")
    run.add_argument("--num-cpus", type=int, default=None,
                     help="ray.init num_cpus (default: all)")
    run.add_argument("--concurrent-partitions", type=int, default=1,
                     help="overlap up to N partitions (straggler mitigation)")
    run.add_argument("--deadline-s", type=float, default=30.0,
                     help="per-row wall-clock budget; 0 disables (default 30)")
    run.add_argument("--strict-ocr", action="store_true",
                     help="any failed OCR page fails the whole document (A2)")
    run.add_argument("--salt-parts", type=int, default=0,
                     help="hot-url salting for the dedupe shuffle (0 = off)")
    run.add_argument("--stage-checkpoint", action="store_true",
                     help="persist the routed intermediate per partition so an "
                     "extract-stage failure resumes mid-partition (costs a "
                     "second write of the payload bytes)")
    ing = sub.add_parser("ingest", help="append-only incremental ingest: rerun "
                         "after new shards land; only new groups are processed")
    ing.add_argument("--input", required=True)
    ing.add_argument("--out", required=True)
    ing.add_argument("--files-per-group", type=int, default=8)
    ing.add_argument("--num-cpus", type=int, default=None)
    ing.add_argument("--concurrent-partitions", type=int, default=1)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from janet_ray.pipelines.checkpoint import run_incremental, run_partitioned

    try:
        if args.cmd == "ingest":
            summary = run_incremental(
                args.input, args.out,
                files_per_group=args.files_per_group,
                max_concurrent_partitions=args.concurrent_partitions,
            )
        else:
            summary = run_partitioned(
                args.input, args.out,
                num_partitions=args.partitions,
                resume=not args.no_resume,
                max_concurrent_partitions=args.concurrent_partitions,
                stage_checkpoint=args.stage_checkpoint,
                extract_kwargs={
                    "deadline_s": args.deadline_s or None,
                    "strict_ocr": args.strict_ocr,
                    "dedupe_salt_parts": args.salt_parts,
                },
            )
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        ray.shutdown()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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
    qry = sub.add_parser("query", help="run a registry pipeline by name over "
                         "an sf-style table dir (list names with --list)")
    qry.add_argument("name", nargs="?", help="queries() registry key")
    qry.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                     help="dir holding the parquet tables")
    qry.add_argument("--out", default=None,
                     help="write the result as parquet here (streamed); "
                     "default prints the first rows")
    qry.add_argument("--head", type=int, default=10,
                     help="rows to print when --out is not given")
    qry.add_argument("--num-cpus", type=int, default=None)
    qry.add_argument("--list", action="store_true", dest="list_names",
                     help="list registry query names and exit")
    args = ap.parse_args(argv)

    if args.cmd == "query" and args.list_names:
        from janet_ray.pipelines.queries import build_queries

        try:
            for name in build_queries():
                print(name)
        except BrokenPipeError:  # `| head` closed the pipe — not an error
            pass
        return 0
    if args.cmd == "query" and not args.name:
        print("error: query name required (or --list)", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from janet_ray.pipelines.checkpoint import run_incremental, run_partitioned

    try:
        if args.cmd == "query":
            import ray.data as rd

            from janet_ray.pipelines.queries import build_queries

            registry = build_queries()
            if args.name not in registry:
                print(f"error: unknown query {args.name!r} "
                      f"(see --list)", file=sys.stderr)
                return 2
            res = registry[args.name](args.sf_dir)
            if args.out is not None:
                if isinstance(res, rd.Dataset):
                    res.write_parquet(args.out)
                    summary = {"query": args.name, "out": args.out}
                else:  # small pandas/arrow result
                    import pyarrow as pa
                    import pyarrow.parquet as pq_

                    t = (res if isinstance(res, pa.Table)
                         else pa.Table.from_pandas(res))
                    pq_.write_table(t, args.out)
                    summary = {"query": args.name, "out": args.out,
                               "rows": t.num_rows}
            else:
                df = (res.limit(args.head).to_pandas()
                      if isinstance(res, rd.Dataset) else res)
                print(df if not hasattr(df, "head") else df.head(args.head))
                summary = {"query": args.name, "printed": True}
        elif args.cmd == "ingest":
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

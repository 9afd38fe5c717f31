"""Cluster job entrypoint: ``ray job submit -- python -m selma_ray.job ...``.

The north-rule execution shape: the extraction pipeline runs as a Ray job
on a fixed-size cluster, resumable from its checkpoint manifest. On a real
cluster the submitter sets RAY_ADDRESS (or --address); in this sandbox the
job runs in local mode. Only THIS entrypoint owns ray.init — the library
and __ray_entry__ never call it.

Examples:
    ray job submit --working-dir . -- python -m selma_ray.job extract \
        --input /data/transcripts --output /data/extracted \
        --manifest /data/extracted/_manifest

    python -m selma_ray.job extract --input /root/testdata/... \
        --output /tmp/out --no-resume --num-cpus 8
"""

from __future__ import annotations

import argparse
import json
import sys


def _init(args):
    """Connect to (or start) Ray; returns (ray, owns_session).

    Only shut down a session this process started — under a job agent
    or a test harness the session belongs to the host, and killing it
    would take down every other driver attached to it.
    """
    import ray

    if ray.is_initialized():
        return ray, False
    kwargs = dict(include_dashboard=False)
    if args.num_cpus:
        kwargs["num_cpus"] = args.num_cpus
    ray.init(address=args.address, **kwargs)
    return ray, True


def cmd_extract(args) -> dict:
    from selma_ray.pipelines.extract import run_extraction

    ray, owns = _init(args)
    summary = run_extraction(
        args.input, args.output,
        manifest_dir=args.manifest,
        resume=not args.no_resume,
        keep_spans=not args.no_spans,
        batch_size=args.batch_size,
        concurrency=args.concurrency,
    )
    if owns:
        ray.shutdown()
    return summary


def cmd_curate(args) -> dict:
    from selma_ray.pipelines.curate import curate_corpus

    ray, owns = _init(args)
    summary = curate_corpus(
        args.input, args.output,
        min_words=args.min_words,
        batch_size=args.batch_size,
        window_budget=args.window_budget,
        concurrency=args.concurrency,
        eval_path=args.eval_path,
        resume=not args.no_resume,
    )
    if owns:
        ray.shutdown()
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="selma_ray.job")
    ap.add_argument("--address", default=None,
                    help="ray cluster address (default: RAY_ADDRESS / local)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored on a real cluster)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run/resume transcript extraction")
    ex.add_argument("--input", required=True, help="parquet file or dir")
    ex.add_argument("--output", required=True, help="output dir")
    ex.add_argument("--manifest", default=None,
                    help="manifest dir (default: <output>/_manifest)")
    ex.add_argument("--no-resume", action="store_true",
                    help="recompute all shards even if marked done")
    ex.add_argument("--no-spans", action="store_true",
                    help="skip matched-span column (smaller output)")
    ex.add_argument("--batch-size", type=int, default=64)
    ex.add_argument("--concurrency", type=int, default=None,
                    help="actor pool size (default: cpus - max(2, cpus/8))")

    cu = sub.add_parser(
        "curate", help="run/resume the full curation pipeline "
                       "(extract -> quality filter -> dedup -> pack)")
    cu.add_argument("--input", required=True, help="parquet file or dir")
    cu.add_argument("--output", required=True, help="output root dir")
    cu.add_argument("--no-resume", action="store_true",
                    help="recompute every stage even if marked done")
    cu.add_argument("--min-words", type=int, default=3)
    cu.add_argument("--window-budget", type=int, default=128)
    cu.add_argument("--batch-size", type=int, default=64)
    cu.add_argument("--concurrency", type=int, default=None)
    cu.add_argument("--eval-path", default=None,
                    help="parquet of held-out eval docs (text column); "
                         "adds a decontamination stage before packing")

    args = ap.parse_args(argv)
    if args.cmd == "extract":
        summary = cmd_extract(args)
        print(json.dumps(summary))
        return 0
    if args.cmd == "curate":
        summary = cmd_curate(args)
        print(json.dumps(summary))
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())

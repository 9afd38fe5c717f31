"""`ray job submit` driver for the flagship extraction pipeline.

The north-rule execution shape (BASELINE.json): the extraction runs as
a submitted Ray job on a fixed-size cluster, resumable from the
checkpoint manifest, emitting per-partition lineage + metrics. This
module is that driver:

    ray start --head --num-cpus=32          # (cluster provisioning)
    ray job submit --working-dir /root/repo -- \
        python -m selma_ray.jobs.extract_job \
            --input /data/transcripts --out /data/extracted

Re-submitting the same job after a failure skips every shard already
recorded in the manifest (``--no-resume`` forces a full redo). The job
prints one JSON summary line on success — shard counts, rows, and the
rolled-up extraction metrics (turns processed, bytes stripped, selector
hit counts) — which the job log / `ray job logs` surfaces to the
operator.

Locally (no cluster) the same module runs standalone: ``ray.init()``
falls back to starting a local instance, so
``python -m selma_ray.jobs.extract_job --input ... --out ...`` works
for smoke tests too.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="selma_ray.jobs.extract_job",
        description="Main-content extraction over a transcript parquet "
                    "dataset (resumable, manifest-checkpointed).")
    ap.add_argument("--input", required=True,
                    help="parquet file or directory of transcript shards")
    ap.add_argument("--out", required=True,
                    help="output dir (one shard=<id>/ partition per input "
                         "shard; manifest under <out>/_manifest)")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore the manifest and re-extract every shard")
    ap.add_argument("--keep-html", action="store_true",
                    help="also emit the rewritten HTML column")
    ap.add_argument("--no-spans", action="store_true",
                    help="drop the matched-node span column")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=None,
                    help="extraction actor-pool size (default: sized from "
                         "the cluster CPU count)")
    args = ap.parse_args(argv)

    import ray

    # Inside a submitted job the job agent exports RAY_ADDRESS, so this
    # attaches to the hosting cluster; standalone it starts a local one.
    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from selma_ray.pipelines.extract import run_extraction

    t0 = time.perf_counter()
    summary = run_extraction(
        args.input, args.out,
        resume=not args.no_resume,
        keep_html=args.keep_html,
        keep_spans=not args.no_spans,
        batch_size=args.batch_size,
        concurrency=args.concurrency,
    )
    wall = time.perf_counter() - t0
    agg = summary.get("metrics", {})
    out = {
        "job": "extract",
        "wall_sec": round(wall, 3),
        "shards_total": summary["shards_total"],
        "shards_skipped": summary["shards_skipped"],
        "shards_done": summary["shards_done"],
        "rows": summary["rows"],
        "turns_per_sec": (round(summary["rows"] / wall, 1)
                          if wall > 0 else None),
        "metrics": agg,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

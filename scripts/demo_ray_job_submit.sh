#!/bin/sh
# Demonstrates the cluster execution shape from BASELINE.json's
# north_rule: the extraction pipeline run as a JOB against a
# long-lived Ray cluster, then re-run to prove manifest resume.
#
# On a real deployment this is exactly
#
#   ray job submit --working-dir /root/repo -- \
#       python -m selma_ray.job extract --input ... --output ...
#
# This sandbox ships ray[data] without the jobs CLI/SDK (`ray job`
# requires ray[default], which needs network to install), so the demo
# uses the equivalent driver-attach shape the job agent itself uses:
# a persistent `ray start --head` cluster plus a driver process that
# connects via RAY_ADDRESS=auto. The pipeline code path is identical.
#
#   sh scripts/demo_ray_job_submit.sh [input_parquet_dir] [out_dir]
set -e

# Default input: the deterministic synthetic transcript corpus at the
# correctness tier (~1k convs, ~25k turns), materialized once.
INPUT=${1:-$(PYTHONPATH=/root/repo python -c "
from selma_ray.sources.transcripts import transcripts_parquet
print(transcripts_parquet(1000))")}
OUT=${2:-/tmp/selma_ray_job_demo}
CPUS=${RAY_GRAFT_CPUS:-8}

rm -rf "$OUT"
ray stop --force >/dev/null 2>&1 || true
RAY_ADDRESS= ray start --head --num-cpus="$CPUS" \
    --disable-usage-stats >/dev/null 2>&1

echo "== first run (cold: extracts every shard) =="
RAY_ADDRESS=auto PYTHONPATH=/root/repo \
    python -m selma_ray.job extract \
    --input "$INPUT" --output "$OUT" 2>/dev/null | tail -1

echo "== second run (warm: every shard skipped via manifest) =="
RAY_ADDRESS=auto PYTHONPATH=/root/repo \
    python -m selma_ray.job extract \
    --input "$INPUT" --output "$OUT" 2>/dev/null | tail -1

ray stop --force >/dev/null 2>&1 || true

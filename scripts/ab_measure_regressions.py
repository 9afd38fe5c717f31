"""A/B-interleaved re-measurement of the five queries that regressed
>30% between BENCH_r02 and BENCH_r03, alternating the current tree (A)
with the pinned round-2 checkout (B) in fresh subprocesses so VM drift
hits both sides equally. Prints per-query best-of times."""

import json
import subprocess
import sys

QUERIES = ["late_orders", "pricing_summary", "mixture_sample",
           "rank_docs", "cdc_chunks"]
TREES = {"A_r4": "/root/repo", "B_r2": "/tmp/r2tree"}
SF = "/root/testdata/sf0.1"
REPS = 3

RUN_SNIPPET = r"""
import sys, time, json
sys.path.insert(0, {tree!r})
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         log_to_driver=False)
import __ray_entry__ as e
qs = e.queries()
fn = qs[{q!r}]
t0 = time.perf_counter()
res = fn({sf!r})
if hasattr(res, "to_pandas"):
    res = res.to_pandas()
dt = time.perf_counter() - t0
print("RESULT", json.dumps({{"q": {q!r}, "sec": dt, "rows": len(res)}}))
ray.shutdown()
"""


def run_one(tree, q):
    code = RUN_SNIPPET.format(tree=tree, q=q, sf=SF)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=600,
                         cwd=tree)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    print(out.stdout[-2000:], out.stderr[-2000:])
    raise RuntimeError(f"no result for {q} in {tree}")


def main():
    results = {q: {t: [] for t in TREES} for q in QUERIES}
    for rep in range(REPS):
        for q in QUERIES:
            for tname, tree in TREES.items():
                r = run_one(tree, q)
                results[q][tname].append(round(r["sec"], 3))
                print(f"rep{rep} {q} {tname}: {r['sec']:.3f}s "
                      f"rows={r['rows']}", flush=True)
    print("\n== best-of summary ==")
    summary = {}
    for q in QUERIES:
        a = min(results[q]["A_r4"])
        b = min(results[q]["B_r2"])
        summary[q] = {"r4_best": a, "r2_best": b,
                      "ratio_r4_over_r2": round(a / b, 3),
                      "r4_all": results[q]["A_r4"],
                      "r2_all": results[q]["B_r2"]}
        print(f"{q}: r4 {a:.3f}s vs r2 {b:.3f}s "
              f"(ratio {a / b:.2f})")
    with open("/tmp/ab_results.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()

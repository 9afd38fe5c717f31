#!/usr/bin/env python
"""One-tier-up scale evidence: run the headline extraction at 10x the
graded corpus (RAY_GRAFT_CONV_MULT=10 over sf0.1 -> 2.56M convs,
~64M turns, ~10 GB text) and record throughput plus peak memory.

Memory is sampled two ways every 2s while the child runs:
  - rss_gib: sum of RSS over every live process (driver + raylet +
    workers; shared object-store pages are counted once per mapping,
    so this OVERSTATES true usage — an honest upper bound)
  - shm_gib: /dev/shm usage (the Ray object store's backing store)

Prints one JSON line merging the child's bench record with the peaks.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time


def _total_rss_kib() -> int:
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/statm", "rb") as f:
                total += int(f.read().split()[1])
        except OSError:
            continue
    return total * (os.sysconf("SC_PAGE_SIZE") // 1024)


def _shm_kib() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize // 1024


def main():
    peaks = {"rss": 0, "shm": 0}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peaks["rss"] = max(peaks["rss"], _total_rss_kib())
            peaks["shm"] = max(peaks["shm"], _shm_kib())
            stop.wait(2.0)

    env = dict(os.environ,
               RAY_GRAFT_CONV_MULT=os.environ.get("RAY_GRAFT_CONV_MULT",
                                                  "10"),
               GRAFT_SF_DIR=os.environ.get("GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"),
               RAY_GRAFT_CPUS=os.environ.get("RAY_GRAFT_CPUS", "32"))
    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      "bench.py"), "--child"],
        env=env, capture_output=True, text=True, timeout=7200)
    wall = time.perf_counter() - t0
    stop.set()
    t.join()
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        sys.exit(proc.returncode)
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    rec.update({
        "conv_mult": float(env["RAY_GRAFT_CONV_MULT"]),
        "total_wall_incl_synthesis_sec": round(wall, 1),
        "peak_rss_gib": round(peaks["rss"] / 1048576, 2),
        "peak_shm_gib": round(peaks["shm"] / 1048576, 2),
    })
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

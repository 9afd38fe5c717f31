#!/usr/bin/env python
"""Driver-shaped correctness check: run __ray_entry__ queries against
their DuckDB oracles at sf0.01 (row count + schema + order-insensitive
value comparison). Usage:

    python scripts/check_correctness.py [query ...]   # default: all SQL-checked
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb
    import numpy as np
    import ray

    import __ray_entry__ as entrymod

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # default: every query — SQL-checked ones compare against DuckDB,
    # the rest still execute end-to-end (crash/row-count coverage)
    names = sys.argv[1:] or sorted(qs.keys())
    failures = 0
    for name in names:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        if (len(got) == 0 and len(got.columns) == 0
                and hasattr(res, "schema")
                and res.schema() is not None):
            # ray.data.Dataset.to_pandas() returns a COLUMNLESS frame
            # for any 0-row dataset even when the dataset has a schema
            import pandas as pd

            got = pd.DataFrame({n: [] for n in res.schema().names})
        ray_sec = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows, {ray_sec:.1f}s)")
            continue
        want = con.sql(oracles[name]).df()
        got = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns)).reset_index(drop=True)
        ok = list(got.columns) == list(want.columns) and len(got) == len(want)
        if ok:
            for col in got.columns:
                g, w = got[col].to_numpy(), want[col].to_numpy()
                if np.issubdtype(g.dtype, np.floating) or np.issubdtype(
                        w.dtype, np.floating):
                    ok = np.allclose(g.astype(float), w.astype(float),
                                     atol=1e-9, rtol=0)
                else:
                    ok = bool((g == w).all())
                if not ok:
                    print(f"  MISMATCH in column {col}")
                    break
        status = "OK" if ok else "FAIL"
        failures += 0 if ok else 1
        print(f"{name}: {status} ({len(got)} rows, ray {ray_sec:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

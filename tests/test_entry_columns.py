"""Guards for entry_columns.QUERY_COLUMNS, the generated per-query read
projections used by __ray_entry__._read.

A stale entry fails SILENTLY at runtime in the worst way: a dropped
query name just stops pruning (scan-width waste), and a misspelled
column name makes read_parquet raise only when that query runs. Both
are cheap to catch statically — no Ray session needed.
"""

import glob
import os

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _table_schemas():
    return {
        os.path.basename(p).replace(".parquet", ""):
            set(pq.read_schema(p).names)
        for p in glob.glob(f"{SF_DIR}/*.parquet")
    }


def test_entry_columns_reference_real_queries():
    import __ray_entry__ as entry
    from entry_columns import QUERY_COLUMNS

    known = set(entry.queries())
    stale = sorted(set(QUERY_COLUMNS) - known)
    assert not stale, f"entry_columns entries with no query: {stale}"


def test_entry_columns_reference_real_columns():
    from entry_columns import QUERY_COLUMNS

    schemas = _table_schemas()
    bad = []
    for q, tables in QUERY_COLUMNS.items():
        for table, cols in tables.items():
            if table not in schemas:
                # tables synthesized at runtime (e.g. transcripts) are
                # not under testdata — only validate on-disk tables
                continue
            missing = set(cols) - schemas[table]
            if missing:
                bad.append((q, table, sorted(missing)))
    assert not bad, f"pruned columns absent from parquet schema: {bad}"

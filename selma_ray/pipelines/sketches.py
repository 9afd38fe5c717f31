"""Distributed cardinality sketch: KMV (k-minimum-values) distinct
count.

The classic mergeable sketch (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"): hash every value to a uniform
64-bit integer, keep only the k smallest distinct hashes. The k-th
smallest hash h_k estimates cardinality as ``(k-1) * 2^64 / h_k``;
below saturation the sketch is exact.

Scale shape: per-batch combiners prune to <= k hashes per group before
anything leaves the task, so the groupby shuffle carries
``k x groups x blocks`` 8-byte hashes, never raw values — the whole
point of a sketch at 100 TB. Merging per-batch k-min sets preserves the
global k minimum (the k smallest overall survive every local prune).

Determinism / oracle parity: the hash is the low 64 bits of
``md5(str(value))`` in DuckDB's byte order (``md5_number_lower`` =
little-endian bytes 8..16 of the digest), and the estimate uses only
IEEE basic ops evaluated in the same order as the SQL expression — so
the DuckDB oracle reproduces the ESTIMATE bit-for-bit, not just
approximately (see ``__ray_entry__.oracle_sql()['distinct_users_kmv']``).

No reference equivalent (SURVEY.md §2.5: Selma has no wide ops); this
is one of the training-data-scale additions.
"""

from __future__ import annotations

import struct
from hashlib import md5

import numpy as np
import pyarrow as pa

_TWO64 = 2.0 ** 64


def kmv_hash64(value) -> int:
    """Low 64 bits of md5(str(value)), DuckDB ``md5_number_lower``
    byte order (little-endian digest[8:16])."""
    return struct.unpack("<Q", md5(str(value).encode()).digest()[8:])[0]


class _PartialKmv:
    """Per-batch combiner: the k smallest distinct hashes per group."""

    def __init__(self, group_col: str, value_col: str, k: int):
        self.group_col = group_col
        self.value_col = value_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        # distinct (group, value) first so each value hashes once
        pairs = batch.select([self.group_col, self.value_col]) \
            .group_by([self.group_col, self.value_col]).aggregate([])
        per_group: dict = {}
        for g, v in zip(pairs.column(self.group_col).to_pylist(),
                        pairs.column(self.value_col).to_pylist()):
            per_group.setdefault(g, set()).add(kmv_hash64(v))
        out_g, out_h = [], []
        for g, hs in per_group.items():
            for h in sorted(hs)[:self.k]:
                out_g.append(g)
                out_h.append(h)
        return pa.table({
            self.group_col: pa.array(out_g),
            "h": pa.array(np.array(out_h, dtype=np.uint64), pa.uint64()),
        })


def kmv_distinct(ds, *, group_col: str, value_col: str, k: int = 64,
                 est_col: str = "est_distinct"):
    """Dataset -> (group, est_distinct float64, sketch_size int64):
    estimated distinct ``value_col`` per ``group_col``.

    Exact below saturation (fewer than k distinct values); otherwise the
    KMV estimator ``(k-1) * 2^64 / h_k`` with relative error
    ~ 1/sqrt(k-2). Raise k for tighter bounds — the shuffle grows
    linearly in k and is independent of data volume."""
    import pandas as pd

    def final(group: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(group["h"].to_numpy())  # sorted distinct
        nd = hs.size
        if nd < k:
            est = float(nd)
        else:
            est = (k - 1) * _TWO64 / float(hs[k - 1])
        return pd.DataFrame({
            group_col: [group[group_col].iloc[0]],
            est_col: np.array([est], dtype=np.float64),
            "sketch_size": np.array([min(nd, k)], dtype=np.int64),
        })

    partial = ds.map_batches(_PartialKmv(group_col, value_col, k),
                             batch_format="pyarrow")
    return partial.groupby(group_col).map_groups(
        final, batch_format="pandas")

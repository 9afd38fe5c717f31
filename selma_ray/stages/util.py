"""Shared stage helpers: block coalescing and pool sizing.

Ray's sort-based shuffle pays a per-block scheduling cost, so a groupby
fed by many KB-sized blocks (the normal shape after per-batch partial
aggregation) wastes tens of seconds on metadata. Coalescing by target
rows keeps the fix scale-aware: tiny intermediates collapse to a handful
of blocks, large ones keep enough blocks for parallel reduce.
"""

from __future__ import annotations


def coalesce_small(ds, target_rows: int = 65536):
    """Merge small blocks before a wide op (streaming split/merge, not a
    shuffle). No-op in spirit for large datasets: they keep >= enough
    blocks because target_rows bounds rows per block, not block count."""
    return ds.repartition(target_num_rows_per_block=target_rows)


def default_pool_size(fraction: float | None = None, floor: int = 2) -> int:
    """Fixed actor-pool size from cluster CPUs, leaving headroom so
    read/write tasks are never starved (a pool == all CPUs deadlocks the
    streaming executor's other operators).

    Headroom is a small ABSOLUTE reserve (max(2, cpus//8)), not a
    fraction: the read/write side of a map-heavy pipeline needs a
    near-constant couple of cores regardless of cluster size, and a 25%
    reserve at 32 cpus measurably starves the pool (24 vs 28 actors is
    a 2x wall-time difference on the extraction benchmark). Pass
    ``fraction`` to override with the old proportional sizing.
    """
    import ray

    cpus = 8.0
    if ray.is_initialized():
        cpus = float(ray.cluster_resources().get("CPU", 8.0))
    if fraction is not None:
        return max(floor, int(cpus * fraction))
    return max(floor, int(cpus) - max(2, int(cpus) // 8))

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


def default_pool_size(fraction: float = 0.75, floor: int = 2) -> int:
    """Fixed actor-pool size from cluster CPUs, leaving headroom so
    read/write tasks are never starved (a pool == all CPUs deadlocks the
    streaming executor's other operators)."""
    import ray

    cpus = 8.0
    if ray.is_initialized():
        cpus = float(ray.cluster_resources().get("CPU", 8.0))
    return max(floor, int(cpus * fraction))

"""Clamp OpenBLAS to one thread per process.

numpy's bundled OpenBLAS (2-thread build) spin-waits pathologically on
this class of VM: a 0.5 GFLOP matmul measures ~0.1 GFLOPS with 2 threads
and ~30 GFLOPS with 1 (350x). Under Ray the degradation compounds —
every map_batches worker running BLAS spins on its sibling thread while
oversubscribing the node's cores.

One thread per process is also the correct setting for Ray Data
generally: parallelism comes from the task/actor pool, so intra-op BLAS
threads only fight the scheduler (num_cpus=1 tasks assume one core).

Env vars (OPENBLAS_NUM_THREADS) only work if set before numpy loads the
BLAS, which cannot be guaranteed in Ray workers (ray imports numpy at
startup), so this clamps at runtime through the C API of the already-
loaded library. Called from selma_ray/__init__.py: every worker that
runs one of our UDFs imports the package and gets clamped.
"""

from __future__ import annotations


def limit_blas_threads(n: int = 1) -> bool:
    """Set the loaded OpenBLAS's thread count; True if a library was found
    and clamped. Safe no-op on any failure."""
    try:
        import ctypes

        import numpy  # noqa: F401  (ensures the BLAS is loaded)

        paths = []
        with open("/proc/self/maps") as f:
            for line in f:
                if "openblas" in line.lower():
                    p = line.split()[-1]
                    if p.startswith("/") and p not in paths:
                        paths.append(p)
        for p in paths:
            lib = ctypes.CDLL(p)
            for sym in ("openblas_set_num_threads64_",
                        "openblas_set_num_threads"):
                fn = getattr(lib, sym, None)
                if fn is not None:
                    fn(int(n))
                    return True
    except Exception:
        pass
    return False

"""Fault-injection helpers for resilience tests.

These live in the PACKAGE (not tests/) on purpose: Ray reconstructs a
restarted actor by re-importing its class by module path in a fresh
worker process. A chaos wrapper defined inside a test module therefore
breaks the actor-restart path itself with ModuleNotFoundError — which
is exactly the machinery these helpers exist to exercise.
"""

from __future__ import annotations

import os


class KillWorkerOnce:
    """Wrap a ``map_batches`` callable class so the FIRST task call
    across the actor pool hard-kills its worker process.

    ``os._exit`` skips all Python cleanup — the closest single-node
    stand-in for an OOM-killed or preempted worker. A latch file keeps
    the kill to exactly one across the pool; restarted actors rebuild
    their state in ``__init__`` (the latch now exists) and Ray Data's
    default actor args (max_restarts=-1, max_task_retries=-1) retry
    the lost task, so a correct pipeline must produce IDENTICAL output
    to an undisturbed run.
    """

    def __init__(self, latch: str, inner_cls, **inner_kwargs):
        self.latch = latch
        self.inner = inner_cls(**inner_kwargs)

    def __call__(self, batch):
        if not os.path.exists(self.latch):
            try:
                # O_EXCL makes the latch atomic: concurrent first
                # batches on several actors race the exists() check,
                # and only the creation winner may kill — otherwise a
                # wide pool could die wholesale, a restart storm
                # rather than a one-worker probe
                fd = os.open(self.latch,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                pass
            else:
                os.write(fd, b"killed")
                os.close(fd)
                os._exit(1)
        return self.inner(batch)


class Identity:
    """No-op batch stage for chaos wrappers that need an inner class
    (inject a fault into a pipeline without changing its data)."""

    def __call__(self, batch):
        return batch

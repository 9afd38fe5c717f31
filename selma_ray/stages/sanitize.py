"""Stateless sanitize stage.

Default-config sanitization needs no per-worker state beyond the compiled
Sanitizer, which is cheap; a module-level cache keyed by the frozen config
lets plain task-based ``map_batches(fn)`` reuse the compiled tables within
a worker process (SURVEY.md §7 'stateless tasks vs actor pools').
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..engine.rewriter import Rewriter
from ..engine.sanitizer import Sanitizer

_CACHE: dict = {}


def _rewriter_for(config_key: str, config) -> Rewriter:
    rw = _CACHE.get(config_key)
    if rw is None:
        rw = Rewriter(sanitizer=Sanitizer(config) if config is not None
                      else Sanitizer())
        _CACHE[config_key] = rw
    return rw


class SanitizeBatch:
    """Callable for map_batches: sanitize `text_col` into `out_col`."""

    def __init__(self, config=None, text_col: str = "text",
                 out_col: str = "sanitized"):
        self.config = config
        self.key = json.dumps(config, sort_keys=True, default=str)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rw = _rewriter_for(self.key, self.config)
        rewrite = rw.rewrite
        out = [rewrite(t) if t is not None else None
               for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column(self.out_col,
                                   pa.array(out, pa.large_string()))


def sanitize_stage(ds, *, config=None, text_col: str = "text",
                   out_col: str = "sanitized", batch_size: int = 128):
    fn = SanitizeBatch(config=config, text_col=text_col, out_col=out_col)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)

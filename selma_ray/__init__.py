"""selma_ray — a Ray-Data-native HTML selection/rewriting and main-content
extraction engine with the capabilities of the reference Selma gem
(gjtorikian/selma), rebuilt from scratch on ray.data.Dataset pipelines.

Layout:
  engine/     pure-Python per-document streaming HTML engine
  stages/     map_batches callables (stateless fns + actor-pool classes)
  pipelines/  end-to-end Dataset pipelines (extraction, dedup, analysis)
  sources/    readers / synthetic transcript generation
  state/      checkpoint manifest + lineage records
  functions/  vectorized scalar/text functions (Arrow-level)
"""

from ._blas import limit_blas_threads

# see _blas.py: numpy's 2-thread OpenBLAS spin-waits ~350x slow on this
# VM class, and intra-op BLAS threads are wrong under Ray regardless
limit_blas_threads(1)

from . import config
from .engine import Rewriter, Sanitizer, Selector
from .engine.markdown import html_to_markdown

__all__ = ["Rewriter", "Sanitizer", "Selector", "config",
           "html_to_markdown"]
__version__ = "0.1.0"

"""Per-document streaming HTML engine (tokenizer, selectors, sanitizer,
rewriter). Pure Python, no Ray dependencies — the Ray layer wraps these in
map_batches stages (see selma_ray.stages / selma_ray.pipelines)."""

from .rewriter import (
    Element,
    EndTag,
    MemoryLimitError,
    Rewriter,
    Selector,
    TextChunk,
)
from .sanitizer import Sanitizer
from .selector import CompiledSelector, SelectorParseError

__all__ = [
    "CompiledSelector",
    "Element",
    "EndTag",
    "MemoryLimitError",
    "Rewriter",
    "Sanitizer",
    "Selector",
    "SelectorParseError",
    "TextChunk",
]

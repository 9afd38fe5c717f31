"""map_batches stages: stateless fns + actor-pool callable classes."""

from .extract import ExtractTurns, extract_stage
from .sanitize import SanitizeBatch, sanitize_stage

__all__ = ["ExtractTurns", "SanitizeBatch", "extract_stage", "sanitize_stage"]

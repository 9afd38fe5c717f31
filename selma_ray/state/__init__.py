"""Durable state: checkpoint manifest + per-partition lineage records."""

from .manifest import Manifest

__all__ = ["Manifest"]

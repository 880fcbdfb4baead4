"""Indexes: the vector store + TPU scoring engine."""

from fastforward_tpu.index.base import Index, ScoreFuture
from fastforward_tpu.index.disk import OnDiskIndex
from fastforward_tpu.index.memory import InMemoryIndex
from fastforward_tpu.index.mode import Mode

__all__ = ["Index", "Mode", "OnDiskIndex", "InMemoryIndex", "ScoreFuture"]

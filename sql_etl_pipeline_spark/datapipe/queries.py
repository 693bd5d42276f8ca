"""Aggregated datapipe query registry (imported by ``__spark_entry__``).

Importing the operator modules populates ``QUERIES`` via their ``register``
decorators."""

from __future__ import annotations

from . import dedup  # noqa: F401
from .registry import QUERIES

try:  # populated incrementally as modules land
    from . import similarity  # noqa: F401
except ImportError:
    pass
try:
    from . import text  # noqa: F401
except ImportError:
    pass
try:
    from . import multimodal  # noqa: F401
except ImportError:
    pass

__all__ = ["QUERIES"]

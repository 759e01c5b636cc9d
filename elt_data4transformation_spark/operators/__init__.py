"""Reusable DataFrame operators — the engine library that plans/ (and
any user pipeline) composes. Each operator is generic over column
names; plans bind them to the testdata tables."""

from . import vectors  # noqa: F401
from . import dedup_ops  # noqa: F401

__all__ = ["vectors", "dedup_ops"]

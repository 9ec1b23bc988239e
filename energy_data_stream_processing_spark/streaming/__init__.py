"""Structured Streaming surface (see runner.py)."""

from . import runner  # noqa: F401

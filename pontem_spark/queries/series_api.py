"""Queries exercised THROUGH the pandas-like Series/DataFrame wrapper
(pontem_spark.core) — proving the compatibility layer emits the same clean
Catalyst plans as hand-written DataFrame code. Filled in with the core API."""

from __future__ import annotations

"""Composed Ray Data pipelines (validation, drift, dedup, ...)."""

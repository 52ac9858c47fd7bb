"""Readers and deterministic fixture synthesis."""

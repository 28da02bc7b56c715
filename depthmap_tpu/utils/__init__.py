"""Utilities: evaluation metrics, profiling/tracing helpers."""

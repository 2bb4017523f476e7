"""Utilities: checkpointing, benchmarking helpers."""

"""Utilities: native IO, metrics logging, profiling, checkpointing helpers."""

"""Utilities: torch-CPU baseline proxy, checkpoint import, profiling helpers."""

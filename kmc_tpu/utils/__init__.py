"""Utilities: invariant checks, profiling, throughput meters."""

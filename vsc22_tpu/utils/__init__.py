"""Utilities: benchmarking, logging, profiling, config."""

"""Structured Streaming adapters.

The reference engine is strictly batch (SURVEY.md §2.8) — its only
incremental capability is --merge into an existing mbtiles.  These
adapters provide the Spark-native streaming equivalents for the same
computations: incremental tile updates and windowed event rollups.
"""

"""Catalyst column-expression library (the zero-UDF tile-math tier)."""

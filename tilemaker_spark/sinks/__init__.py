"""Tile sinks: mbtiles (sqlite single-writer), z/x/y file tree."""

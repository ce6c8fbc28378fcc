"""Sources: OSM PBF reader, GeoJSON, and deterministic synthetic tables."""

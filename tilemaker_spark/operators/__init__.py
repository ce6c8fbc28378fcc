"""DataFrame-level operators: spatial joins, kNN, tiling, dedup, ANN, text."""

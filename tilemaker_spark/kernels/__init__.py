"""Pure numpy/python kernels (no Spark imports).

Everything here is vectorized over numpy arrays so it can be called from
Arrow-batched pandas UDFs without per-row Python overhead.
"""

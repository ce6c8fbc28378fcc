"""Deterministic sampling & dataset splitting.

A training pipeline needs REPRODUCIBLE sampling — `df.sample()` depends
on partitioning and Spark's per-task RNG, so the same row can land in
train today and test tomorrow after a repartition.  These operators key
every decision off a hash of the ROW ID, so membership is a pure
function of the data: stable across runs, partitionings, engines, and
cluster sizes (and exactly mirrorable in the DuckDB oracle).

* :func:`hash_bucket` — id -> uniform bucket in [0, n_buckets).
  Numeric ids use a multiply-mod LCG (pure int64 Catalyst arithmetic);
  string ids use the first 8 hex digits of md5 (both engines compute
  identical md5).
* :func:`hash_split` — named splits (train/val/test) from cumulative
  weight thresholds over the bucket.
* :func:`stratified_sample` — per-stratum keep-fractions (the
  deterministic analogue of ``df.sampleBy``).

All zero-shuffle: each is a projection/filter, fully pushed down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

# LCG constants (same small-multiplier discipline as sources/synth.py:
# id * A + C never overflows int64 at the 10^12-row design point)
_A, _C, _M = 48271, 11, 2147483647  # Park-Miller modulus
_NB = 1000000


def hash_bucket(df: DataFrame, id_col: str, salt: int = 0,
                n_buckets: int = _NB) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from the id."""
    field = df.schema[id_col].dataType
    if isinstance(field, NumericType):
        # pmod, not %: Spark's % keeps the dividend's sign, so a
        # negative id (or salt < -id) would yield a NEGATIVE bucket
        # that silently passes every `bucket < threshold` filter
        mixed = F.pmod((F.col(id_col).cast("long") + F.lit(salt))
                       * F.lit(_A) + F.lit(_C), F.lit(_M))
    else:
        mixed = F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                       F.lit(str(salt)))), 1, 8),
            16, 10).cast("long")
    return F.pmod(mixed, F.lit(n_buckets)).alias("bucket")


def hash_split(df: DataFrame, id_col: str,
               weights: dict[str, float] | None = None,
               salt: int = 0) -> DataFrame:
    """Add a ``split`` column assigning every row to a named split with
    the given weights (must sum to ~1).  Default 98/1/1
    train/val/test."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights sum to {total}, expected 1")
    b = hash_bucket(df, id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < F.lit(int(round(acc * _NB)))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    expr = (F.lit(names[0]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      fractions: dict, default: float = 0.0,
                      salt: int = 0) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each
    stratum — the reproducible ``sampleBy``: membership depends only on
    (id, salt), never on partitioning."""
    b = hash_bucket(df, id_col, salt)
    thr = None
    for k, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        lim = F.lit(int(round(frac * _NB)))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = thr.otherwise(F.lit(int(round(default * _NB)))) if thr is not None \
        else F.lit(int(round(default * _NB)))
    return df.filter(b < thr)


def hash_split_oracle_sql(table: str = "documents",
                          id_col: str = "doc_id",
                          weights: dict[str, float] | None = None,
                          salt: int = 0) -> str:
    """DuckDB twin of :func:`hash_split` for a NUMERIC id column —
    identical LCG arithmetic, identical thresholds."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(weights)
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += weights[name]
        cases.append(f"WHEN bucket < {int(round(acc * _NB))} "
                     f"THEN '{name}'")
    case = ("CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
            if cases else f"'{names[0]}'")
    return f"""
WITH b AS (
  SELECT {id_col},
         (((((({id_col} + {salt}) * {_A} + {_C}) % {_M}) + {_M}) % {_M}) % {_NB} + {_NB}) % {_NB} AS bucket
  FROM {table}
)
SELECT {id_col}, {case} AS split FROM b
"""


def weighted_mixture(df: DataFrame, source_col: str, id_col: str,
                     weights: dict[str, float],
                     salt: int = 0) -> DataFrame:
    """Deterministic DATA MIXING: downsample each source so the output
    composition matches ``weights`` while keeping the maximum possible
    rows — the "mix 30% web / 50% books / 20% code" stage of a training
    corpus.  The binding source (largest n_s-to-weight deficit) is kept
    whole; every other source is hash-thinned to match.

    Fully distributed: per-source counts are a tiny aggregation
    broadcast back onto the big table, whose only pass is one
    hash-bucket filter (membership a pure function of (id, salt), same
    guarantee as :func:`hash_split`).  Sources absent from ``weights``
    are dropped.  Exactly mirrorable in SQL — see
    :func:`weighted_mixture_oracle_sql`."""
    if not weights or any(v <= 0 for v in weights.values()):
        raise ValueError("weights must be positive")
    spark = df.sparkSession
    w_df = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()],
        f"{source_col} string, _w double")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    ratios = counts.join(F.broadcast(w_df), source_col).withColumn(
        "_ratio", F.col("_n").cast("double") / F.col("_w"))
    tmin = ratios.agg(F.min("_ratio").alias("_t"))
    thr = ratios.crossJoin(F.broadcast(tmin)).select(
        source_col,
        F.floor(F.lit(float(_NB)) * F.col("_w") * F.col("_t")
                / F.col("_n").cast("double")).cast("long").alias("_thr"))
    b = hash_bucket(df, id_col, salt)
    return (df.join(F.broadcast(thr), source_col)
            .filter(b < F.col("_thr")).drop("_thr"))


def weighted_mixture_oracle_sql(weights: dict[str, float],
                                table: str = "documents",
                                source_col: str = "source",
                                id_col: str = "doc_id",
                                salt: int = 0) -> str:
    """DuckDB twin of :func:`weighted_mixture` (numeric id) — identical
    IEEE-double threshold arithmetic in the same operation order."""
    vals = ", ".join(f"('{k}', {float(v)})" for k, v in weights.items())
    return f"""
WITH w({source_col}, wt) AS (VALUES {vals}),
c AS (
  SELECT {source_col}, count(*) AS n FROM {table} GROUP BY {source_col}
), r AS (
  SELECT c.{source_col}, w.wt, c.n,
         CAST(c.n AS double) / w.wt AS ratio
  FROM c JOIN w USING ({source_col})
), t AS (SELECT min(ratio) AS tmin FROM r),
thr AS (
  SELECT {source_col},
         CAST(floor({float(_NB)} * wt * tmin / CAST(n AS double))
              AS BIGINT) AS thr
  FROM r, t
)
SELECT d.{id_col}, d.{source_col}
FROM {table} d JOIN thr USING ({source_col})
WHERE (((((({id_col} + {salt}) * {_A} + {_C}) % {_M}) + {_M}) % {_M}) % {_NB} + {_NB}) % {_NB} < thr
"""


def stratified_sample_oracle_sql(table: str, strata_col: str,
                                 id_col: str, fractions: dict,
                                 default: float = 0.0,
                                 salt: int = 0) -> str:
    """DuckDB twin of :func:`stratified_sample` for a NUMERIC id —
    identical LCG arithmetic, identical per-stratum thresholds.  String
    stratum keys are quoted (the Spark side takes them via F.lit); the
    output cast tracks the key type."""

    def _sql_lit(k):
        if isinstance(k, str):
            return "'" + k.replace("'", "''") + "'"
        return str(k)

    cases = " ".join(
        f"WHEN {strata_col} = {_sql_lit(k)} THEN {int(round(frac * _NB))}"
        for k, frac in fractions.items())
    out_strata = (strata_col
                  if any(isinstance(k, str) for k in fractions)
                  else f"CAST({strata_col} AS int) AS {strata_col}")
    return f"""
WITH b AS (
  SELECT *,
         (((((({id_col} + {salt}) * {_A} + {_C}) % {_M}) + {_M}) % {_M}) % {_NB} + {_NB}) % {_NB} AS bucket
  FROM {table}
)
SELECT {id_col}, {out_strata} FROM b
WHERE bucket < CASE {cases} ELSE {int(round(default * _NB))} END
"""


def pack_blocks(df: DataFrame, id_col: str = "doc_id",
                tokens_col: str = "n_tokens", capacity: int = 2048,
                range_size: int = 1000) -> DataFrame:
    """GPT-style block packing: conceptually concatenate every
    document's tokens in ``id_col`` order and chop the stream into
    fixed ``capacity``-token training blocks (documents straddle block
    boundaries — the standard GPT/Pile data prep).  Emits, per doc,
    exactly where its tokens land: ``tok_start`` (global stream
    offset), ``start_block``/``end_block``, and ``start_offset``
    within the first block.

    A global running sum is inherently sequential, so the 100 TB
    version CANNOT be one ORDER BY window (that plans as a
    single-partition sort — a non-starter).  This is the classic
    distributed prefix-sum instead: (1) rows window-sum WITHIN
    contiguous id ranges (``floor(id / range_size)`` — a partitioned
    window, shuffles on the range key); (2) per-range totals aggregate
    to one tiny table (#ranges rows = corpus/range_size); (3) the
    global running offset of each range is a window over THAT tiny
    table only; (4) a broadcast join hands each row its range offset.
    The only global-ordered window runs over thousands of rows, never
    the corpus.  The DuckDB oracle computes the straight global cumsum
    and must agree exactly."""
    part = F.floor(F.col(id_col) / F.lit(range_size)).alias("rng")
    w_in = Window.partitionBy("rng").orderBy(id_col)
    base = df.select(F.col(id_col), F.col(tokens_col).cast("long")
                     .alias("toks"), part)
    local = base.withColumn("local_end", F.sum("toks").over(w_in))
    rng_tot = local.groupBy("rng").agg(F.max("local_end").alias("rtot"))
    w_rng = (Window.orderBy("rng")
             .rowsBetween(Window.unboundedPreceding, -1))
    rng_off = rng_tot.withColumn(
        "roff", F.coalesce(F.sum("rtot").over(w_rng), F.lit(0)))
    j = local.join(F.broadcast(rng_off.select("rng", "roff")), "rng")
    start = F.col("roff") + F.col("local_end") - F.col("toks")
    end = F.col("roff") + F.col("local_end") - F.lit(1)
    return j.select(
        F.col(id_col),
        start.alias("tok_start"),
        F.floor(start / F.lit(capacity)).cast("long")
         .alias("start_block"),
        F.floor(end / F.lit(capacity)).cast("long").alias("end_block"),
        (start % F.lit(capacity)).cast("int").alias("start_offset"))


def corpus_shuffle(df: DataFrame, id_col: str = "doc_id",
                   seed: int = 0, n_ranges: int = 256) -> DataFrame:
    """Deterministic GLOBAL training-order shuffle: assign every row a
    dense position 0..n-1 in pseudo-random order that is a pure
    function of (id, seed) — the reproducible epoch ordering a
    pretraining run needs (re-running the job, repartitioning the
    input, or resuming mid-epoch must all yield the SAME order;
    ``df.orderBy(rand())`` yields none of that).

    Scale shape: a naive ``row_number() OVER (ORDER BY key)`` plans as
    a single-partition global sort — a non-starter at 10^12 rows.  The
    distributed version uses FIXED, data-independent key ranges (the
    LCG key is uniform on [0, M), so ``key div ceil(M/n_ranges)`` is a
    balanced range id from pure arithmetic — unlike
    ``repartitionByRange``'s sampled boundaries, which are not
    reproducible): (1) rank WITHIN each range (partitioned window),
    (2) range counts aggregate to n_ranges rows, (3) the global offset
    of each range is a window over that tiny table, (4) broadcast the
    offsets back.  pos = range_offset + local_rank - 1.  The DuckDB
    oracle computes the straight global row_number and must agree
    exactly on every row."""
    key = ((F.col(id_col).cast("long") + F.lit(seed)) * F.lit(_A)
           + F.lit(_C)) % F.lit(_M)
    width = _M // n_ranges + 1
    base = df.select(F.col(id_col), key.alias("skey"),
                     (key / F.lit(width)).cast("int").alias("rng"))
    w_in = Window.partitionBy("rng").orderBy("skey", id_col)
    local = base.withColumn("lrank", F.row_number().over(w_in))
    rng_tot = local.groupBy("rng").agg(F.count(F.lit(1)).alias("rn"))
    w_rng = (Window.orderBy("rng")
             .rowsBetween(Window.unboundedPreceding, -1))
    rng_off = rng_tot.withColumn(
        "roff", F.coalesce(F.sum("rn").over(w_rng), F.lit(0)))
    return (local.join(F.broadcast(rng_off.select("rng", "roff")), "rng")
            .select(F.col(id_col),
                    (F.col("roff") + F.col("lrank") - 1).cast("long")
                    .alias("pos")))


def domain_cap(df: DataFrame, group_col: str = "source",
               id_col: str = "doc_id", cap: int = 100,
               salt: int = 0) -> DataFrame:
    """Per-domain document cap — the anti-boilerplate policy RefinedWeb
    and C4 run after dedup: no single domain may contribute more than
    ``cap`` documents, so template farms and mirror sites cannot
    dominate the mixture.  WHICH ``cap`` docs survive must be
    deterministic (a rerun or repartition must keep the same rows), so
    rank within each domain follows the (id, salt) hash with id
    tie-break — a pseudo-random but pure-function-of-the-data choice,
    not head-of-file bias and not ``rand()``.

    One shuffle on the domain key; the per-domain window is the same
    exchange.  Skewed mega-domains are exactly the rows this operator
    deletes, so the skew bounds itself at ``cap`` survivors per key —
    but the WINDOW still sees the raw domain partition, so a truly
    pathological single domain (10^9 rows in one task) should be
    pre-thinned with :func:`hash_bucket` filtering before ranking;
    the 100 TB plan composes both.  Output: the surviving rows."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(df, id_col, salt), id_col)
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= cap).drop("_rk"))


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int, salt: int = 0) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the k rows
    with the largest Efraimidis-Spirakis (IPL'06) keys u_i^(1/w_i),
    compared in the log domain as ``ln(u_i) / w_i`` (monotone, avoids
    pow underflow at large weights).

    u_i is NOT an RNG draw — it is the row's 52-bit md5-prefix hash
    over 2^52 (same trick as the KMV sketch), so the sample is a pure
    function of (id, salt): stable across runs, partitionings, engines
    and cluster sizes, and the DuckDB oracle replays it exactly as
    ``ORDER BY ln(u)/w DESC LIMIT k``.

    Scale shape: ``orderBy(key).limit(k)`` compiles to
    TakeOrderedAndProject — every partition keeps its local top-k and
    only k rows per partition reach the driver-side merge; there is no
    global sort and no single-partition window.  Rows with w <= 0 OR
    NaN are excluded (E-S keys are undefined there; Spark orders NaN
    above every number, so an unfiltered NaN weight would crowd out
    the entire sample).
    """
    if k <= 0:
        raise ValueError(f"k={k} must be positive")
    u = (F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                   F.lit(f":{salt}"))), 1, 13),
        16, 10).cast("double") + F.lit(1.0)) / F.lit(float(1 << 52))
    key = F.log(u) / F.col(weight_col).cast("double")
    wd = F.col(weight_col).cast("double")
    return (df.where((wd > 0) & ~F.isnan(wd))
            .withColumn("es_key", key)
            .orderBy(F.desc("es_key"), F.col(id_col))
            .limit(k))


def weighted_sample_oracle_sql(source: str, id_expr: str, weight_expr: str,
                               k: int, salt: int = 0,
                               cols: str = "*") -> str:
    """DuckDB twin of :func:`weighted_sample` — identical key formula,
    identical tie-break, plain ORDER BY ... LIMIT."""
    u = (f"(CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) "
         f"|| ':{salt}'), 1, 13)) AS BIGINT) + 1.0) / {float(1 << 52)!r}")
    return f"""
SELECT {cols}, ln({u}) / CAST({weight_expr} AS DOUBLE) AS es_key
FROM {source}
WHERE CAST({weight_expr} AS DOUBLE) > 0
  AND NOT isnan(CAST({weight_expr} AS DOUBLE))
ORDER BY es_key DESC, {id_expr}
LIMIT {k}
"""

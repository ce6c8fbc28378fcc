"""BASELINE input-spec layout proof: the images table partitioned by
(h3_coarse, salt) — "Iceberg table of image + caption pairs partitioned
by coarse H3 cell with explicit salting" — actually PRUNES at the scan:
a cell-filtered query must read only that cell's partition directories
(PartitionFilters reach the FileSourceScan), which is the mechanism
that turns a planet-scale corpus read into a per-cell read at 100 TB.
"""

from pyspark.sql import functions as F

from tilemaker_spark.sources import synth


def _scan_metrics(df):
    """Run df and return the leaf FileSourceScan's (numFiles,
    numPartitions) runtime metrics."""
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    m = scan.metrics()
    return m.apply("numFiles").value(), m.apply("numPartitions").value()


def test_h3_salt_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "images_part")
    img = synth.images_df(spark, 2000, with_bytes=False, n_salts=4)
    img.write.partitionBy("h3_coarse", "salt").parquet(path)

    back = spark.read.parquet(path)
    target = back.select("h3_coarse").distinct().limit(1).collect()[0][0]
    q = back.filter(F.col("h3_coarse") == target)

    plan = q._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must be a PARTITION filter (directory pruning),
    # not a post-scan data filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "h3_coarse" in pf

    # the pruned scan must read strictly fewer partition dirs + files
    all_files, all_parts = _scan_metrics(back)
    cell_files, cell_parts = _scan_metrics(q)
    assert 0 < cell_parts < all_parts
    assert 0 < cell_files < all_files

    # correctness: pruning loses no rows
    assert q.count() == img.filter(F.col("h3_coarse") == target).count()


def test_salt_pruning_within_cell(spark, tmp_path):
    """Second-level pruning: filtering (cell, salt) prunes deeper than
    cell alone — the skewed-urban-cell split the input spec salts for."""
    path = str(tmp_path / "images_part2")
    img = synth.images_df(spark, 4000, with_bytes=False, n_salts=4)
    img.write.partitionBy("h3_coarse", "salt").parquet(path)
    back = spark.read.parquet(path)
    # pick a cell that actually carries several salt sub-partitions
    cell = (back.groupBy("h3_coarse")
            .agg(F.countDistinct("salt").alias("ns"))
            .filter(F.col("ns") >= 2).limit(1).collect()[0][0])
    q_cell = back.filter(F.col("h3_coarse") == cell)
    q_salt = q_cell.filter(F.col("salt") == q_cell.select("salt")
                           .distinct().limit(1).collect()[0][0])
    _, cell_parts = _scan_metrics(q_cell)
    _, salt_parts = _scan_metrics(q_salt)
    assert 0 < salt_parts < cell_parts

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the engine's core operator families (SURVEY.md §2) + the
flagship image->tile pipeline, whose throughput (tiles/sec,
images-assigned/sec) is the BASELINE.json target metric (reported in the
"extras" field).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "200000"))

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from tilemaker_spark.session import get_spark
    from tilemaker_spark.sources.synth import images_df, grid_polygons_df
    from tilemaker_spark.operators import spatial_join
    from tilemaker_spark.sql import tile_exprs as TE

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 16))

    qs = E.queries()
    headline = [
        "tile_assign", "quadkey", "geohash", "hilbert", "cell_index",
        "hex_index", "s2_cells", "adaptive_cells", "geo_corpus", "kmv_distinct", "kmv_setops", "grouped_topk", "sel_quantiles", "bloom_prune", "cm_counts", "analyze", "fuzzy_join", "hot_ngrams", "weighted_sample", "bpe_encode", "pip_broadcast",
        "pip_cell", "pip_anti", "knn", "radius_join", "salt_plan", "wkb_points",
        "wkb_pip", "dirty_tiles",
        "way_assembly", "zorder_topk", "tiles_rollup", "pricing_summary",
        "shipping_priority", "dedup_exact", "text_stats", "ngram_jaccard",
        "jaccard_prefix", "minhash_pairs", "dedup_clusters",
        "corpus_dedup",
        "phash_clusters", "sessionize", "sliding_users", "asof_join",
        "interval_join", "hash_split", "bpe_tokens",
        "repetition", "bpe_pairs", "substring_dups", "boilerplate",
        "tfidf_terms",
        "decontam", "stratified", "pii_redact", "pack_blocks", "length_median",
        "scd2", "chunk_docs", "lm_surprise",
        "ann_topk", "ann_ivf", "retrieval_eval",
        "channel_stats", "mixup_check", "shard_roundtrip", "grayscale_check",
        "ar_bucket", "filter_funnel", "corrupt_scan", "image_canonical", "multimodal_dups",
        "image_meta", "geo_dedup", "corpus_shuffle", "zonal_stats", "clip_gate", "domain_cap", "tile_budget",
        # emb_dups is deliberately absent: it is the DECLARED O(n²)
        # exact ground-truth baseline (oracle-checked at sf0.01); at
        # sf0.1 its 12.5M-pair broadcast loop costs ~12s by design and
        # would read as a headline regression rather than a baseline
        "upsert", "letterbox_check", "orientation_check", "cube_stats", "funnel", "heat_grid", "retention", "concurrency",
        "cover_large", "poly_union",
        "area_intersect",
        "rel_members", "pip_line", "covered_by", "line_clip",
    ]
    # best-of-N with INTERLEAVED rounds (run the whole list, then run it
    # again): single-shot numbers on this noisy shared host drift 20-50%
    # between rounds, which made round-over-round comparisons meaningless
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "2"))
    timings: dict[str, float] = {}

    def prewarm() -> float:
        """Warm the JVM and the Python/Arrow worker pool on every core
        before timing.  Cold Arrow workers are a measurement artifact of
        the bench's one-session-many-jobs shape: on a real cluster (and
        in the real spark-submit job) executor Python workers are
        long-lived and stay hot across the pipeline.  On this
        descheduling-prone shared host a cold 32-wide worker-spawn storm
        otherwise lands entirely on whichever query happens to run first
        after an idle gap (measured: +15-80s on a query whose warm time
        is 2.5s).  The prewarm duration doubles as a per-round host
        calibration: the same fixed tiny job, reported in extras, so a
        reader can see which rounds hit a degraded window."""

        def touch(batches):
            from tilemaker_spark.kernels import geom, jpeg, png  # noqa: F401
            for pdf in batches:
                yield pdf

        t0 = time.time()
        (spark.range(cpus * 4, numPartitions=cpus)
         .mapInPandas(touch, "id long").count())
        return round(time.time() - t0, 3)

    def release_storage():
        """Between-queries hygiene: each headline query is an independent
        job (a real pipeline runs one per driver), but the bench reuses
        one session — so caches and eager localCheckpoint blocks from
        iterative operators (connected components, the prefix join)
        would otherwise accumulate in executor storage and degrade every
        LATER query's execution memory.  Release both.

        Invariant: callers must have FULLY consumed the query's result
        first — localCheckpoint blocks have truncated lineage, so a
        DataFrame reused after this release fails with missing blocks
        rather than recomputing."""
        spark.catalog.clearCache()
        jrdds = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jrdds.keySet().toArray()):
            jrdds.get(rid).unpersist(False)

    def flagship() -> tuple[float, int]:
        t0 = time.time()
        img = images_df(spark, n_images, with_bytes=False,
                        partitions=max(cpus, 16))
        grid = grid_polygons_df(spark, nx=72, ny=34)
        assigned = spatial_join.pip_join_broadcast(
            img.select("image_id", "lon", "lat"), grid,
            poly_cols=("poly_id",), index_zoom=6)
        z = 12
        tiles = (
            assigned.select(
                TE.lon2tilex(F.col("lon"), z).alias("x"),
                TE.lat2tiley(F.col("lat"), z).alias("y"))
            .groupBy("x", "y").agg(F.count("*").alias("n"))
        )
        n_tiles = tiles.count()
        return time.time() - t0, n_tiles

    n_tiles = 0
    round_totals: list[float] = []
    prewarm_secs: list[float] = []

    def run_round(rnd: int) -> float:
        nonlocal n_tiles
        pw = prewarm()
        prewarm_secs.append(pw)
        print(f"# r{rnd} prewarm (fixed calibration job): {pw}s",
              file=sys.stderr)
        total = 0.0
        for name in headline:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            sec = round(time.time() - t0, 3)
            total += sec
            if name not in timings or sec < timings[name]:
                timings[name] = sec
            print(f"# r{rnd} {name}: {n} rows in {sec}s", file=sys.stderr)
            release_storage()
        pipe_sec, n_tiles = flagship()
        total += pipe_sec
        if ("image_pipeline" not in timings
                or pipe_sec < timings["image_pipeline"]):
            timings["image_pipeline"] = round(pipe_sec, 3)
        print(f"# r{rnd} image_pipeline: {n_images} images -> {n_tiles} "
              f"tiles in {pipe_sec:.1f}s", file=sys.stderr)
        return total

    for rnd in range(rounds):
        round_totals.append(run_round(rnd))
    # the sandbox host's delivered capacity drifts several-x between
    # windows minutes apart; when the interleaved rounds disagree badly,
    # one of them hit a bad window — buy one extra round of best-of
    # (bounded: at most +1) instead of publishing the polluted minimum
    if (len(round_totals) >= 2
            and max(round_totals) > 1.5 * min(round_totals)):
        print(f"# round totals {['%.1f' % t for t in round_totals]} "
              f"disagree >1.5x (noisy host window) - running one extra "
              f"round", file=sys.stderr)
        round_totals.append(run_round(rounds))

    pipe_sec = timings["image_pipeline"]
    images_per_sec = round(n_images / pipe_sec, 1)
    tiles_per_sec = round(n_tiles / pipe_sec, 1)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extras": {
            "cpus": cpus,
            "bench_rounds": rounds,
            # sweep manifest: the registered-query count, so a driver
            # CORRECTNESS sweep that silently drops a row (r04 lost
            # `simplify` with no err entry) is detectable post hoc
            "n_registered_queries": len(qs),
            "n_benched_queries": len(headline) + 1,
            "bench_images": n_images,
            "images_assigned_per_sec": images_per_sec,
            "tiles_per_sec": tiles_per_sec,
            "prewarm_sec_per_round": prewarm_secs,
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

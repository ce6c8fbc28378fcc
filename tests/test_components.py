"""Connected components / cluster dedup (operators/components.py).

Ground truth is an independent pure-Python union-find; the Spark side
must produce identical (node -> component-min) labelings on random
graphs, chains, cycles, and empty inputs.
"""

import random

from pyspark.sql import functions as F

from tilemaker_spark.operators import components as C


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of each component
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = C.connected_components(df).collect()
    return {r["node"]: r["cluster_id"] for r in got}


def test_cc_random_graphs(spark):
    for seed in range(4):
        rng = random.Random(seed)
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        edges = [e for e in edges if e[0] != e[1]]
        assert _cc_spark(spark, edges) == _union_find(edges)


def test_cc_long_chain_and_cycle(spark):
    chain = [(i, i + 1) for i in range(60)]          # worst case for
    cycle = [(100 + i, 100 + (i + 1) % 30) for i in range(30)]
    edges = chain + cycle                             # label propagation
    assert _cc_spark(spark, edges) == _union_find(edges)


def test_cc_empty_and_selfloop(spark):
    assert _cc_spark(spark, [(5, 5)]) == {}
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert C.connected_components(df).count() == 0


def test_dedup_clusters_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)],
                                  "doc_a long, doc_b long")
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in C.dedup_clusters(docs, pairs).collect()}
    assert got == {0: (0, 3), 1: (0, 3), 2: (0, 3), 3: (3, 1),
                   4: (4, 1), 5: (5, 2), 6: (5, 2), 7: (7, 1)}


def test_keep_canonical_quality_and_ties(spark):
    docs = spark.createDataFrame(
        [(0, 10), (1, 99), (2, 99), (3, 7), (4, 1)],
        "doc_id long, quality long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    kept = C.keep_canonical(docs, pairs, quality_col="quality").collect()
    by_id = {r["doc_id"]: r for r in kept}
    # cluster {0,1,2}: quality 99 tie between 1 and 2 -> smaller id 1
    assert sorted(by_id) == [1, 3, 4]
    assert by_id[1]["cluster_id"] == 0
    # without quality: smallest id survives
    kept2 = C.keep_canonical(docs, pairs).collect()
    assert sorted(r["doc_id"] for r in kept2) == [0, 3, 4]


def test_cc_string_ids(spark):
    pairs = spark.createDataFrame([("b", "c"), ("a", "b")],
                                  "doc_a string, doc_b string")
    got = {r["node"]: r["cluster_id"]
           for r in C.connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_corpus_dedup_composition(spark):
    """The flagship composed pipeline (operators/pipeline.corpus_dedup):
    planted exact dups collapse to one row carrying the copy count,
    planted near-dups (one char changed) collapse to the
    highest-n_chars survivor, independents pass through as singleton
    train/val/test rows."""
    from tilemaker_spark.operators import pipeline as P

    long_a = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (0, long_a, len(long_a)),              # near-dup cluster, shorter
        (1, long_a + "extra tail words here", len(long_a) + 22),  # best copy
        (2, long_a, len(long_a)),              # exact dup of 0 -> dropped
        (3, "completely different text about spark and ducks " * 6, 288),
        (4, "another independent document with its own words " * 6, 288),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = {r["doc_id"]: r for r in
           P.corpus_dedup(df, jaccard_threshold=0.6).collect()}

    # exact stage: 0 survives the {0,2} md5 group with n_exact_dups=2;
    # near-dup stage: {0,1} cluster -> 1 (longer) is canonical
    assert sorted(out) == [1, 3, 4]
    assert out[1]["cluster_id"] == 0 and out[1]["n_exact_dups"] == 1
    assert out[3]["n_exact_dups"] == 1 and out[3]["cluster_id"] == 3
    assert all(r["split"] in ("train", "val", "test") for r in out.values())

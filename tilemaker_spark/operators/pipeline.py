"""End-to-end training-corpus dedup composition.

The shape a real training-data run uses (GPT-3 / Gopher / RefinedWeb
data cards all describe this chain): exact dedup first (cheap, removes
byte-identical copies), near-dup candidate generation over the
survivors (MinHash + LSH banding), transitive closure of the pair list
into clusters (alternating-star connected components), one canonical
survivor per cluster (highest quality copy), then a deterministic
train/val/test split of the kept documents.

Every stage is an already-proven operator (operators/dedup.py,
operators/components.py, operators/sampling.py); this module is the
composition — the point is that the stages CHAIN without any
driver-side materialization between them, so the whole pipeline is one
Spark DAG (plus the bounded O(log d) component rounds).

Scale shape at 100 TB: exact dedup is one shuffle on the content hash;
LSH is bucketed + capped (no all-pairs path); components converge in
O(log d) rounds over the pair list only (pairs << docs); canonical
selection is one window over cluster_id; the split is a zero-shuffle
projection.  No stage ever shuffles the full text column twice — the
survivors' text is read once into the signature subtree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import components as components_ops
from . import dedup as dedup_ops
from . import sampling as sampling_ops


def corpus_dedup(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 quality_col: str = "n_chars",
                 jaccard_threshold: float = 0.6,
                 n_hashes: int = 32, bands: int = 8, k: int = 5,
                 split_weights: dict[str, float] | None = None,
                 split_salt: int = 0) -> DataFrame:
    """exact dedup -> MinHash-LSH pairs -> connected components ->
    keep-canonical -> deterministic split, as one composed DAG.

    Output: (doc_id, cluster_id, n_exact_dups, split) — one row per
    finally-kept document.  ``n_exact_dups`` counts the byte-identical
    copies the kept document represents (>= 1); ``cluster_id`` is the
    near-dup component minimum among exact-dedup survivors; ``split``
    is the reproducible hash split (pure function of the id).
    """
    # 1. exact: min-id survivor per normalized-text md5
    exact = dedup_ops.exact_dedup(df, text_col, id_col) \
        .select(F.col("doc_id").alias(id_col),
                F.col("n_dupes").alias("n_exact_dups"))
    survivors = df.join(exact, id_col)

    # 2. near-dup candidate pairs over the survivors (bucketed + capped)
    pairs = dedup_ops.minhash_lsh_pairs(
        survivors, text_col, id_col, n_hashes=n_hashes, bands=bands,
        k=k, jaccard_threshold=jaccard_threshold)

    # 3+4. transitive clusters, one canonical survivor per cluster
    kept = components_ops.keep_canonical(
        survivors, pairs, id_col, quality_col=quality_col)

    # 5. reproducible split of the kept corpus
    out = sampling_ops.hash_split(kept, id_col, weights=split_weights,
                                  salt=split_salt)
    return out.select(id_col, "cluster_id", "n_exact_dups", "split")

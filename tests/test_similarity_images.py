"""ANN similarity + image-column operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilemaker_spark.kernels import png
from tilemaker_spark.operators import images, similarity
from tilemaker_spark.sources import synth


def test_cosine_topk_matches_numpy(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100).cache()
    rows = e.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = e.filter(F.col("vec_id") == rows[0]["vec_id"]).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.cosine_topk_bruteforce(
        q, e.select(F.col("vec_id").alias("cand_id"), "embedding"), k=5)
    got = [r["cand_id"] for r in out.orderBy("rank").collect()]
    # numpy ground truth
    qv = mat[0]
    sims = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = sorted(range(len(ids)),
                   key=lambda i: (-sims[i], ids[i]))
    truth = [int(ids[i]) for i in order if ids[i] != rows[0]["vec_id"]][:5]
    assert got == truth


def test_ann_lsh_finds_planted_duplicate(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal((50, 16)).astype(float)
    rows = [(i, base[i].tolist()) for i in range(50)]
    rows.append((999, (base[3] + 0.001).tolist()))  # near-identical to 3
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 999).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ann_lsh_topk(
        q, df.select(F.col("vec_id").alias("cand_id"), "embedding"),
        k=1, dim=16, n_planes=8, n_probes=4)
    top = out.collect()
    assert top and top[0]["cand_id"] == 3


def test_embedding_near_dups(spark):
    rng = np.random.Generator(np.random.PCG64(9))
    base = rng.standard_normal((30, 16)).astype(float)
    rows = [(i, base[i].tolist()) for i in range(30)]
    rows.append((100, (base[7] * 1.01).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.embedding_near_dups(df, threshold=0.99, dim=16,
                                         n_planes=6)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (7, 100) in pairs


# ---------------- images ----------------

@pytest.fixture(scope="module")
def img_df(spark):
    return synth.images_df(spark, 60, with_bytes=True).cache()


def test_decode_verify_psnr_invariant(img_df):
    out = images.decode_verify(img_df, psnr_min=40.0).collect()
    assert len(out) == 60
    assert all(r["pix_ok"] for r in out)
    png_rows = [r for r in out if r["fmt"] == "png"]
    jpg_rows = [r for r in out if r["fmt"] == "jpeg"]
    assert png_rows and jpg_rows
    assert all(r["psnr_db"] == 99.0 for r in png_rows)   # lossless
    assert all(40.0 <= r["psnr_db"] < 99.0 for r in jpg_rows)  # lossy stub


def test_caption_byte_identity(img_df, spark):
    # regenerating the table yields byte-identical captions per row
    again = synth.images_df(spark, 60, with_bytes=False)
    a = {r["image_id"]: r["caption"] for r in img_df.collect()}
    b = {r["image_id"]: r["caption"] for r in again.collect()}
    assert a == b


def test_image_features_and_resize(img_df):
    feats = images.image_features(img_df.limit(10)).collect()
    assert all(0 <= r["mean_r"] <= 255 for r in feats)
    resized = images.resize_images(img_df.limit(5), 8, 8).collect()
    for r in resized:
        px = png.decode_png(bytes(r["bytes"]))
        assert px.shape == (8, 8, 3)


def test_phash_near_dups_self(spark):
    # identical phash -> hamming 0 pair found via chunk blocking
    df = spark.createDataFrame(
        [("a", 12345), ("b", 12345), ("c", 99999999)],
        "image_id string, phash long")
    out = images.phash_near_dups(df, max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {("a", "b")}


def test_jpeg_stub_raises_on_real_jpeg():
    with pytest.raises(NotImplementedError):
        png.decode_jpeg_stub(b"\xff\xd8\xff\xe0" + b"0" * 32)

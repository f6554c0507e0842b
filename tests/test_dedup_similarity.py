"""Tests for dedup, similarity, text-stats, multimodal, reconcile operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.functions.textstats import (
    doc_fingerprint,
    lang_id,
    quality_score,
    subword_count,
    token_count,
)
from jurisprudencia_privada_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_dedup,
    verify_jaccard,
)
from jurisprudencia_privada_etl_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthetic_assets,
)
from jurisprudencia_privada_etl_spark.operators.reconcile import (
    missing_keys,
    orphan_keys,
    split_valid,
)
from jurisprudencia_privada_etl_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_topk,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
FAR = "completely different words about database engines and columnar formats"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, NEAR), (2, FAR), (3, BASE), (4, "tiny doc")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shingles(spark):
    got = spark.range(1).select(shingles(F.lit("a b c d"), 3).alias("s")).first()["s"]
    assert got == ["a b c", "b c d"]
    short = spark.range(1).select(shingles(F.lit("a b"), 3).alias("s")).first()["s"]
    assert short == ["a b"]


def test_exact_dedup(docs):
    out = exact_dedup(docs).orderBy("doc_id").toPandas()
    # doc 3 is an exact copy of doc 0 → dropped; everything else kept
    assert list(out["doc_id"]) == [0, 1, 2, 4]


def test_minhash_candidates_and_verify(docs):
    cand = minhash_lsh_candidates(docs, num_hashes=32, bands=16)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (0, 3) in pairs  # exact dup always collides
    assert (0, 1) in pairs or (1, 3) in pairs  # near dup collides in some band
    verified = verify_jaccard(cand, docs, threshold=0.5)
    vp = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (0, 3) in vp
    assert all(2 not in p and 4 not in p for p in vp)  # FAR/tiny never verified


def test_minhash_dedup_keeps_representatives(docs):
    kept = sorted(r["doc_id"] for r in minhash_dedup(docs, threshold=0.5, num_hashes=32, bands=16).collect())
    assert 0 in kept and 2 in kept and 4 in kept
    assert 3 not in kept  # exact dup dropped


def test_simhash_near_dups_are_close(spark, docs):
    sigs = {r["doc_id"]: r["s"] for r in docs.select("doc_id", simhash("text").alias("s")).collect()}
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(0, 3) == 0
    assert ham(0, 1) < ham(0, 2)


def test_simhash_dedup(docs):
    kept = sorted(r["doc_id"] for r in simhash_dedup(docs, max_hamming=3).collect())
    assert 3 not in kept and 0 in kept and 2 in kept


def test_ngram_jaccard_pairs(docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert out[(0, 3)] == 1.0
    assert (0, 1) in out and out[(0, 1)] < 1.0
    assert (0, 2) not in out


def test_brute_force_topk(spark):
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([(100, [1.0, 0.0])], ["query_id", "embedding"])
    out = brute_force_topk(corpus, q, k=2).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [0, 1]
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert out[1]["cosine"] == pytest.approx(0.9 / math.sqrt(0.82), rel=1e-6)


def test_lsh_topk_recalls_self(spark):
    import random

    rng = random.Random(7)
    corpus = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)],
        ["vec_id", "embedding"],
    )
    q = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(corpus, q, k=1, n_planes=3, dim=8)
    got = {r["query_id"]: r["vec_id"] for r in out.where(F.col("rank") == 1).collect()}
    assert got == {i: i for i in range(5)}  # self is always in own bucket


def test_textstats(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and it is fine",),
         ("o gato que está em um tapete para a sesta",),
         ("zzz qqq xxx",)],
        ["text"],
    )
    out = df.select(
        lang_id("text").alias("lang"),
        token_count("text").alias("n"),
        subword_count("text").alias("sw"),
        quality_score("text").alias("q"),
        doc_fingerprint("text").alias("fp"),
    ).collect()
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "pt"
    assert out[2]["lang"] == "und"
    assert out[0]["n"] == 10
    assert out[0]["sw"] >= out[0]["n"]
    assert 0.0 <= out[2]["q"] < out[0]["q"] <= 1.0
    # fingerprint is order-sensitive
    df2 = spark.createDataFrame([("cat the",), ("the cat",)], ["text"])
    fps = [r["fp"] for r in df2.select(doc_fingerprint("text").alias("fp")).collect()]
    assert fps[0] != fps[1]


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, 30, seed=9)
    feats = extract_features(assets).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 16 for f in feats["features"])
    # deterministic: same input → same features
    feats2 = extract_features(synthetic_assets(spark, 30, seed=9)).toPandas()
    assert feats.sort_values("asset_id")["content_sha"].tolist() == \
        feats2.sort_values("asset_id")["content_sha"].tolist()

    resized = resize_images(assets, 32, 32).toPandas()
    assert all(m["width"] == 32 and m["height"] == 32 for m in resized["meta"])

    frames = sample_frames(assets, every_ms=2000).toPandas()
    n_videos = assets.where(F.col("media_type") == "video").count()
    assert frames["asset_id"].nunique() <= n_videos
    assert (frames["frame_ms"] % 2000 == 0).all()


def test_multimodal_strict_mode_raises(spark):
    assets = synthetic_assets(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(assets, decode_stub_mode="strict").collect()


def test_reconcile_and_dead_letter(spark):
    expected = spark.createDataFrame(
        [("r1", "a.py"), ("r1", "b.py"), ("r1", "c.py")], ["repo", "path"]
    )
    target = spark.createDataFrame([("r1", "a.py"), ("r1", "z.py")], ["repo", "path"])
    miss = {(r["repo"], r["path"]) for r in missing_keys(expected, target).collect()}
    assert miss == {("r1", "b.py"), ("r1", "c.py")}
    orph = {(r["repo"], r["path"]) for r in orphan_keys(target, expected).collect()}
    assert orph == {("r1", "z.py")}

    rows = spark.createDataFrame(
        [("I", "r1", "a.py"), ("X", "r1", "b.py"), ("U", None, "c.py")],
        ["op", "repo", "path"],
    )
    valid, dead = split_valid(rows, required_cols=["repo", "path"])
    assert valid.count() == 1
    errs = {r["error"] for r in dead.collect()}
    assert errs == {"unsupported op", "missing required field: repo"}

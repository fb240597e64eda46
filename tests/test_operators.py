"""Operator-level tests: dedup, similarity, text stats, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sitecheck_spark.operators import dedup, similarity
from sitecheck_spark.functions import textstats
from sitecheck_spark import multimodal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),      # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog", "en"),      # near dup of 0
        (3, "completely different text about spark engines and shuffles", "en"),
        (4, "der schnelle braune fuchs und die faule katze", "de"),
        (5, "le renard brun rapide et le chien paresseux", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs):
    out = {r["fingerprint"]: (r["doc_id"], r["n_copies"]) for r in dedup.exact_dedup(docs).collect()}
    assert len(out) == 5  # 6 docs, one exact pair
    assert (0, 2) in out.values()


def test_jaccard_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 4) not in pairs and (0, 5) not in pairs


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text -> identical simhash
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[4]).count("1")
    assert ham_near < ham_far


def test_brute_force_topk_vs_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(30), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    got = similarity.brute_force_topk(emb, emb.filter("vec_id < 3"), k=2).collect()

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -np.inf)
    for q in range(3):
        want = list(np.argsort(-sims[q])[:2])
        got_q = [r["neighbor_id"] for r in sorted(
            (r for r in got if r["query_id"] == q), key=lambda r: r["rank"])]
        assert got_q == want


def test_lsh_topk_recall(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(100, 16)).astype("float32")
    vecs[50] = vecs[0] + rng.normal(scale=0.01, size=16).astype("float32")  # planted near-dup
    pdf = pd.DataFrame({"vec_id": range(100), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    got = similarity.lsh_topk(emb, emb.filter("vec_id = 0"), k=1, dim=16).collect()
    assert got and got[0]["neighbor_id"] == 50  # near-identical vector shares the bucket


def test_except_distinct_with_duplicates(spark):
    """q_except regression: with duplicates in `a` of a value also in `b`,
    exceptAll().distinct() resurrects the value (it subtracts COUNTS);
    subtract() is true EXCEPT DISTINCT and must drop it entirely."""
    a = spark.createDataFrame([(1,), (1,), (2,)], "id long")
    b = spark.createDataFrame([(1,)], "id long")
    assert {r["id"] for r in a.subtract(b).collect()} == {2}
    # the old implementation would have produced {1, 2} — pin the difference
    wrong = {r["id"] for r in a.exceptAll(b).distinct().collect()}
    assert wrong == {1, 2}


def test_lang_id(docs):
    preds = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(docs).collect()}
    assert preds[0] == "en" and preds[4] == "de" and preds[5] == "fr"


def test_multimodal_features_schema_and_determinism(spark, docs):
    media = docs.select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "utf-8").alias("payload"))
    out1 = multimodal.extract_image_features(media).orderBy("media_id").collect()
    out2 = multimodal.extract_image_features(media).orderBy("media_id").collect()
    assert out1 == out2
    assert all(r["decode_ok"] for r in out1)
    assert all(r["n_bytes"] > 0 and len(r["sha256"]) == 64 for r in out1)


def test_multimodal_real_codec_stub_degrades_gracefully(spark, docs):
    media = docs.select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "utf-8").alias("payload"))
    out = multimodal.extract_image_features(media, use_real_codec=True).collect()
    assert all(not r["decode_ok"] and r["width"] is None for r in out)


def test_frame_sampling_fanout(spark):
    media = spark.createDataFrame(
        [(1, b"x" * 1000, 4000), (2, b"y" * 50, 400)],
        "media_id long, payload binary, duration_ms int",
    )
    out = multimodal.sample_frames(media).collect()
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert len(per[1]) == 10  # 4000ms / (40ms*10)
    assert len(per[2]) == 1

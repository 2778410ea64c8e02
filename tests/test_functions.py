"""Tests for dedup / similarity / textstats / multimodal operators over the
driver testdata tables."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from iresearch_spark.functions import (
    cosine_topk,
    doc_fingerprint,
    exact_dedup,
    hyperplane_lsh_buckets,
    language_id,
    lsh_cosine_topk,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_stats,
    simhash,
)
from iresearch_spark.functions.multimodal import extract_features, synthesize_media


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()


def test_exact_dedup_self_union(spark, docs):
    # duplicate the corpus -> every doc is a dup group of 2
    d2 = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    groups = exact_dedup(d2, ["text"]).collect()
    assert len(groups) == docs.count()
    assert all(g["n_copies"] >= 2 for g in groups)


def test_minhash_identical_docs_estimate_1(spark, docs):
    d2 = docs.limit(20)
    dup = d2.unionByName(d2.withColumn("doc_id", F.col("doc_id") + 100000))
    pairs = minhash_lsh_pairs(dup, threshold=0.99).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    for r in d2.collect():
        assert (r["doc_id"], r["doc_id"] + 100000) in found


def test_minhash_agreement_tracks_jaccard(spark, docs):
    """LSH estimated jaccard should correlate with exact n-gram jaccard on
    the near-dup pairs the corpus contains by construction."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    if not exact:
        pytest.skip("no high-jaccard pairs at this SF")
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, shingle=2, threshold=0.5).collect()
    }
    hits = sum(1 for p in exact if p in est)
    assert hits / len(exact) >= 0.8, (len(exact), hits)


def test_simhash_duplicate_docs_equal(spark, docs):
    d = docs.limit(10)
    s1 = {r["id"]: r["simhash"] for r in simhash(d).collect()}
    s2 = {r["id"]: r["simhash"] for r in simhash(d).collect()}
    assert s1 == s2 and len(s1) == 10


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    q = rows[0]["embedding"]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    qv = np.array(q, dtype=np.float64)
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(ids, cos), key=lambda t: (-t[1], t[0]))[:10]
    got = [(r["id"], r["cosine"]) for r in cosine_topk(emb, list(q), 10).collect()]
    assert [g for g, _ in got] == [i for i, _ in order]
    for (gi, gc), (ei, ec) in zip(got, order):
        assert gc == pytest.approx(ec, rel=1e-9)


def test_lsh_topk_recall(spark, emb):
    rows = emb.collect()
    dim = len(rows[0]["embedding"])
    q = list(rows[3]["embedding"])
    exact = {r["id"] for r in cosine_topk(emb, q, 10).collect()}
    bucketed = hyperplane_lsh_buckets(emb, dim, n_planes=8).persist()
    approx = {
        r["id"]
        for r in lsh_cosine_topk(bucketed, q, dim, 10, n_planes=8, multiprobe_bits=2).collect()
    }
    assert len(exact & approx) / 10 >= 0.5  # recall with multiprobe


def test_quality_and_langid_and_fingerprint(spark, docs):
    q = quality_stats(docs).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q)
    assert all(r["n_tokens"] > 0 for r in q)

    langs = language_id(docs).collect()
    assert all(r["pred_lang"] in ("en", "code", "data") for r in langs)

    fp1 = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs).collect()}
    assert fp1 == fp2
    # docs with identical token sequences share fingerprints; distinct docs
    # should mostly differ
    assert len(set(fp1.values())) > len(fp1) * 0.5


def test_multimodal_plumbing(spark, docs):
    media = synthesize_media(docs.limit(50))
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media).collect()
    assert len(feats) == 50
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic across runs
    feats2 = extract_features(media).collect()
    assert {r["doc_id"]: r["features"] for r in feats} == {
        r["doc_id"]: r["features"] for r in feats2
    }


def test_multimodal_resize_and_frame_sample(spark, docs):
    from iresearch_spark.functions.multimodal import (
        resize_media,
        sample_frames,
        synthesize_media,
    )

    media = synthesize_media(docs.limit(5))
    resized = resize_media(media, 8, 8).collect()
    assert len(resized) == 5
    assert all(r["media"]["width"] == 8 and r["media"]["height"] == 8 for r in resized)
    # pretend 6 frames per payload, sample every 2nd -> 3 rows per doc
    media6 = media.withColumn(
        "media",
        F.col("media").withField("n_frames", F.lit(6)).withField("kind", F.lit("video")),
    )
    frames = sample_frames(media6, every_nth=2).collect()
    assert len(frames) == 15
    assert sorted({f["frame_idx"] for f in frames}) == [0, 2, 4]
    assert all(len(bytes(f["payload"])) > 0 for f in frames)


def test_ivf_full_probe_equals_exact_and_partial_probe_recall(spark):
    import numpy as np

    from iresearch_spark.functions.similarity import cosine_topk, ivf_build, ivf_topk

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 16, 6, 40
    centers = rng.normal(size=(n_clusters, dim))
    rows, vid = [], 0
    for c in range(n_clusters):
        for _ in range(per):
            rows.append((vid, [float(x) for x in centers[c] + 0.2 * rng.normal(size=dim)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[5][1]
    exact = [(r["id"], r["cosine"]) for r in cosine_topk(emb, q, 10).collect()]
    indexed, cents = ivf_build(emb, dim, n_lists=6, iters=2)
    indexed = indexed.persist()
    # full probe == exact brute force (correctness pin)
    full = [(r["id"], r["cosine"]) for r in ivf_topk(indexed, cents, q, 10, nprobe=6).collect()]
    assert full == exact
    # partial probe keeps high recall on clustered data
    part = [r["id"] for r in ivf_topk(indexed, cents, q, 10, nprobe=2).collect()]
    recall = len(set(part) & {i for i, _ in exact}) / 10
    assert recall >= 0.9, recall

"""Resumability + determinism + lineage invariants (north rule: every stage
resumable from snapshot checkpoints; per-partition lineage rows; per-row
content-sha256 invariant vs the source table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.merge import unpack_postings
from iresearch_spark.index.segments import (
    IndexStore,
    build_segment,
    verify_lineage,
    verify_sha_invariant,
)


@pytest.fixture(scope="module")
def corpus(spark):
    c = generate_corpus(spark, 150, seed=31).persist()
    c.count()
    return c


def _postings_snapshot(spark, store, seg):
    flat = unpack_postings(store.read_union(spark, "postings", [seg]), True)
    return sorted(
        (r["term"], r["doc_id"], r["tf"], tuple(r["positions"])) for r in flat.collect()
    )


def test_crash_before_commit_leaves_generation_intact(spark, corpus, tmp_path):
    store = IndexStore(str(tmp_path / "ix"))
    build_segment(spark, store, corpus, "s0")
    gen_before = store.current().gen

    # simulated crash: a rebuild that dies before the manifest swap
    build_segment(spark, store, corpus.limit(50), "s1", commit=False)
    assert store.current().gen == gen_before
    assert [s.name for s in store.current().segments] == ["s0"]

    # resume: re-run the same stage; idempotent overwrite then commit
    build_segment(spark, store, corpus.limit(50), "s1", commit=True)
    m = store.current()
    assert m.gen == gen_before + 1
    assert {s.name for s in m.segments} == {"s0", "s1"}


def test_rebuild_is_deterministic(spark, corpus, tmp_path):
    a = IndexStore(str(tmp_path / "a"))
    b = IndexStore(str(tmp_path / "b"))
    # different input partitioning must not change any output content
    build_segment(spark, a, corpus.repartition(3), "seg")
    build_segment(spark, b, corpus.repartition(17), "seg")
    assert _postings_snapshot(spark, a, "seg") == _postings_snapshot(spark, b, "seg")
    dla = {(r["doc_id"], r["len"]) for r in a.read(spark, "seg", "doclen").collect()}
    dlb = {(r["doc_id"], r["len"]) for r in b.read(spark, "seg", "doclen").collect()}
    assert dla == dlb


def test_lineage_verification(spark, corpus, tmp_path):
    store = IndexStore(str(tmp_path / "ix"))
    build_segment(spark, store, corpus, "s0")
    assert verify_lineage(spark, store, "s0", corpus)
    # tampered / different input must NOT verify
    assert not verify_lineage(spark, store, "s0", corpus.limit(100))


def test_sha_invariant(spark, corpus, tmp_path):
    store = IndexStore(str(tmp_path / "ix"))
    build_segment(spark, store, corpus, "s0")
    assert verify_sha_invariant(spark, store, "s0", corpus) == 0
    # corrupt source -> violations detected
    bad = corpus.withColumn(
        "content", F.when(F.rand(1) < 0.2, F.lit("tampered")).otherwise(F.col("content"))
    )
    assert verify_sha_invariant(spark, store, "s0", bad) > 0

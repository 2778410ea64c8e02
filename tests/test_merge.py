"""Merge/consolidation tests (mirrors reference merge_writer_tests +
consolidation_policy_tests): merging segments must yield postings identical
to a from-scratch single-segment build over the concatenated corpus, with
docIDs remapped by contiguous base offsets; tombstoned docs are dropped and
live docs densely renumbered."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.merge import (
    build_doc_map,
    consolidate,
    merge_segments,
    tier_candidates,
    unpack_postings,
)
from iresearch_spark.index.segments import IndexStore, Manifest, SegmentMeta, build_segment
from iresearch_spark.search import SearchEngine, Term


def _flat_postings(spark, store, segs):
    blocks = store.read_union(spark, "postings", segs)
    flat = unpack_postings(blocks, with_positions=True)
    return {
        (r["term"], r["doc_id"]): (r["tf"], tuple(r["positions"]))
        for r in flat.collect()
    }


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    """Two-segment store (split corpus) + single-segment reference store."""
    corpus = generate_corpus(spark, 200, seed=11).persist()
    # deterministic disjoint halves by stable key hash
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    c1, c2 = corpus.where(h == 0), corpus.where(h == 1)

    multi = IndexStore(str(tmp_path_factory.mktemp("multi")))
    build_segment(spark, multi, c1, "s1")
    build_segment(spark, multi, c2, "s2")
    return spark, multi, corpus


def test_merge_equals_members_with_offsets(stores):
    spark, store, _ = stores
    m = store.current()
    metas = {s.name: s for s in m.segments}
    n1 = metas["s1"].docs_count

    before = _flat_postings(spark, store, ["s1"])
    before2 = _flat_postings(spark, store, ["s2"])

    merged_meta = merge_segments(spark, store, ["s1", "s2"], "m12")
    assert merged_meta.docs_count == metas["s1"].docs_count + metas["s2"].docs_count
    assert merged_meta.sum_len == metas["s1"].sum_len + metas["s2"].sum_len

    after = _flat_postings(spark, store, ["m12"])
    expected = {}
    for (t, d), v in before.items():
        expected[(t, d)] = v  # s1 base offset = 0
    for (t, d), v in before2.items():
        expected[(t, d + n1)] = v  # s2 base offset = n1
    assert after == expected

    # manifest: members replaced atomically
    m2 = store.current()
    assert [s.name for s in m2.segments] == ["m12"]
    assert m2.gen == m.gen + 1


def test_merged_index_queryable(stores):
    spark, store, _ = stores
    eng = SearchEngine(spark, store)
    rows = eng.topk(Term("def"), 5).collect()
    assert len(rows) > 0
    assert all(rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1))


def test_merge_with_tombstones(spark, tmp_path_factory):
    corpus = generate_corpus(spark, 120, seed=13).persist()
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    store = IndexStore(str(tmp_path_factory.mktemp("tomb")))
    build_segment(spark, store, corpus.where(h == 0), "t1")
    build_segment(spark, store, corpus.where(h == 1), "t2")
    n1 = {s.name: s.docs_count for s in store.current().segments}["t1"]

    # tombstone the first two docs of t1 and one of t2
    tomb = spark.createDataFrame(
        [("t1", 1), ("t1", 2), ("t2", 3)], "segment string, doc_id long"
    )
    doc_map = build_doc_map(spark, store, ["t1", "t2"], tomb)
    rows = {(r["segment"], r["doc_id"]): r["new_doc"] for r in doc_map.collect()}
    assert ("t1", 1) not in rows and ("t2", 3) not in rows
    # dense 1-based renumbering, t1 first
    assert sorted(rows.values()) == list(range(1, len(rows) + 1))
    assert rows[("t1", 3)] == 1  # first live doc of t1

    meta = merge_segments(spark, store, ["t1", "t2"], "mt", tombstones=tomb)
    eng = SearchEngine(spark, store)
    assert meta.docs_count == eng.manifest.docs_count == len(rows)


def test_tier_policy():
    def seg(name, nbytes):
        return SegmentMeta(name=name, docs_count=1, sum_len=1, bytes=nbytes)

    m = Manifest(gen=1, segments=[seg("a", 1 << 20), seg("b", 1 << 20), seg("big", 1 << 32)])
    cands = tier_candidates(m)
    assert sorted(cands) == ["a", "b"]  # same floor tier, big one excluded

    m2 = Manifest(gen=1, segments=[seg("solo", 123)])
    assert tier_candidates(m2) == []


def test_consolidate_roundtrip(spark, tmp_path_factory):
    corpus = generate_corpus(spark, 90, seed=17).persist()
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(3))
    store = IndexStore(str(tmp_path_factory.mktemp("cons")))
    for i in range(3):
        build_segment(spark, store, corpus.where(h == i), f"c{i}")
    total = store.current().docs_count
    meta = consolidate(spark, store)
    assert meta is not None
    m = store.current()
    assert len(m.segments) == 1 and m.docs_count == total
    assert consolidate(spark, store) is None  # single segment: nothing to do

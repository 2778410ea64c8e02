"""Round-5 additions: bounded Damerau expansion (numpy batched DP,
vocab-routed with zero Spark jobs, distributed executor-side verify when
the dictionary is too large — r4 VERDICT wrong-3/next-4), and the
vectorized offsets/payloads stream kernels (next-2) staying correct."""

from __future__ import annotations

import random

import duckdb
import pytest

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.segments import IndexStore, build_segment
from iresearch_spark.search import Fuzzy, SearchEngine
from iresearch_spark.search.executor import _damerau, _damerau_batch


def test_damerau_batch_matches_scalar_property():
    """_damerau_batch == scalar _damerau == DuckDB damerau_levenshtein
    over seeded random pairs, including empty strings, length skew, and
    the transposed-pair-then-edit class; exercised across chunk
    boundaries (chunk=4 forces multiple chunks per length group)."""
    rng = random.Random(11)
    alpha = "abcde"
    queries = ["bathc", "", "ab", "abcdeabc"]
    con = duckdb.connect()
    try:
        for q in queries:
            cands = [
                "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 9)))
                for _ in range(120)
            ] + ["batch", "bathc", "ca", "abc", ""]
            got = _damerau_batch(cands, q, chunk=4)
            for c, g in zip(cands, got):
                assert g == _damerau(c, q), (c, q)
                exp = con.execute(
                    "SELECT damerau_levenshtein(?, ?)", [c, q]
                ).fetchone()[0]
                assert g == exp, (c, q)
    finally:
        con.close()


@pytest.fixture(scope="module")
def dam_engine(spark, tmp_path_factory):
    corpus = generate_corpus(spark, 200, seed=13)
    st = IndexStore(str(tmp_path_factory.mktemp("dam_ix")))
    build_segment(spark, st, corpus, "seg0")
    return SearchEngine(spark, st)


def test_fuzzy_damerau_vocab_path_runs_no_spark_jobs(dam_engine):
    """With the dictionary cached, the Damerau expansion is driver-local
    (length-band + batched DP): poisoning term_stats proves no Spark plan
    is touched — the r4 unbounded lev<=2d driver collect is gone."""
    eng = dam_engine
    eng.prepare_dictionary()
    assert eng._vocab not in (None, False)
    saved = eng.term_stats
    try:
        eng.term_stats = None  # any Spark access would AttributeError
        pairs = eng._fuzzy_damerau_pairs(
            Fuzzy("conts", distance=1, transpositions=True)
        )
    finally:
        eng.term_stats = saved
    terms = [t for t, _ in pairs]
    assert "const" in terms  # transposition distance 1
    assert all(_damerau(t, "conts") <= 1 for t in terms)
    # df ordering invariant: (doc_freq desc, term asc)
    assert pairs == sorted(pairs, key=lambda p: (-p[1], p[0]))


def test_fuzzy_damerau_distributed_path_equals_vocab_path(dam_engine):
    """Dictionary too large to cache -> the lev<=2d superset is verified
    by the batched DP on the EXECUTORS (mapInPandas) and only true
    matches reach the driver; results identical to the vocab path."""
    eng = dam_engine
    eng.prepare_dictionary()
    leaf = Fuzzy("conts", distance=2, transpositions=True)
    via_vocab = eng._fuzzy_damerau_pairs(leaf)
    saved = eng._vocab
    try:
        eng._vocab = None  # simulate vocab > VOCAB_CACHE_MAX
        via_spark = eng._fuzzy_damerau_pairs(leaf)
    finally:
        eng._vocab = saved
    assert via_vocab == via_spark
    assert len(via_vocab) > 0


def test_fuzzy_damerau_topk_end_to_end(dam_engine):
    """Engine top-k through the Damerau leaf still matches the scalar
    expansion contract after the batched rewrite."""
    hits = dam_engine.topk(
        Fuzzy("conts", distance=1, transpositions=True), k=5
    ).collect()
    assert len(hits) > 0
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)

"""Round-4 additions: self-contained DuckDB-parity pins for the two gate
entries the r3 driver snapshot missed (embedding_neardup_pairs,
ann_lsh_topk — r3 VERDICT next-1), the de-vacuated dedup_exact fixture
(next-2), the vectorized wildcard expansion (next-3), and the broadcast
tail-expansion path (next-10)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from iresearch_spark.plans.registry import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.01")


def _duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _rows(df):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    )


def _duck_rows(sql):
    con = _duck()
    try:
        return sorted(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r)
            for r in con.execute(sql).fetchall()
        )
    finally:
        con.close()


def test_embedding_neardup_duck_parity(spark):
    """Registry `_emb_neardup` vs its all-pairs DuckDB oracle, run locally
    so verification does not depend on when the driver snapshots the
    registry (r3 VERDICT wrong-1)."""
    ent = REGISTRY["embedding_neardup_pairs"]
    got = _rows(ent["fn"](spark, SF_DIR))
    exp = _duck_rows(ent["duck"])
    assert len(got) > 0, "fixture must produce real near-dup pairs"
    assert got == exp


def test_lsh_ann_property_row(spark):
    """ann_lsh_topk's property row: k rows returned, overlap floor met,
    every LSH hit carries its exact cosine."""
    ent = REGISTRY["ann_lsh_topk"]
    rows = ent["fn"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["n_rows"]) == (10, 10)
    assert r["overlap_floor_met"] and r["scores_exact"]


def test_dedup_exact_gate_not_vacuous(spark):
    """The r3 dedup_exact row compared 0 rows to 0 rows. The r4 fixture
    unions a duplicated slice, so the oracle checks real groups including
    the bounded sample_ids path."""
    ent = REGISTRY["dedup_exact"]
    got = _rows(ent["fn"](spark, SF_DIR))
    exp = _duck_rows(ent["duck"])
    assert len(got) >= 25  # one group per duplicated doc (plus any natural)
    assert got == exp
    # sample_ids carries both members of each synthetic group
    by_keep = {r[1]: r for r in got}
    assert by_keep[0][3] == "0,1000000"


def _tiny_engine(spark, tmp_path, docs):
    from iresearch_spark.index.segments import IndexStore, build_segment
    from iresearch_spark.search import SearchEngine

    store = IndexStore(str(tmp_path / "idx"))
    df = spark.createDataFrame(
        [("r", f"f{i:03d}.py", "c0", "py", t) for i, t in enumerate(docs)],
        "repo string, path string, commit string, lang string, content string",
    )
    build_segment(spark, store, df, "seg0")
    return SearchEngine(spark, store)


DOCS = [
    "spark index merge query",
    "sparse vector spark scan",
    "span of spark terms",
    "wildcard pattern span spin",
    "plain prose without the letter",
    "spun spin span spark",
]


def test_wildcard_vectorized_expansion(spark, tmp_path):
    """The vectorized (pandas str.fullmatch + literal-prefix bisect)
    wildcard expansion returns exactly what a naive per-term regex loop
    over the dictionary returns, for patterns with and without a literal
    prefix."""
    import re

    from iresearch_spark.search.query import Wildcard

    eng = _tiny_engine(spark, tmp_path, DOCS)
    vt, _ = eng._vocab_pairs()
    for pattern in ["sp*", "*a*n", "sp?n", "*", "s*k", "zz*", "sp*n*"]:
        got = [t for t, _ in eng._vocab_matches(Wildcard(pattern))]
        parts = "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern
        )
        rx = re.compile("^" + parts + "$", re.DOTALL)
        exp = [t for t in vt if rx.match(t)]
        assert got == exp, pattern


def test_tail_expansion_broadcast_plan(spark, tmp_path):
    """Past TERM_IN_MAX the expansion terms reach the scan as a broadcast
    left-semi join (not a driver-serialized IN-list), and results are
    identical to the IN-list path."""
    from iresearch_spark.search.query import Prefix

    eng = _tiny_engine(spark, tmp_path, DOCS)
    node = Prefix("sp", scored_terms_limit=1000)
    base = [tuple(r) for r in eng.topk(node, k=20).collect()]
    assert len(base) > 0

    eng.TERM_IN_MAX = 1  # force the broadcast path (expansion > 1 term)
    spec = eng._query_spec(node)
    assert spec is not None
    blocks = eng._term_filtered(eng.postings, list(spec[0].keys()))
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    got = [tuple(r) for r in eng.topk(node, k=20).collect()]
    assert got == base


def test_ngram_match_total_distinct(spark):
    """A query with REPEATED n-grams scores against the distinct-gram
    denominator (ADVICE r3): ['a','b','a','b'] has grams [ab, ba, ab] ->
    2 distinct; a doc containing both must reach score 1.0."""
    from iresearch_spark.functions.ngramsim import ngram_match_topk

    docs = spark.createDataFrame(
        [(1, "xx yy xx yy"), (2, "xx zz")], "doc_id long, text string"
    )
    out = ngram_match_topk(docs, ["xx", "yy", "xx", "yy"], threshold=0.5, k=5)
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    assert rows[1] == 1.0

"""Generic per-occurrence payload stream (the payload half of the
reference .pay, core/formats/formats_10.cpp:166-267 — r3 VERDICT
missing-4): caller-supplied bytes per position, written by
build_segment(payload_fn=...), read back via SearchEngine.payloads(),
preserved losslessly by the join-free merge (incl. tombstone renumbering).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from iresearch_spark.analysis.analyzers import DEFAULT_DELIM_REGEX, DEFAULT_STOPWORDS
from iresearch_spark.index.merge import merge_segments
from iresearch_spark.index.segments import IndexStore, build_segment
from iresearch_spark.search import SearchEngine, Term

TEXTS = [
    "spark builds fast index",
    "query the spark engine twice spark",
    "merge keeps payload bytes",
    "tail doc mentions spark again",
    "spark spark spark",
    "nothing relevant here",
]


def _pfn(toks, starts, lens):
    # batch-vectorized: one call per Arrow batch over kept occurrences
    return [f"{t}@{s}".encode() for t, s in zip(toks.tolist(), starts.tolist())]


def _rows(texts, start=0):
    return [("r", f"f{start + i:03d}.py", "c0", "py", t) for i, t in enumerate(texts)]


def _expected(texts, term):
    """gdoc -> ordered payload list, recomputed independently (same
    delimiter-gap tokenization + stopword filter the analyzer pins)."""
    rx = re.compile(DEFAULT_DELIM_REGEX)
    stops = frozenset(DEFAULT_STOPWORDS)
    out = {}
    for i, text in enumerate(texts):
        low = text.lower()
        toks, prev = [], 0
        for dm in rx.finditer(low):
            s, e = dm.start(), dm.end()
            if s > prev:
                toks.append((low[prev:s], prev))
            prev = max(e, prev)
        if prev < len(low):
            toks.append((low[prev:], prev))
        pays = [f"{t}@{s}".encode() for t, s in toks if t not in stops and t == term]
        if pays:
            out[i + 1] = pays
    return out


def _build(spark, root, slices, **kw):
    store = IndexStore(root)
    for name, rows in slices:
        df = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        )
        build_segment(spark, store, df, name, payload_fn=_pfn, **kw)
    return store


def _payload_map(eng, term):
    return {
        r["gdoc"]: [bytes(b) for b in r["payloads"]]
        for r in eng.payloads([term]).collect()
    }


def test_payload_roundtrip(spark, tmp_path):
    store = _build(spark, str(tmp_path / "one"), [("all", _rows(TEXTS))])
    eng = SearchEngine(spark, store)
    got = _payload_map(eng, "spark")
    assert got == _expected(TEXTS, "spark")
    # multiple occurrences stay in position order
    assert got[5] == [b"spark@0", b"spark@6", b"spark@12"]
    # scoring path untouched by the extra stream
    assert eng.topk(Term("spark"), 5).count() == 4


def test_payload_with_offsets_together(spark, tmp_path):
    store = _build(
        spark, str(tmp_path / "both"), [("all", _rows(TEXTS))], with_offsets=True
    )
    eng = SearchEngine(spark, store)
    assert _payload_map(eng, "spark") == _expected(TEXTS, "spark")
    offs = eng.offsets(["spark"]).collect()
    assert len(offs) == len(_expected(TEXTS, "spark"))


def test_payload_merge_preserved(spark, tmp_path):
    rows = _rows(TEXTS)
    store = _build(
        spark, str(tmp_path / "multi"), [("s1", rows[:3]), ("s2", rows[3:])]
    )
    merge_segments(spark, store, ["s1", "s2"], "m")
    got = _payload_map(SearchEngine(spark, store), "spark")
    assert got == _expected(TEXTS, "spark")


def test_payload_merge_with_tombstones(spark, tmp_path):
    rows = _rows(TEXTS)
    store = _build(
        spark, str(tmp_path / "tomb"), [("s1", rows[:3]), ("s2", rows[3:])]
    )
    tomb = spark.createDataFrame([("s1", 2), ("s2", 2)], "segment string, doc_id long")
    merge_segments(spark, store, ["s1", "s2"], "mt", tombstones=tomb)
    kept = [TEXTS[0], TEXTS[2], TEXTS[3], TEXTS[5]]  # survivors, dense renumber
    got = _payload_map(SearchEngine(spark, store), "spark")
    assert got == _expected(kept, "spark")


def test_payload_mixed_merge_refused(spark, tmp_path):
    rows = _rows(TEXTS)
    store = _build(spark, str(tmp_path / "mix"), [("s1", rows[:3])])
    df = spark.createDataFrame(
        rows[3:], "repo string, path string, commit string, lang string, content string"
    )
    build_segment(spark, store, df, "s2")  # no payload_fn
    with pytest.raises(ValueError, match="payload"):
        merge_segments(spark, store, ["s1", "s2"], "bad")

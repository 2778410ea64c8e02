"""Randomized boolean-tree property test (r5): seeded random And/Or/Not
trees over real vocabulary terms, evaluated by the engine in PRECISE
(float64 + 6dp rounding) mode and by an independent dict-based oracle that
mirrors the documented scoring semantics (boost propagation
boost*node.boost into leaves, kSum/kMax/kMin merges, min_match counting,
exclusion legs contribute no score, lone Not = universe at constant
boost). Exercises both the flat WAND kernel shapes (_query_spec) and the
general nested evaluator (_eval) with one oracle.

Deterministic: seeds are fixed, so any pass is a permanent pin."""

from __future__ import annotations

import math
import random

import pytest

from iresearch_spark.analysis.analyzers import DEFAULT_STOPWORDS
from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.segments import IndexStore, build_segment
from iresearch_spark.search import (
    And,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    SearchEngine,
    Term,
    Wildcard,
)
from iresearch_spark.search.query import Node, normalize
from iresearch_spark.search.scorers import PreciseBM25
from tests import oracle

STOPS = frozenset(DEFAULT_STOPWORDS)
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def rt(spark, tmp_path_factory):
    corpus = generate_corpus(spark, 250, seed=29).persist()
    rows = corpus.select("repo", "path", "commit", "content").collect()
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    docs = [(i + 1, r["content"]) for i, r in enumerate(rows)]
    idx = oracle.build_index(docs, STOPS)
    st = IndexStore(str(tmp_path_factory.mktemp("rt_ix")))
    build_segment(spark, st, corpus, "seg0")
    corpus.unpersist()
    eng = SearchEngine(spark, st, scorer=PreciseBM25())
    return eng, idx


def _score_term(idx, term: str, boost: float) -> dict[int, float]:
    n = idx.doc_freq(term)
    if n == 0:
        return {}
    idf = math.log1p((idx.n_docs - n + 0.5) / (n + 0.5))
    out = {}
    for doc, tf, _pos in idx.postings[term]:
        dl = idx.doclen[doc]
        out[doc] = (boost * idf) * ((K1 + 1.0) * tf) / (
            K1 * ((1.0 - B) + (B * dl) / idx.avg_dl) + tf
        )
    return out


def _universe(idx) -> set[int]:
    return set(idx.doclen)


def _score_phrase(idx, terms: list[str], boost: float) -> dict[int, float]:
    """Float64 fixed-phrase BM25: phrase frequency per doc, idf = sum of
    member idfs (the engine's precise-mode phrase semantics)."""
    if any(t not in idx.postings for t in terms):
        return {}
    idf = sum(
        math.log1p((idx.n_docs - idx.doc_freq(t) + 0.5) / (idx.doc_freq(t) + 0.5))
        for t in terms
    )
    pos_by_doc = [{d: set(ps) for d, _, ps in idx.postings[t]} for t in terms]
    out: dict[int, float] = {}
    for doc in pos_by_doc[0]:
        if not all(doc in m for m in pos_by_doc[1:]):
            continue
        ptf = sum(
            1
            for p in pos_by_doc[0][doc]
            if all(p + off in pos_by_doc[off][doc] for off in range(1, len(terms)))
        )
        if ptf:
            dl = idx.doclen[doc]
            out[doc] = (boost * idf) * ((K1 + 1.0) * ptf) / (
                K1 * ((1.0 - B) + (B * dl) / idx.avg_dl) + ptf
            )
    return out


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expansion_terms(idx, node: Node) -> list[str]:
    """Independent dictionary expansion for multiterm leaves (mirrors the
    documented engine semantics: Wildcard * -> any run / ? -> one char;
    Range lexicographic with include flags; Fuzzy plain Levenshtein)."""
    import re

    terms = sorted(idx.postings)
    if isinstance(node, Wildcard):
        rx = re.compile(
            "".join(
                ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                for ch in node.pattern
            )
        )
        return [t for t in terms if rx.fullmatch(t)]
    if isinstance(node, Range):
        out = []
        for t in terms:
            if node.min_term is not None:
                if t < node.min_term or (t == node.min_term and not node.include_min):
                    continue
            if node.max_term is not None:
                if t > node.max_term or (t == node.max_term and not node.include_max):
                    continue
            out.append(t)
        return out
    if isinstance(node, Fuzzy):
        return [t for t in terms if _levenshtein(t, node.term) <= node.distance]
    raise TypeError(node)


def _oracle_eval(idx, node: Node, boost: float = 1.0) -> dict[int, float]:
    """Mirrors SearchEngine._eval's scoring semantics on plain dicts."""
    from iresearch_spark.search.query import All, Empty

    if isinstance(node, Empty):
        return {}
    if isinstance(node, All):
        return {d: boost * node.boost for d in _universe(idx)}
    if isinstance(node, Term):
        return _score_term(idx, node.term, boost * node.boost)
    if isinstance(node, Prefix):
        # multiterm leaf: every matching dictionary term scored, kSum per
        # doc (flat disjunction; scored_terms_limit kept above expansion
        # size in this test, so no zero-score tail)
        out: dict[int, float] = {}
        for t in idx.postings:
            if t.startswith(node.prefix):
                for d, s in _score_term(idx, t, boost * node.boost).items():
                    out[d] = out.get(d, 0.0) + s
        return out
    if isinstance(node, Phrase):
        return _score_phrase(idx, list(node.terms), boost * node.boost)
    if isinstance(node, (Wildcard, Range, Fuzzy)):
        # multiterm leaves expand to every matching dictionary term, each
        # scored at the leaf boost, kSum per doc (limits kept above
        # expansion size in this test, so no zero-score tail)
        out: dict[int, float] = {}
        for t in _expansion_terms(idx, node):
            for d, s in _score_term(idx, t, boost * node.boost).items():
                out[d] = out.get(d, 0.0) + s
        return out
    if isinstance(node, Not):
        child = _oracle_eval(idx, node.child, boost)
        b = boost * node.boost
        return {d: b for d in _universe(idx) - set(child)}
    if isinstance(node, And) and any(isinstance(c, Not) for c in node.children):
        poss = tuple(c for c in node.children if not isinstance(c, Not))
        negs = [c for c in node.children if isinstance(c, Not)]
        if poss:
            out = dict(
                _oracle_eval(
                    idx, And(poss, boost=node.boost, merge=node.merge), boost
                )
            )
        else:
            out = {d: boost * node.boost for d in _universe(idx)}
        for neg in negs:
            for d in set(_oracle_eval(idx, neg.child, 1.0)):
                out.pop(d, None)
        return out
    if isinstance(node, (And, Or)):
        legs = [_oracle_eval(idx, c, boost * node.boost) for c in node.children]
        merged: dict[int, list[float]] = {}
        for leg in legs:
            for d, s in leg.items():
                merged.setdefault(d, []).append(s)
        need = len(node.children) if isinstance(node, And) else node.min_match
        mfn = {"sum": sum, "max": max, "min": min}[node.merge]
        return {d: mfn(ss) for d, ss in merged.items() if len(ss) >= need}
    raise TypeError(node)


def _oracle_topk(idx, node: Node, k: int) -> list[tuple[int, float]]:
    scores = _oracle_eval(idx, normalize(node))
    rows = [
        (d, math.floor(s * 1e6 + 0.5) / 1e6) for d, s in scores.items()
    ]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def _random_tree(
    rng: random.Random,
    vocab: list[str],
    depth: int,
    bigrams: list[tuple[str, str]] = (),
    prefixes: list[str] = (),
) -> Node:
    if depth == 0 or rng.random() < 0.35:
        r = rng.random()
        if bigrams and r < 0.12:
            return Phrase(tuple(rng.choice(bigrams)), boost=rng.choice((1.0, 2.0)))
        if prefixes and r < 0.24:
            return Prefix(
                rng.choice(prefixes),
                scored_terms_limit=100_000,  # above expansion size: no tail
                boost=rng.choice((1.0, 0.5)),
            )
        real = [t for t in vocab if len(t) >= 3 and not t.startswith("zzz")] or vocab
        if r < 0.36:  # wildcard built from a real term -> non-empty expansion
            t = rng.choice(real)
            pat = rng.choice(
                (t[0] + "*", t[0] + "*" + t[-1], t[:2] + "?" + t[3:] if len(t) > 3 else t[0] + "*")
            )
            return Wildcard(pat, scored_terms_limit=100_000, boost=rng.choice((1.0, 2.0)))
        if r < 0.48:
            lo, hi = sorted(rng.sample(real, 2))
            return Range(
                min_term=lo,
                max_term=hi,
                include_min=rng.random() < 0.5,
                include_max=rng.random() < 0.5,
                scored_terms_limit=100_000,
                boost=rng.choice((1.0, 0.5)),
            )
        if r < 0.6:
            return Fuzzy(
                rng.choice(real),
                distance=rng.choice((1, 2)),
                max_terms=100_000,
                boost=rng.choice((1.0, 2.0)),
            )
        return Term(rng.choice(vocab), boost=rng.choice((1.0, 0.5, 2.0)))
    kind = rng.random()
    n_kids = rng.randint(2, 4)
    kids = tuple(
        _random_tree(rng, vocab, depth - 1, bigrams, prefixes)
        for _ in range(n_kids)
    )
    if kind < 0.45:
        return Or(
            kids,
            min_match=rng.randint(1, n_kids),
            merge=rng.choice(("sum", "max", "min")),
            boost=rng.choice((1.0, 2.0)),
        )
    if kind < 0.85:
        # at most one Not leg, and keep at least one positive leg
        if rng.random() < 0.4:
            kids = kids[:-1] + (Not(child=kids[-1]),)
        return And(kids, boost=rng.choice((1.0, 0.5)))
    return Not(child=kids[0], boost=1.0)


def test_random_boolean_trees_match_oracle(rt):
    eng, idx = rt
    # vocabulary mix: common terms, rare terms, and one absent term
    by_df = sorted(idx.postings, key=lambda t: -idx.doc_freq(t))
    vocab = by_df[:5] + by_df[len(by_df) // 2 : len(by_df) // 2 + 5] + [
        "zzz_absent_term"
    ]
    # adjacent bigrams among the 30 most common terms (real phrase hits)
    top30 = set(by_df[:30])
    pos_map: dict[tuple[int, int], str] = {}
    for t in top30:
        for d, _tf, ps in idx.postings[t]:
            for pp in ps:
                pos_map[(d, pp)] = t
    bigrams = sorted(
        {
            (t, pos_map[(d, pp + 1)])
            for (d, pp), t in pos_map.items()
            if (d, pp + 1) in pos_map
        }
    )[:15]
    prefixes = sorted({t[:2] for t in by_df[:10]})[:6]
    assert bigrams and prefixes
    rng = random.Random(4242)
    checked = 0
    for _ in range(30):
        tree = _random_tree(rng, vocab, depth=3, bigrams=bigrams, prefixes=prefixes)
        exp = _oracle_topk(idx, tree, 15)
        got = [
            (r["gdoc"], r["score"])
            for r in eng.topk(tree, 15).collect()
        ]
        got = [(d, math.floor(s * 1e6 + 0.5) / 1e6) for d, s in got]
        assert got == exp, f"tree={tree}"
        if exp:
            checked += 1
    assert checked >= 15  # the generator must produce mostly non-empty queries


def test_random_trees_multiterm_leaves_match_oracle(rt):
    """Second seeded pass biased toward the expansion leaf family
    (Wildcard/Range/Fuzzy alongside Term/Prefix/Phrase) so every
    multiterm leaf kind is exercised INSIDE arbitrary And/Or/Not
    min_match/merge contexts, not just standalone at the top level."""
    eng, idx = rt
    by_df = sorted(idx.postings, key=lambda t: -idx.doc_freq(t))
    vocab = by_df[:8] + by_df[len(by_df) // 2 : len(by_df) // 2 + 4]
    rng = random.Random(77)
    kinds: set[type] = set()
    checked = 0
    for _ in range(25):
        tree = _random_tree(rng, vocab, depth=2)
        kinds |= _leaf_kinds(tree)
        exp = _oracle_topk(idx, tree, 15)
        got = [(r["gdoc"], r["score"]) for r in eng.topk(tree, 15).collect()]
        got = [(d, math.floor(s * 1e6 + 0.5) / 1e6) for d, s in got]
        assert got == exp, f"tree={tree}"
        if exp:
            checked += 1
    assert checked >= 12
    assert {Wildcard, Range, Fuzzy} <= kinds


def _leaf_kinds(node: Node) -> set[type]:
    if isinstance(node, (And, Or)):
        return set().union(*(_leaf_kinds(c) for c in node.children))
    if isinstance(node, Not):
        return _leaf_kinds(node.child)
    return {type(node)}


def test_random_tree_generator_covers_leaf_kinds():
    """The seed actually exercises every leaf kind (otherwise the main
    property test silently narrows to Term-only trees)."""
    rng = random.Random(4242)
    kinds: set[type] = set()
    for _ in range(30):
        kinds |= _leaf_kinds(
            _random_tree(
                rng, ["a", "b"], depth=3, bigrams=[("x", "y")], prefixes=["p"]
            )
        )
    assert {Term, Phrase, Prefix} <= kinds

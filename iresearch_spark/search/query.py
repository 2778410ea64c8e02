"""Filter tree (logical query IR) + normalization rewrites.

Mirrors the reference's filter class family (SURVEY.md §2.C;
core/search/filter.hpp:38-99 prepare/execute split) as plain dataclasses.
`normalize()` applies the same logical rewrites the reference runs at
prepare time (core/search/boolean_filter.cpp:35-335):

- double-negation elimination:            Not(Not(x)) -> x
- empty propagation:                      And(..Empty..) -> Empty;
                                          Or drops Empty legs
- single-child unwrap:                    And(x) -> x; Or(x) -> x
- match-all elision with boost folding:   And legs that are All are dropped,
                                          their boost folded into the node's
                                          const_boost (constant score addend)
- lone Not -> All AND NOT x               (boolean_filter.cpp:83-87)
- min_match specialization:               m > n -> Empty; m == n -> And;
                                          m <= 1 -> plain Or
                                          (boolean_filter.cpp:288-308)

Scoring semantics: every matched scoring leaf contributes a float32 score;
boolean nodes merge with kSum (reference ScoreMergeType::kSum,
core/search/scorer.hpp:224-236). Exclusion legs never contribute score
(exclusion.hpp:33).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


class Node:
    boost: float = 1.0


@dataclass(frozen=True)
class Term(Node):
    """Exact term match (core/search/term_filter.cpp:87-131)."""

    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class Terms(Node):
    """Set-of-terms with min_match, optional PER-TERM boosts and a score
    merge type (reference by_terms_options: search_term{term, boost} +
    merge_type, core/search/terms_filter.hpp:36-64). `boosts` aligns
    positionally with `terms`; merge is kSum/kMax/kMin."""

    terms: tuple[str, ...]
    min_match: int = 1
    boost: float = 1.0
    boosts: tuple[float, ...] | None = None
    merge: str = "sum"


@dataclass(frozen=True)
class Prefix(Node):
    """Prefix multiterm (core/search/prefix_filter.cpp; scored_terms_limit
    default 1024 per prefix_filter.hpp:55). Expansion: the top
    `scored_terms_limit` matching terms by (doc_freq desc, term asc) are
    scored individually and OR-merged, matching the reference's
    top_terms_collector keep-best behavior."""

    prefix: str
    scored_terms_limit: int = 1024
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard(Node):
    """`%`/`_` pattern (core/search/wildcard_filter.cpp:98-136); `*`/`?` are
    translated like the reference bench driver does (utils/index-search.cpp)."""

    pattern: str
    scored_terms_limit: int = 1024
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy(Node):
    """Levenshtein <= distance (core/search/levenshtein_filter.cpp);
    max_terms=50 mirrors the bench default (utils/index-search.cpp:413).
    transpositions=True uses Damerau-Levenshtein (the reference's
    with_transpositions parametric automata, levenshtein_utils.cpp)."""

    term: str
    distance: int = 1
    max_terms: int = 50
    boost: float = 1.0
    transpositions: bool = False


@dataclass(frozen=True)
class Range(Node):
    """Term byte-range (core/search/range_filter.cpp)."""

    min_term: str | None = None
    max_term: str | None = None
    include_min: bool = True
    include_max: bool = True
    scored_terms_limit: int = 1024
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase(Node):
    """Ordered positional phrase (core/search/phrase_filter.cpp,
    phrase_iterator.hpp FixedPhraseFrequency). Score: BM25 over the phrase
    frequency with idf = sum of member-term idfs (Lucene-style; pinned in
    tests/oracle.py). `offsets` gives each part's explicit position offset
    from the phrase start (reference by_phrase push_back offs — gaps like
    "a ? b" are offsets (0, 2)); default adjacency 0,1,2,..."""

    terms: tuple[str, ...]
    boost: float = 1.0
    offsets: tuple[int, ...] | None = None


@dataclass(frozen=True)
class VarPhrase(Node):
    """Variadic positional phrase: each slot is a term-set-producing leaf
    (Term / Terms / Prefix / Wildcard / Fuzzy / Range) and position i must
    hold ANY of slot i's expanded terms (reference variadic by_phrase,
    core/search/phrase_filter.cpp:204-427 per-position VariadicPhrase
    states). Scored like the fixed phrase: BM25 over the phrase frequency,
    idf = sum of all matched (slot, term) idfs."""

    slots: tuple[Node, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class SamePosition(Node):
    """Terms co-occurring at the SAME position (core/search/
    same_position_filter.cpp:193). With a single-token-per-position
    analyzer this is satisfiable only for identical terms; the operator is
    exposed for parity and for analyzers that emit position-overlapping
    tokens (increment 0). Scored like a phrase with all offsets = 0."""

    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class Proxy(Node):
    """Cached-filter wrapper (core/search/proxy_filter.cpp): the wrapped
    filter's hit set is computed once per engine and reused by every later
    execution of an equal Proxy node — the reference caches a per-segment
    bitset; here the scored hit DataFrame is persisted in the engine's
    proxy cache, keyed by the normalized child. Boost applies at reuse
    time (cached scores are scaled, not recomputed)."""

    child: Node = None  # type: ignore[assignment]
    boost: float = 1.0


@dataclass(frozen=True)
class All(Node):
    """Match-all with constant score = boost (core/search/all_filter.cpp)."""

    boost: float = 1.0


@dataclass(frozen=True)
class Empty(Node):
    boost: float = 1.0


@dataclass(frozen=True)
class Not(Node):
    child: Node = None  # type: ignore[assignment]
    boost: float = 1.0


@dataclass(frozen=True)
class And(Node):
    """Conjunction. `merge` = leg score combination: kSum (default) /
    kMax / kMin (reference ScoreMergeType, core/search/scorer.hpp:224-236;
    kNoop = constant-score, expressed as boost-only legs)."""

    children: tuple[Node, ...] = ()
    boost: float = 1.0
    const_boost: float = 0.0  # folded All-leg boosts (score addend)
    merge: str = "sum"  # sum | max | min


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = ()
    min_match: int = 1
    boost: float = 1.0
    merge: str = "sum"  # sum | max | min


def normalize(node: Node) -> Node:
    """Apply the rewrite rules bottom-up until fixpoint-free output."""
    if isinstance(node, Proxy):
        child = normalize(node.child)
        if isinstance(child, Empty):
            return Empty()
        return Proxy(child=child, boost=node.boost)

    if isinstance(node, Not):
        child = normalize(node.child)
        if isinstance(child, Not):  # double negation
            return normalize(child.child)
        if isinstance(child, Empty):  # NOT nothing = everything
            return All(boost=node.boost)
        return Not(child=child, boost=node.boost)

    if isinstance(node, And):
        kids = [normalize(c) for c in node.children]
        if any(isinstance(c, Empty) for c in kids):
            return Empty()
        const_boost = node.const_boost
        scored = []
        for c in kids:
            if isinstance(c, All):
                const_boost += c.boost  # All elision + boost fold
            else:
                scored.append(c)
        if not scored:
            return All(boost=node.boost * (const_boost if const_boost else 1.0))
        if len(scored) == 1 and const_boost == 0.0:
            return _boosted(scored[0], node.boost)
        return And(
            children=tuple(scored),
            boost=node.boost,
            const_boost=const_boost,
            merge=node.merge,
        )

    if isinstance(node, Or):
        kids = [normalize(c) for c in node.children if not isinstance(normalize(c), Empty)]
        m = node.min_match
        if m > len(kids) or not kids:
            return Empty()
        if len(kids) == 1:
            return _boosted(kids[0], node.boost)
        if m == len(kids) and not any(isinstance(c, Not) for c in kids):
            # all-legs-required Or == And — but ONLY without Not legs: an
            # Or's Not leg is a SCORING universe-complement leg (counts
            # toward min_match, contributes its boost), while And's Not
            # legs are pure exclusions; rewriting across that boundary
            # silently changed both the score and the merge semantics
            # (caught by test_random_trees_multiterm_leaves_match_oracle)
            return normalize(And(children=tuple(kids), boost=node.boost, merge=node.merge))
        return Or(children=tuple(kids), min_match=max(1, m), boost=node.boost, merge=node.merge)

    if isinstance(node, Terms):
        if not node.terms:
            return Empty()
        if node.min_match > len(node.terms):
            return Empty()
        return node

    return node


def _boosted(node: Node, extra: float) -> Node:
    if extra == 1.0:
        return node
    return replace(node, boost=node.boost * extra)


def wildcard_to_like(pattern: str) -> str:
    """Reference bench translation `*`->`%`, `?`->`_`
    (utils/index-search.cpp wildcard task parsing)."""
    return pattern.replace("*", "%").replace("?", "_")

"""Independent pure-Python/NumPy reference implementation ("fixture oracle").

Plays the role of the reference's golden test fixtures (bm25_test.cpp
expected rankings, assert_index expected postings — SURVEY.md §5.1): a
completely separate implementation of analyzer -> postings -> BM25 top-k
that the Spark engine must match exactly (rank- and float32-score-identical).

Pinned semantics shared with the engine (and asserted by tests):
- tokens: lowercase, split on DEFAULT_DELIM_REGEX, drop empties; positions
  indexed over the pre-stopword sequence (stopwords leave gaps)
- dl = count of post-stopword tokens
- BM25: float32, factored c0 - c0*c1/(c1+tf) evaluation
- leg merge: float32 leg scores summed in float64, cast back to float32
- top-k: score desc, docID asc
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np

F32 = np.float32

DELIM = re.compile(r"[^a-z0-9_]+")


def tokenize(text: str, stopwords: frozenset[str] = frozenset()) -> list[tuple[int, str]]:
    """-> [(pos, term)] with stopword gaps."""
    raw = [t for t in DELIM.split(text.lower()) if t]
    return [(i, t) for i, t in enumerate(raw) if t not in stopwords]


@dataclass
class OracleIndex:
    postings: dict[str, list[tuple[int, int, list[int]]]] = field(default_factory=dict)
    # term -> [(doc_id, tf, positions)], doc ascending
    doclen: dict[int, int] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.doclen)

    @property
    def avg_dl(self) -> float:
        return sum(self.doclen.values()) / len(self.doclen) if self.doclen else 0.0

    def doc_freq(self, term: str) -> int:
        return len(self.postings.get(term, []))

    def total_tf(self, term: str) -> int:
        return sum(tf for _, tf, _ in self.postings.get(term, []))


def build_index(docs: list[tuple[int, str]], stopwords: frozenset[str] = frozenset()) -> OracleIndex:
    """docs: [(doc_id, text)]; doc_ids must be unique."""
    idx = OracleIndex()
    acc: dict[str, dict[int, list[int]]] = defaultdict(dict)
    for doc_id, text in docs:
        toks = tokenize(text, stopwords)
        idx.doclen[doc_id] = len(toks)
        for pos, term in toks:
            acc[term].setdefault(doc_id, []).append(pos)
    for term, dmap in acc.items():
        idx.postings[term] = [
            (d, len(ps), ps) for d, ps in sorted(dmap.items())
        ]
    return idx


# ---------------------------------------------------------------------------
# BM25 (float32 factored form) — mirrors search/scorers.py independently
# ---------------------------------------------------------------------------

def bm25_idf(n_docs: int, doc_freq: int) -> np.float32:
    return F32(math.log1p((n_docs - doc_freq + 0.5) / (doc_freq + 0.5)))


def bm25_score(tf: int, dl: int, idf: np.float32, avg_dl: float, k: float = 1.2, b: float = 0.75, boost: float = 1.0) -> np.float32:
    c0 = F32(boost) * F32(k + 1) * F32(idf)
    if k == 0.0:
        return F32(c0)
    c1 = F32(k) * F32(1.0 - b) + (F32(k) * F32(b) / F32(avg_dl)) * F32(dl)
    return F32(c0 - c0 * c1 / (c1 + F32(tf)))


def tfidf_idf(n_docs: int, doc_freq: int) -> np.float32:
    return F32(math.log1p((n_docs + 1.0) / (doc_freq + 1.0)))


def tfidf_score(tf: int, dl: int, idf: np.float32, with_norms: bool = False, boost: float = 1.0) -> np.float32:
    s = F32(boost) * F32(idf) * F32(np.sqrt(F32(tf)))
    if with_norms:
        s = F32(s / np.sqrt(F32(dl)))
    return F32(s)


# ---------------------------------------------------------------------------
# Query evaluation
# ---------------------------------------------------------------------------

def score_term(idx: OracleIndex, term: str, boost: float = 1.0, k: float = 1.2, b: float = 0.75) -> dict[int, np.float32]:
    out: dict[int, np.float32] = {}
    plist = idx.postings.get(term, [])
    if not plist:
        return out
    idf = bm25_idf(idx.n_docs, len(plist))
    for doc, tf, _ in plist:
        out[doc] = bm25_score(tf, idx.doclen[doc], idf, idx.avg_dl, k, b, boost)
    return out


def merge_sum(legs: list[dict[int, np.float32]], min_match: int = 1) -> dict[int, np.float32]:
    """kSum merge: float32 legs summed in float64, cast to float32."""
    cnt: Counter = Counter()
    acc: dict[int, float] = defaultdict(float)
    for leg in legs:
        for d, s in leg.items():
            cnt[d] += 1
            acc[d] += float(s)
    return {d: F32(acc[d]) for d in acc if cnt[d] >= min_match}


def score_and(idx: OracleIndex, terms: list[str], boost: float = 1.0) -> dict[int, np.float32]:
    legs = [score_term(idx, t, boost) for t in terms]
    return merge_sum(legs, min_match=len(terms))


def score_or(idx: OracleIndex, terms: list[str], min_match: int = 1, boost: float = 1.0) -> dict[int, np.float32]:
    legs = [score_term(idx, t, boost) for t in terms]
    return merge_sum(legs, min_match=min_match)


def score_phrase(idx: OracleIndex, terms: list[str], boost: float = 1.0, k: float = 1.2, b: float = 0.75) -> dict[int, np.float32]:
    """BM25 over phrase frequency; idf = float32 sum of member idfs."""
    if any(t not in idx.postings for t in terms):
        return {}
    idf = F32(sum(F32(bm25_idf(idx.n_docs, idx.doc_freq(t))) for t in terms))
    pos_by_doc: list[dict[int, set[int]]] = [
        {d: set(ps) for d, _, ps in idx.postings[t]} for t in terms
    ]
    out: dict[int, np.float32] = {}
    for doc in pos_by_doc[0]:
        if not all(doc in m for m in pos_by_doc[1:]):
            continue
        ptf = sum(
            1
            for p in pos_by_doc[0][doc]
            if all(p + off in pos_by_doc[off][doc] for off in range(1, len(terms)))
        )
        if ptf:
            out[doc] = bm25_score(ptf, idx.doclen[doc], idf, idx.avg_dl, k, b, boost)
    return out


def topk(scores: dict[int, np.float32], k: int) -> list[tuple[int, float]]:
    """score desc, doc asc."""
    return sorted(scores.items(), key=lambda it: (-float(it[1]), it[0]))[:k]


def score_varphrase(idx: OracleIndex, slots: list[list[str]], boost: float = 1.0,
                    k: float = 1.2, b: float = 0.75) -> dict[int, np.float32]:
    """Variadic phrase: slot j matches any of its terms at position p+j.
    idf = float32 sum of every matched (slot, term) idf."""
    slots = [[t for t in ts if t in idx.postings] for ts in slots]
    if any(not ts for ts in slots):
        return {}
    idf = F32(sum(F32(bm25_idf(idx.n_docs, idx.doc_freq(t))) for ts in slots for t in ts))
    # per slot: doc -> set of positions (union over slot terms)
    slot_pos: list[dict[int, set[int]]] = []
    for ts in slots:
        m: dict[int, set[int]] = {}
        for t in ts:
            for d, _, ps in idx.postings[t]:
                m.setdefault(d, set()).update(ps)
        slot_pos.append(m)
    out: dict[int, np.float32] = {}
    for doc in slot_pos[0]:
        if not all(doc in m for m in slot_pos[1:]):
            continue
        ptf = sum(
            1
            for p in slot_pos[0][doc]
            if all(p + j in slot_pos[j][doc] for j in range(1, len(slots)))
        )
        if ptf:
            out[doc] = bm25_score(ptf, idx.doclen[doc], idf, idx.avg_dl, k, b, boost)
    return out

"""by_ngram_similarity with the reference's longest-sequence scoring.

Reference (core/search/ngram_similarity_query.cpp, 624 LoC): a document
matches when the longest ordered sequence of the query's n-grams found in
the document (query indices strictly increasing, document positions
strictly increasing — LCS-style, gaps allowed on both sides) reaches
min_match = ceil(threshold * total_ngrams); its score contribution is
filter_boost = longest_sequence_len / total_ngrams
(ngram_similarity_query.cpp:444-445). This module pins exactly that
subsequence semantics and score. `ngram_match_topk` is the pinned
matched-fraction variant (score = matched distinct query grams / total).

Plan shape (r3, zero-shuffle gram stream): the adjacent-bigram stream is
built INSIDE each doc row with array zip-with-next expressions (the r2
token self-join shuffled the full token stream twice for the same result);
per-doc matches therefore never leave their row, so the matched-fraction
variant is pure Catalyst with NO exchange at all, and the longest-sequence
DP consumes the match arrays via one mapInPandas with NO exchange either.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from iresearch_spark.analysis.analyzers import DEFAULT_DELIM_REGEX, DEFAULT_STOPWORDS


def _match_array(
    text_col: str,
    grams: list[str],
    stopwords: tuple[str, ...],
) -> Column:
    """array<struct(pos, bg)> of query-gram matches, positions over the
    stopword-gapped token sequence, pos-ascending — computed entirely
    within the row (zip-with-next; no token explode, no self-join).
    A bigram exists at position i iff tokens i and i+1 are both non-stop
    (position gaps break grams, matching the tok-CTE oracle semantics)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), DEFAULT_DELIM_REGEX), lambda t: t != F.lit("")
    )
    nt = F.size(toks)

    def pair(i):
        x = F.element_at(toks, i + 1)
        y = F.element_at(toks, i + 2)
        return F.struct(
            i.cast("long").alias("pos"),
            F.concat(x, F.lit(" "), y).alias("bg"),
            (~x.isin(*stopwords) & ~y.isin(*stopwords)).alias("ok"),
        )

    pairs = F.when(
        nt >= 2, F.transform(F.sequence(F.lit(0), nt - 2), pair)
    ).otherwise(F.array().cast("array<struct<pos:long,bg:string,ok:boolean>>"))
    return F.filter(pairs, lambda s: s["ok"] & s["bg"].isin(*set(grams)))


def ngram_match_topk(
    docs: DataFrame,
    query_terms: list[str],
    n: int = 2,
    threshold: float = 0.5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Matched-fraction by_ngram_similarity (the pinned subset of
    ngram_similarity_filter.hpp:36-59): docs containing >= threshold
    fraction of the query's DISTINCT token n-grams; score = matched /
    total, ordered (matched desc, doc_id asc) limit k.

    Pure Catalyst, zero shuffle before the final top-k: grams and the
    distinct-match count are array expressions inside the doc row."""
    grams = [" ".join(query_terms[i : i + n]) for i in range(len(query_terms) - n + 1)]
    # DISTINCT query grams on both sides of the ratio: `matched` counts
    # distinct grams, so a query with repeated n-grams must not inflate the
    # denominator (it could otherwise never reach score 1.0)
    total = len(set(grams))
    ms = _match_array(text_col, grams, stopwords)
    matched = F.size(F.array_distinct(F.transform(ms, lambda s: s["bg"])))
    out = docs.select(
        F.col(id_col).alias("doc_id"), matched.cast("long").alias("matched")
    ).where(F.col("matched") / F.lit(float(total)) >= threshold)
    return (
        out.select(
            "doc_id",
            F.expr(
                f"CAST(floor((matched * 1e0 / {total}) * 1000000e0 + 0.5e0) / 1000000e0 AS DOUBLE)"
            ).alias("score"),
            "matched",
        )
        .orderBy(F.desc("matched"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )


def _lcs_kernel(gram_index: dict[str, list[int]], n_grams: int):
    """mapInPandas: (doc_id, ms array<struct(pos, bg, ok)>) -> (doc_id,
    longest). Per-doc DP over the pos-ascending match array."""

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["doc_id"].to_numpy()
            out = []
            for arr in pdf["ms"]:
                best = [0] * n_grams
                # arr pos-ascending (array order = token order)
                for m in arr:
                    for gi in gram_index.get(m["bg"], ()):
                        prefix = max(best[:gi], default=0)
                        cand = prefix + 1
                        if cand > best[gi]:
                            best[gi] = cand
                out.append(max(best))
            yield pd.DataFrame({"doc_id": ids, "longest": out})

    return fn


def ngram_similarity_topk(
    docs: DataFrame,
    query_terms: list[str],
    n: int = 2,
    threshold: float = 0.5,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """-> (doc_id, longest, score) for docs whose longest ordered query-gram
    sequence reaches ceil(threshold * n_grams); score = longest / n_grams,
    ordered (score desc, doc_id asc) limit k."""
    grams = [" ".join(query_terms[i : i + n]) for i in range(len(query_terms) - n + 1)]
    n_grams = len(grams)
    gram_index: dict[str, list[int]] = {}
    for gi, g in enumerate(grams):
        gram_index.setdefault(g, []).append(gi)
    import math

    min_match = max(1, math.ceil(threshold * n_grams))

    ms = _match_array(text_col, grams, stopwords)
    per_doc = docs.select(F.col(id_col).alias("doc_id"), ms.alias("ms")).where(
        F.size("ms") > 0
    )
    scored = per_doc.mapInPandas(
        _lcs_kernel(gram_index, n_grams),
        StructType(
            [StructField("doc_id", LongType()), StructField("longest", LongType())]
        ),
    ).where(F.col("longest") >= min_match)
    return (
        scored.select(
            "doc_id",
            F.col("longest").cast("long").alias("longest"),
            F.expr(
                f"CAST(floor((CAST(longest AS DOUBLE) / {float(n_grams)!r}) * 1000000e0 + 0.5e0) / 1000000e0 AS DOUBLE)"
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )

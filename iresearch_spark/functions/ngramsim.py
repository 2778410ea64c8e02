"""by_ngram_similarity with the reference's longest-sequence scoring.

Reference (core/search/ngram_similarity_query.cpp, 624 LoC): a document
matches when the longest ordered sequence of the query's n-grams found in
the document (query indices strictly increasing, document positions
strictly increasing — LCS-style, gaps allowed on both sides) reaches
min_match = ceil(threshold * total_ngrams); its score contribution is
filter_boost = longest_sequence_len / total_ngrams
(ngram_similarity_query.cpp:444-445). This module pins exactly that
subsequence semantics and score.

Plan shape: tokenize -> adjacent-bigram stream -> keep only positions
matching a query gram (a tiny IN filter, pushed to the gram build) ->
groupBy(doc) collects the (pos, gram_idx) matches (bounded by #occurrences
of query grams in the doc, NOT doc length) -> vectorized DP kernel computes
the longest chain per doc in O(matches x n_grams).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from iresearch_spark.analysis.analyzers import DEFAULT_DELIM_REGEX, DEFAULT_STOPWORDS


def _lcs_udf(gram_index: dict[str, list[int]], n_grams: int):
    """pandas UDF: sorted array<struct(pos, bg)> -> longest chain length."""

    @pandas_udf(IntegerType())
    def longest_chain(matches: pd.Series) -> pd.Series:
        out = []
        for arr in matches:
            best = [0] * n_grams
            # arr sorted by pos ascending (sort_array on struct(pos, bg))
            for m in arr:
                for gi in gram_index.get(m["bg"], ()):
                    prefix = max(best[:gi], default=0)
                    cand = prefix + 1
                    if cand > best[gi]:
                        best[gi] = cand
            out.append(max(best))
        return pd.Series(out)

    return longest_chain


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

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), DEFAULT_DELIM_REGEX), lambda t: t != F.lit("")
    )
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    ).where(~F.col("term").isin(*stopwords))
    a, b = tok.alias("a"), tok.alias("b")
    big = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.pos").alias("pos"),
        F.concat_ws(" ", "a.term", "b.term").alias("bg"),
    )
    matches = big.where(F.col("bg").isin(*set(grams)))
    per_doc = matches.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "bg"))).alias("ms")
    )
    lcs = _lcs_udf(gram_index, n_grams)
    scored = per_doc.select(
        "doc_id", lcs("ms").alias("longest")
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

"""Text analysis operators: quality scoring, language ID, fingerprinting.

All pure Catalyst expressions over the analyzer's token arrays — these are
the scan-side scalar stages a training-data pipeline fuses into its first
pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iresearch_spark.analysis.analyzers import DEFAULT_STOPWORDS

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "was", "that"),
    "code": ("def", "return", "import", "class", "static", "void", "const", "function"),
    "data": ("table", "join", "query", "column", "row", "select"),
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9_]+"), lambda t: t != F.lit(""))


def quality_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features: token counts, stopword ratio, mean token
    length, alnum ratio, and a composite [0,1] quality score (longer
    non-degenerate text with normal word stats scores higher)."""
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*DEFAULT_STOPWORDS)))
    n_uniq = F.size(F.array_distinct(toks))
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    alnum_ratio = F.when(
        F.length(text_col) > 0, alnum.cast("double") / F.length(text_col)
    ).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n_tok > 0, n_uniq.cast("double") / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    # composite heuristic: word-length plausibility x lexical diversity x
    # alnum density, damped for very short docs
    quality = (
        F.least(n_tok.cast("double") / 20.0, F.lit(1.0))
        * F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
        * F.least(uniq_ratio * 2.0, F.lit(1.0))
        * alnum_ratio
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Marker-token language ID: argmax of per-language marker hits
    (an n-gram-profile classifier's degenerate, fully-columnar form)."""
    markers = markers or LANG_MARKERS
    toks = _tokens(F.col(text_col))
    def marker_pred(ms: tuple[str, ...]):
        # closure factory (PySpark higher-order lambdas dispatch on arity)
        return lambda t: t.isin(*ms)

    hit_cols = {
        lang: F.size(F.filter(toks, marker_pred(tuple(ms))))
        for lang, ms in markers.items()
    }
    langs = list(markers)
    best = F.lit(langs[0])
    best_hits = hit_cols[langs[0]]
    for lang in langs[1:]:
        cond = hit_cols[lang] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hit_cols[lang]).otherwise(best_hits)
    sel = [F.col(id_col).alias("doc_id")]
    sel += [hit_cols[lang].alias(f"hits_{lang}") for lang in langs]
    sel += [best.alias("pred_lang"), best_hits.alias("pred_hits")]
    return df.select(*sel)


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", mod: int = (1 << 31) - 1
) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint of the token sequence:
    fp = fold(fp * 31 + xxhash64(token) mod m) — equal iff token sequences
    equal (mod collisions). Content-defined identity for dedup/lineage."""
    toks = _tokens(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 31 + F.pmod(F.xxhash64(t), F.lit(mod)), F.lit(mod)),
    )
    return df.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))

"""Text analysis operators: quality scoring, language ID, token counting,
fingerprinting.

All pure Catalyst expressions over the analyzer's token arrays — these are
the scan-side scalar stages a training-data pipeline fuses into its first
pass over the corpus. Each has a DuckDB oracle twin in plans/parity.py and
a driver-gate entry that runs THIS implementation (not a SQL
re-formulation); shared rounding is the dialect-stable floor(x*1e6+0.5)/1e6
(plain round() disagrees between engines at representation boundaries).
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

POLY_MOD = 1_000_000_007


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9_]+"), lambda t: t != F.lit(""))


def _round6(col: Column) -> Column:
    return (F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).cast("double")


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
        n_tok.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_unique"),
        _round6(stop_ratio).alias("stopword_ratio"),
        _round6(mean_len).alias("mean_token_len"),
        _round6(alnum_ratio).alias("alnum_ratio"),
        _round6(quality).alias("quality"),
    )


def token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Token counting: raw tokens, post-stopword tokens, stopword count and
    ratio — the whitespace/regex token-count op of a data pipeline."""
    toks = _tokens(F.col(text_col))
    n_raw = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_raw.cast("long").alias("n_tokens_raw"),
        (n_raw - n_stop).cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        _round6(
            F.when(n_raw > 0, n_stop.cast("double") / n_raw).otherwise(F.lit(0.0))
        ).alias("stopword_ratio"),
    ).where(F.col("n_tokens_raw") > 0)


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Marker-token language ID: argmax of per-language marker hits
    (an n-gram-profile classifier's degenerate, fully-columnar form).
    Ties resolve to the EARLIEST language in marker order (sequential
    best-so-far fold, strict > to replace)."""
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
    sel += [hit_cols[lang].cast("long").alias(f"hits_{lang}") for lang in langs]
    sel += [best.alias("pred_lang"), best_hits.cast("long").alias("pred_hits")]
    return df.select(*sel)


def doc_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "weighted_poly",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    mod: int = POLY_MOD,
) -> DataFrame:
    """Order-sensitive document fingerprint.

    method="weighted_poly" (default, SQL-portable, driver-gated): over the
    post-stopword token stream with RAW positions (stopword gaps kept),
    fp = sum((pos+1) * charhash(term)) mod m where charhash folds
    (h*31 + ascii) mod m — equal iff the positioned token sequence is equal
    (mod collisions).

    method="rolling_xxhash": fp = fold(fp*31 + xxhash64(token) mod m) over
    raw tokens — cheaper per token (no char fold), not SQL-oracle-able.
    """
    if method == "rolling_xxhash":
        toks = _tokens(F.col(text_col))
        fp = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: F.pmod(acc * 31 + F.pmod(F.xxhash64(t), F.lit(mod)), F.lit(mod)),
        )
        return df.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
    toks = _tokens(F.col(text_col))
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    ).where(~F.col("term").isin(*stopwords))
    char_hash = F.aggregate(
        F.filter(F.split(F.col("term"), ""), lambda c: c != F.lit("")),
        F.lit(0).cast("long"),
        lambda h, c: F.pmod(h * 31 + F.ascii(c), F.lit(mod)),
    )
    return (
        tok.withColumn("_th", char_hash)
        .groupBy("doc_id")
        .agg(F.pmod(F.sum((F.col("pos") + 1) * F.col("_th")), F.lit(mod)).alias("fingerprint"))
    )

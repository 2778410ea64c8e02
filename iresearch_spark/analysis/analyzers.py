"""Analyzers: text -> token stream, as Catalyst expressions (JVM-side).

Re-expresses the reference's analyzer registry (reference
core/analysis/analyzers.cpp; text pipeline core/analysis/
text_token_stream.cpp:356-421 — tokenize, case-fold, stopword-filter) as
compositions of built-in Spark SQL functions. No per-row Python: tokenization
is `split`/`filter`/`transform` higher-order expressions that stay inside
whole-stage codegen.

Position semantics (parity with reference token_attributes `increment`,
core/analysis/token_attributes.hpp:50-63): a token's *position* is its index
in the analyzer's token sequence BEFORE stop-word removal; removed stopwords
leave gaps (Lucene/IResearch stop-filter increments the position). Document
length (`field_stats.len`, core/index/field_meta.hpp:34-43) counts tokens
actually emitted, i.e. AFTER stop-word removal.

Analyzers are registered by name + config, mirroring the reference's
name+JSON registry (core/analysis/analyzers.cpp REGISTER_ANALYZER_JSON).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Post-lowercase delimiter class for source code: keep [a-z0-9_] runs
# (identifiers), split on everything else. This is the pinned "text"-analyzer
# subset from SURVEY.md §2.A (lowercase + delimiter split + stopword filter).
DEFAULT_DELIM_REGEX = "[^a-z0-9_]+"

# Pinned stopword list: English function words + ubiquitous code keywords.
# The reference takes stopwords from analyzer config (text_token_stream
# options, core/analysis/text_token_stream.hpp:41-79); ours is an explicit
# deterministic default so fixtures are reproducible.
DEFAULT_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
)


class Analyzer:
    """Base analyzer: maps a string Column to an array<string> token Column.

    ``raw_tokens``: full token sequence (defines positions).
    ``keep``:       per-token predicate applied after position assignment
                    (stop-word-style drops that leave position gaps).
    ``tokens``:     the emitted sequence = raw_tokens filtered by keep.
    """

    name = "base"

    def raw_tokens(self, col: Column) -> Column:
        raise NotImplementedError

    def keep(self, term: Column) -> Column:
        return F.lit(True)

    def map_term(self, term: Column) -> Column:
        """Per-token transform applied to the EXPLODED term column AFTER
        the keep() filter (reference text pipeline order: stopword check
        on the original token, stem afterwards —
        text_token_stream.cpp:356-421). Default: identity. May be a pandas
        UDF (it runs on a top-level column, never inside an array lambda)."""
        return term

    def tokens(self, col: Column) -> Column:
        return F.filter(self.raw_tokens(col), lambda t: self.keep(t))


_ARROW_TOKENIZERS: dict = {}


def _arrow_tokenizer(delim_regex: str, lowercase: bool):
    """Arrow-vectorized tokenizer UDF (cached per config).

    Measured 3.4x faster than the JVM `split()` path at 120k docs x 32
    cores: java.util.regex + UTF8String conversion churn loses to Python
    `re` over Arrow batches. This is the "Arrow-vectorized pandas UDF
    analyzer" the north star names."""
    key = (delim_regex, lowercase)
    if key not in _ARROW_TOKENIZERS:
        import re as _re

        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType

        rx = _re.compile(delim_regex)

        @pandas_udf(ArrayType(StringType()))
        def tok(s: pd.Series) -> pd.Series:
            if lowercase:
                s = s.str.lower()
            return s.map(lambda x: [t for t in rx.split(x) if t] if x is not None else None)

        _ARROW_TOKENIZERS[key] = tok
    return _ARROW_TOKENIZERS[key]


_UDF_CACHE: dict = {}


def _stem_udf():
    """Arrow UDF: Porter-stem a string column, memoized per batch (the
    stem of a term repeats constantly in real corpora)."""
    if "stem" not in _UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        from iresearch_spark.analysis.stemmer import porter_stem

        @pandas_udf(StringType())
        def stem_col(s: pd.Series) -> pd.Series:
            cache: dict[str, str] = {}

            def one(t):
                if t is None:
                    return None
                out = cache.get(t)
                if out is None:
                    out = cache[t] = porter_stem(t)
                return out

            return s.map(one)

        _UDF_CACHE["stem"] = stem_col
    return _UDF_CACHE["stem"]


def _stem_array_udf():
    if "stem_arr" not in _UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType

        from iresearch_spark.analysis.stemmer import porter_stem

        @pandas_udf(ArrayType(StringType()))
        def stem_arr(s: pd.Series) -> pd.Series:
            cache: dict[str, str] = {}

            def one(arr):
                if arr is None:
                    return None
                out = []
                for t in arr:
                    r = cache.get(t)
                    if r is None:
                        r = cache[t] = porter_stem(t)
                    out.append(r)
                return out

            return s.map(one)

        _UDF_CACHE["stem_arr"] = stem_arr
    return _UDF_CACHE["stem_arr"]


def _accent_fold_udf():
    """NFKD-decompose + drop combining marks (the `norm`/text analyzer's
    accent-removal option, text_token_normalizing_stream.cpp)."""
    if "accent" not in _UDF_CACHE:
        import unicodedata

        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        @pandas_udf(StringType())
        def fold(s: pd.Series) -> pd.Series:
            def one(t):
                if t is None:
                    return None
                return "".join(
                    c for c in unicodedata.normalize("NFKD", t) if not unicodedata.combining(c)
                )

            return s.map(one)

        _UDF_CACHE["accent"] = fold
    return _UDF_CACHE["accent"]


@dataclass(frozen=True)
class TextAnalyzer(Analyzer):
    """`text` / `segmentation` analyzer subset: lowercase -> regex-delimiter
    split -> stopword filter.

    Reference: core/analysis/text_token_stream.cpp:356-421 (process_term:
    case convert + stopword check), core/analysis/segmentation_token_stream.cpp
    (word-break tokenize). ICU word-break is approximated by the delimiter
    class; for the pinned source-code corpus the two coincide.

    arrow=True (default) tokenizes in an Arrow pandas UDF; arrow=False uses
    the pure-Catalyst split/filter chain (identical tokens — pinned by
    tests — but ~3x slower on the JVM regex path).
    """

    delim_regex: str = DEFAULT_DELIM_REGEX
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
    lowercase: bool = True
    arrow: bool = True
    stem: bool = False  # Porter stemming stage (analysis/stemmer.py)
    accent_fold: bool = False  # NFKD accent strip before tokenizing
    name: str = field(default="text", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        if self.accent_fold:
            col = _accent_fold_udf()(col)
        if self.arrow:
            return _arrow_tokenizer(self.delim_regex, self.lowercase)(col)
        base = F.lower(col) if self.lowercase else col
        return F.filter(F.split(base, self.delim_regex), lambda t: t != F.lit(""))

    def keep(self, term: Column) -> Column:
        if not self.stopwords:
            return F.lit(True)
        return ~term.isin(*self.stopwords)

    def map_term(self, term: Column) -> Column:
        if not self.stem:
            return term
        return _stem_udf()(term)

    def tokens(self, col: Column) -> Column:
        out = F.filter(self.raw_tokens(col), lambda t: self.keep(t))
        if self.stem:
            out = _stem_array_udf()(out)
        return out


_SEG_TOKENIZERS: dict = {}

# Unicode word pattern (UAX#29 approximation): runs of letters / combining
# marks / digits / connector punctuation, with apostrophes and periods kept
# INSIDE a token when flanked by word characters (the MidLetter /
# MidNumLet rules: "can't", "3.14", "node.js" stay single tokens; a
# trailing "end." does not absorb the period).
_SEG_WORD = r"[\p{L}\p{M}\p{N}\p{Pc}]+(?:['’.][\p{L}\p{M}\p{N}\p{Pc}]+)*"


def _seg_tokenizer(case: str, cjk: str = "keep", dictionary: tuple[str, ...] = ()):
    dictionary = tuple(dictionary)  # accept list callers; the cache key must hash
    key = (case, cjk, dictionary)
    if key not in _SEG_TOKENIZERS:
        import regex as _rx

        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType

        pat = _rx.compile(_SEG_WORD)
        # the scripts ICU word-breaks by dictionary rather than by spaces
        cjk_run = _rx.compile(r"[\p{Han}\p{Hiragana}\p{Katakana}]+")
        dwords = frozenset(w for w in dictionary if len(w) > 1)
        maxlen = max((len(w) for w in dwords), default=1)

        def _break_run(run: str) -> list[str]:
            if cjk == "unigram":
                return list(run)
            # greedy forward maximum-matching (the classic public MMSEG /
            # jieba-DAG family baseline); unmatched chars fall back to
            # unigrams, so recall never drops below the unigram mode
            out, i, n = [], 0, len(run)
            while i < n:
                for L in range(min(maxlen, n - i), 1, -1):
                    if run[i : i + L] in dwords:
                        out.append(run[i : i + L])
                        i += L
                        break
                else:
                    out.append(run[i])
                    i += 1
            return out

        def _post(tokens: list[str]) -> list[str]:
            out = []
            for t in tokens:
                if not cjk_run.search(t):
                    out.append(t)
                    continue
                # split the token into CJK runs and non-CJK remainder,
                # breaking only the runs
                pos = 0
                for m in cjk_run.finditer(t):
                    if m.start() > pos:
                        out.append(t[pos : m.start()])
                    out.extend(_break_run(m.group()))
                    pos = m.end()
                if pos < len(t):
                    out.append(t[pos:])
            return out

        @pandas_udf(ArrayType(StringType()))
        def tok(s: pd.Series) -> pd.Series:
            if case == "lower":
                s = s.str.lower()
            elif case == "upper":
                s = s.str.upper()
            if cjk == "keep":
                return s.map(lambda x: pat.findall(x) if isinstance(x, str) else None)
            return s.map(
                lambda x: _post(pat.findall(x)) if isinstance(x, str) else None
            )

        _SEG_TOKENIZERS[key] = tok
    return _SEG_TOKENIZERS[key]


@dataclass(frozen=True)
class SegmentationAnalyzer(Analyzer):
    """`segmentation`: ICU-style Unicode word-break, approximated with the
    `regex` module's Unicode properties (reference
    core/analysis/segmentation_token_stream.cpp:33-52 — ICU BreakIterator
    word instance, "alpha" graph keeps word tokens; case option from its
    options struct).

    Pinned approximation (no ICU in this environment): tokens are runs of
    \\p{L}\\p{M}\\p{N}\\p{Pc} with MidLetter/MidNumLet characters
    (' ’ .) retained between word characters. Matches ICU on
    space-delimited scripts including full Unicode (non-Latin letters
    tokenize instead of vanishing, unlike the ASCII delimiter class).

    CJK (Han/Hiragana/Katakana — the scripts ICU breaks by DICTIONARY,
    segmentation_token_stream.cpp:376) is handled by the `cjk` option (r6):
    - "keep" (default): the run stays one token — pinned divergence from
      ICU, recorded in COVERAGE.md with a failing example.
    - "unigram": one token per CJK codepoint (Lucene StandardTokenizer's
      ideograph behavior; what ICU itself does for out-of-dictionary runs).
    - "dict": greedy forward maximum-matching over the caller-supplied
      `dictionary` (public MMSEG-family baseline), unmatched chars fall
      back to unigrams. ICU's frequency-DP tie-breaks differ on ambiguous
      overlaps; shipping its ~5 MB frequency dictionary is out of scope."""

    case: str = "lower"  # "lower" | "upper" | "none" (options.case)
    stopwords: tuple[str, ...] = ()
    cjk: str = "keep"  # "keep" | "unigram" | "dict"
    dictionary: tuple[str, ...] = ()
    name: str = field(default="segmentation", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        return _seg_tokenizer(self.case, self.cjk, self.dictionary)(col)

    def keep(self, term: Column) -> Column:
        if not self.stopwords:
            return F.lit(True)
        return ~term.isin(*self.stopwords)


@dataclass(frozen=True)
class DelimiterAnalyzer(Analyzer):
    """`delimiter` / `multi_delimiter`: split on literal delimiter(s).

    Reference: core/analysis/delimited_token_stream.cpp,
    multi_delimited_token_stream.cpp.
    """

    delimiters: tuple[str, ...] = (",",)
    name: str = field(default="delimiter", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        import re

        cls = "|".join(re.escape(d) for d in self.delimiters)
        return F.filter(F.split(col, f"(?:{cls})"), lambda t: t != F.lit(""))


@dataclass(frozen=True)
class NormAnalyzer(Analyzer):
    """`norm`: case conversion + optional accent removal; whole input is a
    single token.

    Reference: core/analysis/text_token_normalizing_stream.cpp (case +
    accent options).
    """

    lowercase: bool = True
    accent_fold: bool = False
    name: str = field(default="norm", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        if self.accent_fold:
            col = _accent_fold_udf()(col)
        out = F.lower(col) if self.lowercase else col
        return F.array(out)


def _collation_transform(strength: str):
    import unicodedata

    def one(t):
        if t is None:
            return None
        if strength == "tertiary":
            return unicodedata.normalize("NFC", t)
        nfkd = unicodedata.normalize("NFKD", t)
        if strength == "secondary":
            return nfkd.casefold()
        # primary: base letters only
        return "".join(c for c in nfkd if not unicodedata.combining(c)).casefold()

    return one


def _collation_key_udf(strength: str):
    key = ("collation", strength)
    if key not in _UDF_CACHE:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        one = _collation_transform(strength)

        @pandas_udf(StringType())
        def ckey(s: pd.Series) -> pd.Series:
            return s.map(one)

        _UDF_CACHE[key] = ckey
    return _UDF_CACHE[key]


@dataclass(frozen=True)
class CollationAnalyzer(Analyzer):
    """`collation`: whole input -> ONE sort-key token, so byte order over
    indexed terms == collation order and by_range becomes a collation
    range query.

    Reference: core/analysis/collation_token_stream.cpp:321 emits the ICU
    collation sort key of the input. No ICU in this environment, so this
    is the pinned ROOT-LOCALE subset by strength:
      primary:   NFKD -> strip combining marks -> casefold (base letters
                 only: 'Äpfel' / 'apfel' / 'ÄPFEL' share one key)
      secondary: NFKD casefold (accents distinguish, case doesn't)
      tertiary:  NFC identity (code-point order)
    Code-point order over these keys reproduces UCA root-collation
    EQUIVALENCE classes per strength; full UCA ordering of exotic scripts
    (and locale tailorings) needs ICU tables — documented out of scope.
    Query-side bounds must pass through .key() (same transform)."""

    strength: str = "primary"
    name: str = field(default="collation", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        return F.array(_collation_key_udf(self.strength)(col))

    def key(self, text: str) -> str:
        """Driver-side key transform for query bounds."""
        return _collation_transform(self.strength)(text)


@dataclass(frozen=True)
class StemAnalyzer(Analyzer):
    """`stem`: Porter-stem the whole (lowercased) input as one token.

    Reference: core/analysis/text_token_stemming_stream.cpp (Snowball stem
    of the whole input)."""

    lowercase: bool = True
    name: str = field(default="stem", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        out = F.lower(col) if self.lowercase else col
        return _stem_array_udf()(F.array(out))


@dataclass(frozen=True)
class StringAnalyzer(Analyzer):
    """`identity` / string_token_stream: verbatim single term.

    Reference: core/analysis/token_streams.hpp (string_token_stream).
    """

    name: str = field(default="identity", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        return F.array(col)


@dataclass(frozen=True)
class NgramAnalyzer(Analyzer):
    """`ngram`: character n-grams in [min_n, max_n], optionally preserving
    the original token. Position of every n-gram starting at character i is i
    (reference emits same-position grams via increment=0 within a start
    offset; we pin position = start offset).

    Reference: core/analysis/ngram_token_stream.cpp.

    Implemented with `sequence` + `transform` + `substring` (pure Catalyst).
    """

    min_n: int = 2
    max_n: int = 3
    preserve_original: bool = False
    name: str = field(default="ngram", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        length = F.length(col)

        def gram_fn(n: int):
            # NB: PySpark dispatches higher-order lambdas on *arity* — a
            # default-arg lambda (lambda i, n=n: ...) would be treated as the
            # (element, index) form. Bind n via this closure instead.
            return lambda i: col.substr(i, F.lit(n))

        grams = None
        for n in range(self.min_n, self.max_n + 1):
            g = F.when(
                length >= n,
                F.transform(F.sequence(F.lit(1), length - n + 1), gram_fn(n)),
            ).otherwise(F.array().cast("array<string>"))
            grams = g if grams is None else F.concat(grams, g)
        if self.preserve_original:
            grams = F.concat(grams, F.array(col))
        return grams


@dataclass(frozen=True)
class PipelineAnalyzer(Analyzer):
    """`pipeline`: feed each token of stage k through stage k+1.

    Reference: core/analysis/pipeline_token_stream.cpp. Flattens nested token
    arrays stage by stage with `flatten`+`transform`.
    """

    stages: tuple[Analyzer, ...] = ()
    name: str = field(default="pipeline", init=False)  # type: ignore[assignment]

    def raw_tokens(self, col: Column) -> Column:
        if not self.stages:
            return F.array(col)
        def apply_stage(s: Analyzer):
            # closure factory — see NgramAnalyzer.gram_fn arity note
            return lambda t: s.tokens(t)

        out = self.stages[0].tokens(col)
        for stage in self.stages[1:]:
            out = F.flatten(F.transform(out, apply_stage(stage)))
        return out


# ---------------------------------------------------------------------------
# Registry (name + config -> analyzer), mirroring analyzers.cpp REGISTER_*.
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, Callable[..., Analyzer]] = {
    "text": TextAnalyzer,
    "segmentation": SegmentationAnalyzer,  # regex-module UAX#29 approx (r3)
    "delimiter": DelimiterAnalyzer,
    "multi_delimiter": DelimiterAnalyzer,
    "norm": NormAnalyzer,
    "collation": CollationAnalyzer,
    "stem": StemAnalyzer,
    "identity": StringAnalyzer,
    "ngram": NgramAnalyzer,
    "pipeline": PipelineAnalyzer,
}


def register_analyzer(name: str, factory: Callable[..., Analyzer]) -> None:
    _REGISTRY[name] = factory


def get_analyzer(name: str, **config) -> Analyzer:
    if name not in _REGISTRY:
        raise KeyError(f"unknown analyzer {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**config)


def tokenize(
    df,
    text_col: str = "content",
    doc_id_col: str = "doc_id",
    analyzer: Analyzer | None = None,
    with_positions: bool = True,
):
    """DataFrame (doc_id, text) -> (doc_id, term[, pos]).

    The inversion front half (reference core/index/field_data.cpp:985-1080:
    token stream -> positions). posexplode assigns positions over the raw
    token sequence; the keep-predicate drop afterwards leaves stopword gaps.
    """
    analyzer = analyzer or TextAnalyzer()
    raw = df.select(doc_id_col, F.posexplode(analyzer.raw_tokens(F.col(text_col))).alias("pos", "term"))
    out = raw.where(analyzer.keep(F.col("term")))
    if with_positions:
        return out.select(doc_id_col, "term", "pos")
    return out.select(doc_id_col, "term")

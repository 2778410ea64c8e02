"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Input-table shape per BASELINE.json `input_hint`:
    (repo: string, path: string, commit: string, lang: string,
     content: string, content_sha256: string)

Generation is pure Catalyst: `spark.range(n)` + xxhash64-derived
pseudo-randomness, so the same (seed, n) always yields byte-identical rows on
any cluster size and any partitioning — the property the resumability +
content-sha256 invariant checks rely on. Vocabulary is Zipf-ish skewed
(rank ~ V^u gives pmf ∝ 1/rank) so High/Med/Low-frequency query terms exist,
mirroring the reference benchmark's term-frequency-annotated task set
(reference scripts/iresearch-benchmark.tasks:1-18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Deliberately includes stopwords (exercises the stop filter) and code
# keywords (high-frequency by construction).
KEYWORDS = (
    "def return import class the for in if else while self static void "
    "public int string const let var function license copyright apache"
).split()

LANGS = ["py", "java", "cpp", "go", "js", "md"]

VOCAB_SIZE = 20_000  # identifier vocabulary beyond keywords


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from hashed columns."""
    return (F.pmod(_h(*cols), F.lit(1 << 40))).cast("double") / float(1 << 40)


def generate_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    min_tokens: int = 40,
    max_tokens: int = 200,
    partitions: int | None = None,
    burstiness: float = 0.0,
) -> DataFrame:
    """Build the synthetic corpus as a DataFrame (not yet persisted).

    `burstiness` > 0 adds term burstiness (Church-Gale): that fraction of
    docs gets a per-doc "topic term" from the top-200 vocabulary emitted at
    an elevated per-doc rate (5-40% of tokens). Plain Zipf draws give every
    doc a near-binomial tf for a common term — block maxes come out flat
    and block-max WAND has nothing to skip, which is NOT how real text
    behaves (topical terms spike in few docs). The default 0.0 keeps the
    legacy shape for fixture continuity."""
    rng = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    s = F.lit(seed)

    n_tok = (F.lit(min_tokens) + F.pmod(_h(s, i, F.lit("ntok")), F.lit(max_tokens - min_tokens))).cast("int")

    # token j of doc i: Zipf-ish rank r = floor(V^u) - 1 over the combined
    # keyword+identifier vocabulary, then decorate deterministically with
    # case and punctuation so the analyzer has real work to do.
    kw = F.array(*[F.lit(k) for k in KEYWORDS])
    n_kw = len(KEYWORDS)
    vocab_total = n_kw + VOCAB_SIZE

    # per-doc burst state (deterministic): is this doc bursty, which
    # top-200 term does it burst on, and at what per-token rate
    is_bursty = _u01(s, i, F.lit("bp")) < F.lit(float(burstiness))
    bt_rank = F.pmod(_h(s, i, F.lit("bt")), F.lit(200)).cast("int")
    beta = F.lit(0.05) + F.lit(0.35) * _u01(s, i, F.lit("bb"))

    def _rank_to_token(rank):
        return F.when(rank < n_kw, F.element_at(kw, rank + 1)).otherwise(
            F.concat(F.lit("v"), (rank - n_kw).cast("string"))
        )

    def token_expr(j):
        u = _u01(s, i, j, F.lit("tok"))
        rank = F.floor(F.pow(F.lit(float(vocab_total)), u)) - 1
        rank = F.least(rank, F.lit(vocab_total - 1)).cast("int")
        base = _rank_to_token(rank)
        if burstiness:
            burst_here = is_bursty & (_u01(s, i, j, F.lit("bu")) < beta)
            base = F.when(burst_here, _rank_to_token(bt_rank)).otherwise(base)
        m = F.pmod(_h(s, i, j, F.lit("dec")), F.lit(12))
        return (
            F.when(m == 0, F.concat(F.upper(base), F.lit("();")))
            .when(m == 1, F.concat(base, F.lit(".call(x)")))
            .when(m == 2, F.concat(base, F.lit(",")))
            .when(m == 3, F.initcap(base))
            .otherwise(base)
        )

    content = F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_tok), token_expr))

    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(_h(s, i, F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int"))
    repo = F.concat(
        F.lit("org"), F.pmod(_h(s, i, F.lit("org")), F.lit(50)).cast("string"),
        F.lit("/proj"), F.pmod(_h(s, i, F.lit("proj")), F.lit(9)).cast("string"),
    )
    path = F.concat(
        F.lit("src/m"), F.pmod(_h(s, i, F.lit("mod")), F.lit(40)).cast("string"),
        F.lit("/f"), i.cast("string"), F.lit("."), lang,
    )
    commit = F.substring(F.sha2(F.concat(F.lit(str(seed)), F.lit(":"), i.cast("string")), 256), 1, 40)

    return rng.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    ).withColumn("content_sha256", F.sha2(F.col("content"), 256))


def write_corpus(spark: SparkSession, out_dir: str, n_docs: int, seed: int = 42, **kw) -> None:
    generate_corpus(spark, n_docs, seed, **kw).write.mode("overwrite").parquet(out_dir)

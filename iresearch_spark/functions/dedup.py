"""Deduplication operators for large-scale corpus pipelines.

Four tiers, all DataFrame-native:
- exact:        hash-groupBy on content (or any column set)
- MinHash-LSH:  shingle -> per-seed min-hash signature -> banded bucket
                join -> candidate pairs (the scalable near-dup path; the
                reference ships a minhash analyzer for the same purpose,
                core/analysis/minhash_token_stream.cpp)
- SimHash:      64-bit sign-of-weighted-sum fingerprint + hamming buckets
- n-gram Jaccard: exact quadratic verification (oracle tier, also the
                verifier for LSH candidates)

MinHash math: h_i(x) = (a_i * xxhash64(x) + b_i) mod p, p = 2^61 - 1,
a_i/b_i derived deterministically from the seed — permutation-free
min-wise hashing. All column expressions; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps a*h + b inside int64 (a,h < 2^31 ->
# a*h < 2^62), so the mod-mul needs no overflow tricks under ANSI mode.
MERSENNE_P = (1 << 31) - 1


def exact_dedup(df: DataFrame, cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by exact value: (group columns hash, keep_doc =
    min id, n_copies, all_ids)."""
    key = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256)
    return (
        df.withColumn("_k", key)
        .groupBy(F.col("_k").alias("key_sha256"))
        .agg(
            F.min(id_col).alias("keep_doc"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("all_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def _shingles(text: Column, n: int, token_shingles: bool) -> Column:
    """Char n-grams or token n-grams of the lowercased text."""
    if token_shingles:
        toks = F.filter(F.split(F.lower(text), "[^a-z0-9_]+"), lambda t: t != F.lit(""))
        length = F.size(toks)

        def gram(i):
            return F.concat_ws(" ", F.slice(toks, i, n))

        return F.array_distinct(
            F.when(
                length >= n,
                F.transform(F.sequence(F.lit(1), length - n + 1), gram),
            ).otherwise(F.array(F.concat_ws(" ", toks)))
        )
    low = F.lower(text)
    length = F.length(low)

    def cgram(i):
        return low.substr(i, F.lit(n))

    return F.array_distinct(
        F.when(
            length >= n, F.transform(F.sequence(F.lit(1), length - n + 1), cgram)
        ).otherwise(F.array(low))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle: int = 5,
    token_shingles: bool = True,
    seed: int = 42,
) -> DataFrame:
    """-> (id, signature array<long>[num_hashes])."""
    sh = _shingles(F.col(text_col), shingle, token_shingles)
    base = F.transform(sh, lambda x: F.pmod(F.xxhash64(F.lit(seed), x), F.lit(MERSENNE_P)))
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num_hashes)]

    def mh(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(base, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE_P)))
        )

    sig = F.array(*[mh(a, b) for a, b in coeffs])
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 5,
    token_shingles: bool = True,
    threshold: float = 0.6,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, filtered by estimated
    Jaccard (signature agreement ratio) >= threshold.

    Scale shape: the band explode produces `bands` rows per doc; the
    bucket self-join only pairs docs sharing a band hash — no quadratic
    blowup. Estimated Jaccard = fraction of agreeing minhashes.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle, token_shingles, seed
    ).persist()
    banded = sigs.select(
        "id",
        "signature",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.concat_ws(",", F.slice("signature", b * r + 1, r)), b),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    return (
        cands.withColumn("est_jaccard", agree / F.lit(float(num_hashes)))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    seed: int = 42,
) -> DataFrame:
    """64-bit SimHash fingerprint: sign of per-bit sums of token hashes.

    Token hashes are computed JVM-side (xxhash64); the per-bit +-1
    accumulation runs as a vectorized Arrow kernel over the hash arrays.
    Result: (id, simhash as bigint).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9_]+"), lambda t: t != F.lit(""))
    hashes = F.transform(toks, lambda t: F.xxhash64(F.lit(seed), t))

    @pandas_udf(LongType())
    def _simhash(arrs: pd.Series) -> pd.Series:
        out = np.empty(len(arrs), dtype=np.int64)
        shifts = np.arange(bits, dtype=np.uint64)
        for i, a in enumerate(arrs):
            h = np.asarray(a, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                out[i] = 0
                continue
            bitsum = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            v = (2 * bitsum - 1).sum(axis=0)
            out[i] = int(((v > 0).astype(np.uint64) << shifts).sum().astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _simhash(hashes).alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact token-n-gram Jaccard pairs >= threshold (quadratic in docs
    sharing an n-gram; the verification tier behind LSH candidates)."""
    sh = _shingles(F.col(text_col), n, token_shingles=True)
    grams = df.select(F.col(id_col).alias("id"), F.explode(sh).alias("g")).distinct()
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

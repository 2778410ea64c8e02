"""Embedding similarity search over array<float> columns.

- cosine_topk:            exact brute-force scan (baseline; fully
                          distributed scan + TakeOrderedAndProject)
- hyperplane_lsh_buckets: random-hyperplane sign buckets (deterministic
                          seeded planes) — the scale path: queries probe
                          only their bucket (and optional neighbor probes)
- lsh_cosine_topk:        bucket-probed approximate top-k

All arithmetic is Catalyst (`zip_with`/`aggregate`); no per-row Python.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd  # noqa: F401  (pandas_udf resolves string hints here)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _f64(vec_col: Column) -> Column:
    # widen float32 embeddings before multiplying (float64 accumulation
    # matches a NumPy float64 oracle and avoids precision loss)
    return F.transform(vec_col, lambda v: v.cast("double"))


def _dot_lit(vec_col: Column, q: list[float]) -> Column:
    ql = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(_f64(vec_col), ql, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(_f64(vec_col), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered desc, id asc tie-break."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    cos = _dot_lit(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        df.select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds a `bucket` column: sign bits against n_planes seeded random
    hyperplanes packed into a long. Cosine-similar vectors collide with
    probability (1 - theta/pi)^n_planes.

    r7: ONE pandas UDF computes all n_planes dots per batch; the inner
    loop accumulates `acc += V[:, j] * p[j]` in ascending j — the exact
    left-to-right float64 summation order of the previous Catalyst
    `aggregate(zip_with(...))` expression, so every sign bit (and thus
    every bucket id the oracled gate rows depend on) is bit-identical
    (pinned by tests/test_round7.py). The Catalyst form evaluated
    n_planes interpreted lambda chains per row."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    planes = _planes(dim, n_planes, seed)
    P = [np.asarray(p, dtype=np.float64) for p in planes]

    @pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bucket = np.zeros(n, dtype=np.int64)
        for i, p in enumerate(P):
            acc = np.zeros(n, dtype=np.float64)
            for j in range(V.shape[1]):
                acc += V[:, j] * p[j]
            bucket |= (acc > 0).astype(np.int64) << i
        return pd.Series(bucket)

    return df.withColumn("bucket", _bucket(F.col(vec_col)))


def query_bucket(query: list[float], dim: int, n_planes: int = 12, seed: int = 42) -> int:
    planes = _planes(dim, n_planes, seed)
    b = 0
    for i, p in enumerate(planes):
        dot = sum(float(x) * float(y) for x, y in zip(query, p))
        if dot > 0:
            b |= 1 << i
    return b


def _assign_udf(centroids: list[list[float]]):
    """pandas UDF: vector -> nearest-centroid list id (cosine argmax),
    vectorized per batch (V @ C.T). One numpy kernel instead of C Catalyst
    aggregate expressions (which would re-evaluate the vector cast per
    centroid — the N-expressions-over-one-array recompute trap)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series((Vn @ Cn.T).argmax(axis=1).astype(np.int32))

    return assign


def ivf_build(
    df: DataFrame,
    dim: int,
    n_lists: int = 16,
    iters: int = 3,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index build: deterministic Lloyd k-means (seeded init from
    hash-ordered rows, `iters` refinement rounds) -> (df + `list_id`
    column, centroids). Scale shape: assignments are a distributed Arrow
    kernel; only the (n_lists x dim) centroid table ever reaches the
    driver. Centroids are the broadcast "index"; a production layout would
    bucket/partition the table by list_id so probes prune file groups."""
    # the Lloyd loop scans the input once per iteration — persist it for
    # the loop (r2 VERDICT wrong-7: each iteration re-read the source).
    # The cache handle rides on the returned DataFrame; callers unpersist
    # via release_cached() once the final assignment is materialized.
    cached = df.persist()
    init = (
        cached.orderBy(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 31)))
        .limit(n_lists)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = cached.withColumn("list_id", _assign_udf(centroids)(F.col(vec_col)))
        sums = (
            assigned.select("list_id", F.posexplode(_f64(F.col(vec_col))).alias("i", "v"))
            .groupBy("list_id", "i")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["list_id"], [0.0] * dim)[r["i"]] = r["s"]
            cnt[r["list_id"]] = r["n"]
        for li, vec in acc.items():
            centroids[li] = [x / cnt[li] for x in vec]
    indexed = cached.withColumn("list_id", _assign_udf(centroids)(F.col(vec_col)))
    indexed._ir_cached_input = cached  # type: ignore[attr-defined]
    return indexed, centroids


def release_cached(df: DataFrame) -> None:
    """Unpersist the internal cache(s) a builder attached to its result
    (ivf_build, minhash_lsh_pairs, ngram_jaccard_pairs) once the result has
    been materialized. Accepts a single cached DataFrame or a list chain."""
    cached = getattr(df, "_ir_cached_input", None)
    if cached is None:
        return
    for c in cached if isinstance(cached, (list, tuple)) else (cached,):
        if c is not None:
            c.unpersist()


def ivf_write_bucketed(indexed: DataFrame, path: str) -> None:
    """Materialize the IVF index PHYSICALLY bucketed by list_id (one
    partition directory per inverted list). Probing a bucketed table via
    `list_id IN (...)` prunes whole directories at the source (Spark
    partition pruning) — at 100 TB a probe reads nprobe/n_lists of the
    files instead of filtering a full scan (r2 VERDICT next-7; pinned by
    tests/test_round3.py plan assertion)."""
    indexed.write.partitionBy("list_id").mode("overwrite").parquet(path)


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: probe the `nprobe` nearest inverted lists, exact cosine
    inside the candidates. nprobe == n_lists degrades to exact brute force
    (pinned by test); smaller nprobe trades recall for a 1/n_lists-ish scan
    fraction."""

    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(Cn @ qn), kind="stable")[:nprobe]
    cand = indexed.where(F.col("list_id").isin(*[int(x) for x in order]))
    return cosine_topk(cand, query, k, vec_col, id_col)


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket
    candidates (side A exploded to its multiprobe neighborhood, equi-joined
    on side B's bucket — never all-pairs), then exact float64 cosine >=
    threshold verifies. Exact duplicates always share a bucket, so recall
    on them is 1 by construction; near-dups at angle theta collide with
    prob (1 - theta/pi)^n_planes per probe. Pair dedup happens on bare ids
    BEFORE embeddings re-attach (the minhash_lsh_pairs discipline)."""
    # (id, bucket) sketch computed ONCE and persisted for both self-join
    # sides (r7 — the previous shape re-evaluated the n_planes bucket
    # expression for each side); the handle rides on the returned frame
    # for release_cached(), the minhash_lsh_pairs convention
    sk = hyperplane_lsh_buckets(df, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("id"), "bucket"
    ).persist()
    probes = [0]
    if multiprobe_bits >= 1:
        probes += [1 << i for i in range(n_planes)]
    if multiprobe_bits >= 2:
        probes += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    a = sk.select(
        F.col("id").alias("id_a"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in probes])
        ).alias("bucket"),
    )
    b = sk.select(F.col("id").alias("id_b"), "bucket")
    cands = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # --- verify tier selection (r7, guide §8): the decision rows are tiny
    # (id_a, id_b) while the payload (two dim-float64 vectors per pair) is
    # ~1 KB/pair. When the vector table fits a broadcast, ship the WHOLE
    # (ids, matrix) once and verify inside a kernel over bare id pairs —
    # the two shuffle joins re-attaching vectors and the ~1 KB/pair Arrow
    # crossing disappear (measured: the whole-operator cost was this
    # attach+verify, not the bucketing). Beyond the cap (cluster scale),
    # fall back to the join + vectorized-verify path below.
    import os

    n_vec = sk.count()  # also materializes the persisted sketch
    bcast_max = int(os.environ.get("IR_EMB_BCAST_MAX", "500000"))
    if n_vec <= bcast_max:
        pdf_v = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
        ).toPandas()
        ids_v = pdf_v["id"].to_numpy().astype(np.int64)
        if np.unique(ids_v).size == ids_v.size:
            order = np.argsort(ids_v, kind="mergesort")
            ids_sorted = ids_v[order]
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf_v["v"]]
            )[order]
            bc = df.sparkSession.sparkContext.broadcast((ids_sorted, V))
            thr = float(threshold)

            def verify(batches):
                ids_s, Vm = bc.value
                for pdf in batches:
                    n = len(pdf)
                    if n == 0:
                        continue
                    ia = np.searchsorted(ids_s, pdf["id_a"].to_numpy())
                    ib = np.searchsorted(ids_s, pdf["id_b"].to_numpy())
                    A = Vm[ia]
                    B = Vm[ib]
                    dot = np.zeros(n, dtype=np.float64)
                    na = np.zeros(n, dtype=np.float64)
                    nb = np.zeros(n, dtype=np.float64)
                    # ascending-j accumulation: the exact float64 order of
                    # the Catalyst aggregate(zip_with) expression
                    for j in range(Vm.shape[1]):
                        dot += A[:, j] * B[:, j]
                        na += A[:, j] * A[:, j]
                        nb += B[:, j] * B[:, j]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = dot / (np.sqrt(na) * np.sqrt(nb))
                    # Spark semantics keep NaN/+inf on `>= threshold`
                    # (NaN sorts greatest); ~(cos < thr) reproduces that
                    keep = ~(cos < thr)
                    if keep.any():
                        yield pd.DataFrame(
                            {
                                "id_a": pdf["id_a"].to_numpy()[keep],
                                "id_b": pdf["id_b"].to_numpy()[keep],
                                "cosine": cos[keep],
                            }
                        )

            out = cands.select(
                F.col("id_a").cast("long"), F.col("id_b").cast("long")
            ).mapInPandas(verify, "id_a long, id_b long, cosine double")
            # release_cached() calls .unpersist() on each element — valid
            # for the Broadcast handle too, so the 100k x dim matrix does
            # not outlive the query
            out._ir_cached_input = [sk, bc]  # type: ignore[attr-defined]
            return out

    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col))
    withv = cands.join(
        vecs.select(F.col("id").alias("id_a"), F.col(vec_col).alias("_va")),
        "id_a",
    ).join(
        vecs.select(F.col("id").alias("id_b"), F.col(vec_col).alias("_vb")),
        "id_b",
    )
    # exact float64 verify in ONE Arrow kernel; the inner loops accumulate
    # in ascending element order — bit-identical to the previous Catalyst
    # aggregate(zip_with) expression (the oracle's expression tree), which
    # evaluated ~3*dim interpreted lambda steps per candidate pair and was
    # the dominant cost of the whole operator (guide §4.2; measured in
    # OPTIMIZATION_r07.md). Pinned by tests/test_round7.py.
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        n = len(va)
        if n == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        A = np.stack([np.asarray(v, dtype=np.float64) for v in va])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in vb])
        dot = np.zeros(n, dtype=np.float64)
        na = np.zeros(n, dtype=np.float64)
        nb = np.zeros(n, dtype=np.float64)
        for j in range(A.shape[1]):
            dot += A[:, j] * B[:, j]
            na += A[:, j] * A[:, j]
            nb += B[:, j] * B[:, j]
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    out = (
        withv.withColumn("cosine", _cos(F.col("_va"), F.col("_vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    out._ir_cached_input = sk  # type: ignore[attr-defined]
    return out


def lsh_cosine_topk(
    bucketed: DataFrame,
    query: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe the query's bucket plus all buckets within
    `multiprobe_bits` hamming distance (multi-probe LSH), then exact
    cosine inside the candidate set. `bucketed` must come from
    hyperplane_lsh_buckets with the same (dim, n_planes, seed)."""
    qb = query_bucket(query, dim, n_planes, seed)
    probes = {qb}
    if multiprobe_bits >= 1:
        for i in range(n_planes):
            probes.add(qb ^ (1 << i))
    if multiprobe_bits >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qb ^ (1 << i) ^ (1 << j))
    cand = bucketed.where(F.col("bucket").isin(*sorted(probes)))
    return cosine_topk(cand, query, k, vec_col, id_col)


def nearest_labels(
    df: DataFrame,
    labels: DataFrame,
    k: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    label_vec_col: str = "embedding",
) -> DataFrame:
    """Model-free `classification` / `nearest_neighbors` analogue
    (reference classification_token_stream / nearest_neighbors_stream,
    core/analysis/classification_stream.cpp — fastText-model-based; no
    model libs ship in this container, so the LABEL CENTROID TABLE plays
    the model's output layer): each input embedding receives its top-k
    nearest labels by cosine.

    Plan shape for scale: the label table is a handful of centroids ->
    BROADCAST nested-loop join (no shuffle of the big side); cosine is
    pure Catalyst float64 (`zip_with`/`aggregate`, the same expression
    tree the DuckDB oracle runs); the per-doc top-k window partitions by
    the big side's id, so the only shuffle is the M*k result ranking.
    Returns (id, label, cosine, rank), rank 1 = best, ties by label asc.
    """
    from pyspark.sql.window import Window

    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
    l = labels.select(
        F.col(label_col).alias("label"), F.col(label_vec_col).alias("_lv")
    )
    dot = F.aggregate(
        F.zip_with(_f64(F.col("_v")), _f64(F.col("_lv")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # zero-norm guard (r5 ADVICE): a zero embedding or centroid would give
    # NaN, which Spark's DESC ordering ranks FIRST (NaN sorts largest) —
    # diverging from the SQL oracle's div-by-zero null. Null cosine sorts
    # LAST under desc ordering on both sides instead.
    nprod = _norm(F.col("_v")) * _norm(F.col("_lv"))
    cos = F.when(nprod != 0.0, dot / nprod)
    pairs = e.join(F.broadcast(l)).select("id", "label", cos.alias("cosine"))
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("label"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "label", "cosine", "rank")
    )


def classify_embeddings(
    df: DataFrame,
    labels: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    label_vec_col: str = "embedding",
) -> DataFrame:
    """Top-1 nearest_labels: (id, label, cosine) — the classification
    analyzer surface (one label per document)."""
    return nearest_labels(
        df, labels, 1, vec_col, id_col, label_col, label_vec_col
    ).drop("rank")

"""Inverted-index build: invert -> postings -> packed blocks -> segment.

Spark-first restatement of the reference indexing path (SURVEY.md §3.1):
IndexWriter::Insert's per-doc inversion (core/index/field_data.cpp:985-1080)
becomes `tokenize -> posexplode -> groupBy(doc_id, term)`; the in-memory
postings hash (core/index/postings.cpp) IS Spark's hash aggregate; the
postings_writer's 128-doc block encode (core/formats/formats_10.cpp:865-891)
becomes Arrow pandas UDFs over per-block arrays; flush/commit becomes a
parquet write + manifest snapshot (index/segments.py).

Scale notes (the parts that must survive 1000 executors / 100 TB):
- Deterministic docIDs WITHOUT a global single-partition window:
  range-partition by the canonical key, count per partition, prefix-sum the
  (tiny) counts on the driver, then partition-local row_number + offset.
- 128-doc blocks WITHOUT per-term windows or per-block groupBys (hot terms
  like `the`, `license` would serialize into one task): postings group by
  (term, chunk) where chunk = doc_id >> chunk_bits bounds every group to
  2^chunk_bits postings, and one Arrow kernel splits each group into packed
  blocks. This is the salting strategy from SURVEY.md §7; the cost is at
  most one partial block per (term, chunk) tail.
- dl rides on every posting from tokenize time — no doclen join anywhere in
  the build or query path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iresearch_spark.analysis.analyzers import Analyzer, TextAnalyzer, tokenize
from iresearch_spark.index.codec import (
    BLOCK_SIZE,
    delta_encode,
    varint_encode,
)

DEFAULT_CHUNK_BITS = 14  # window groups bounded to 16384 postings


# ---------------------------------------------------------------------------
# Packing kernel (Arrow-vectorized; the data-plane work Catalyst can't do)
#
# Perf evolution (measured at 120k docs / 11M postings, 8 cores):
#   window-rank + per-block groupBy + 4 scalar UDFs ........ ~52s
#   (term, chunk) groupBy + array-of-struct UDF ............ ~33s
#   ONE repartition + streaming mapInPandas packer ......... see bench
# Other hard-won rules encoded here:
# - never ship array<array<int>> through Arrow (flatten positions first)
# - delta-encode in numpy, not in JVM lambdas (element_at delta is O(n^2))
# - Python UDFs cannot take lambda-bearing higher-order inputs
# ---------------------------------------------------------------------------

_BLOCK_STRUCT = StructType(
    [
        StructField("block_intra", IntegerType()),
        StructField("doc_count", IntegerType()),
        StructField("first_doc", LongType()),
        StructField("last_doc", LongType()),
        StructField("max_tf", IntegerType()),
        StructField("min_dl", IntegerType()),
        StructField("sum_tf", LongType()),
        StructField("docs_bin", BinaryType()),
        StructField("tfs_bin", BinaryType()),
        StructField("dls_bin", BinaryType()),
        StructField("pos_bin", BinaryType()),
    ]
)


def _make_chunk_packer(block_size: int):
    @pandas_udf(ArrayType(_BLOCK_STRUCT))
    def _pack_chunk_udf(
        doc_ids: pd.Series, tfs: pd.Series, dls: pd.Series, pos_flat: pd.Series
    ) -> pd.Series:
        """One input row = one (term, chunk) posting group (doc-sorted flat
        arrays); output = that group split into <=block_size-doc packed
        blocks (the reference postings_writer's 128-doc block loop,
        formats_10.cpp:865-891, chunk-local)."""
        out = []
        for d, t, l, p in zip(doc_ids, tfs, dls, pos_flat):
            darr = np.asarray(d, dtype=np.uint64)
            tarr = np.asarray(t, dtype=np.uint64)
            larr = np.asarray(l, dtype=np.uint64)
            n = darr.size
            if p is not None:
                parr = np.asarray(p, dtype=np.uint64)
                pos_ends = np.cumsum(tarr)
            blocks = []
            for b, s in enumerate(range(0, n, block_size)):
                e = min(s + block_size, n)
                db, tb, lb = darr[s:e], tarr[s:e], larr[s:e]
                if p is not None:
                    ps = 0 if s == 0 else int(pos_ends[s - 1])
                    pe = int(pos_ends[e - 1])
                    pb = parr[ps:pe]
                    if pb.size:
                        deltas = np.empty_like(pb)
                        deltas[0] = pb[0]
                        np.subtract(pb[1:], pb[:-1], out=deltas[1:])
                        starts = (np.concatenate(([0], np.cumsum(tb)[:-1].astype(np.int64)))).astype(np.int64)
                        deltas[starts] = pb[starts]  # delta resets per doc
                        pos_bin = varint_encode(deltas)
                    else:
                        pos_bin = b""
                else:
                    pos_bin = None
                blocks.append(
                    {
                        "block_intra": b,
                        "doc_count": int(e - s),
                        "first_doc": int(db[0]),
                        "last_doc": int(db[-1]),
                        "max_tf": int(tb.max()),
                        "min_dl": int(lb.min()),
                        "sum_tf": int(tb.sum()),
                        "docs_bin": varint_encode(delta_encode(db)),
                        "tfs_bin": varint_encode(tb),
                        "dls_bin": varint_encode(lb),
                        "pos_bin": pos_bin,
                    }
                )
            out.append(blocks)
        return pd.Series(out)

    return _pack_chunk_udf


# ---------------------------------------------------------------------------
# Deterministic docID assignment
# ---------------------------------------------------------------------------

def assign_doc_ids(
    df: DataFrame,
    key_cols: list[str],
    out_col: str = "doc_id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense deterministic ids = `start` + global rank by key_cols.

    Equivalent to ``row_number() OVER (ORDER BY key_cols)`` but scalable: the
    global ORDER BY window would execute in ONE task. Here: range-partition
    on the key, count rows per partition (a tiny aggregate), prefix-sum the
    counts on the driver, and add the per-partition base to a
    partition-local row_number. Deterministic for unique keys regardless of
    sampling boundaries (reference parity: per-segment dense insertion-order
    doc_id_t, core/utils/type_limits.hpp:39-50).
    """
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keyed = df.repartitionByRange(n_part, *key_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    keyed = keyed.persist()
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in keyed.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    bases, acc = {}, start
    for pid in sorted(counts):
        bases[pid] = acc
        acc += counts[pid]
    base_map = F.create_map(
        *[F.lit(x) for kv in sorted(bases.items()) for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in key_cols])
    out = keyed.withColumn(
        out_col,
        (F.row_number().over(w) - 1 + base_map[F.col("_pid")]).cast("long"),
    ).drop("_pid")
    # the intermediate cache must outlive `out`'s first materialization;
    # expose it so callers (build_segment) can unpersist once their own
    # persist of the result is materialized
    out._ir_cached_input = keyed  # type: ignore[attr-defined]
    return out


# ---------------------------------------------------------------------------
# Inversion
# ---------------------------------------------------------------------------

def invert(
    docs: DataFrame,
    text_col: str = "content",
    doc_id_col: str = "doc_id",
    analyzer: Analyzer | None = None,
    with_positions: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """docs -> (postings_flat, doclen).

    postings_flat: (doc_id, term, tf, positions array<int>|absent)
    doclen:        (doc_id, len)   [len = emitted-token count, Norm2
                   semantics, reference core/index/norm.hpp:75-125]
    """
    analyzer = analyzer or TextAnalyzer()
    # attach dl (emitted-token count) BEFORE the explode: it rides along to
    # every posting, so packing never joins a doclen table — at cluster
    # scale that join would shuffle the whole postings set per build.
    raw = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        analyzer.raw_tokens(F.col(text_col)).alias("_raw"),
    )
    raw = raw.withColumn(
        "dl", F.size(F.filter("_raw", lambda t: analyzer.keep(t))).cast("int")
    )
    toks = raw.select(
        "doc_id", "dl", F.posexplode("_raw").alias("pos", "term")
    ).where(analyzer.keep(F.col("term")))
    # post-filter per-token transform (stemming): reference pipeline order
    # is stopword-check-then-stem (text_token_stream.cpp:356-421)
    toks = toks.withColumn("term", analyzer.map_term(F.col("term")))
    if with_positions:
        flat = toks.groupBy("doc_id", "dl", "term").agg(
            F.count("*").cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    else:
        flat = toks.groupBy("doc_id", "dl", "term").agg(
            F.count("*").cast("int").alias("tf")
        )
    # doclen derived from flat (callers persist flat); docs with zero
    # emitted tokens have no postings and no doclen row — docs_with_field
    # semantics, matching the reference's norms column
    doclen = flat.groupBy("doc_id").agg(F.max("dl").cast("int").alias("len"))
    return flat, doclen


# ---------------------------------------------------------------------------
# Block packing
# ---------------------------------------------------------------------------

def pack_postings(
    postings_flat: DataFrame,
    doclen: DataFrame | None = None,
    block_size: int = BLOCK_SIZE,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    with_positions: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, dl, term, tf[, positions]) -> packed block rows.

    Output: (term, block_id, doc_count, first_doc, last_doc, max_tf, min_dl,
    docs_bin, tfs_bin, dls_bin[, pos_bin]).

    Blocks hold up to `block_size` docs in ascending doc order; blocks are
    exactly block_size within each doc-range *chunk* (chunk = doc_id >>
    chunk_bits), with at most one partial block per (term, chunk) tail.
    Chunking bounds the largest single aggregation group to 2^chunk_bits
    postings, so hot terms (`the`, `license`) spread across tasks instead of
    serializing into one — the salting strategy from SURVEY.md §7. block_id =
    chunk * blocks_per_chunk + intra is globally doc-ordered per term.

    (max_tf, min_dl) per block is the block-max WAND pair (reference
    core/search/wand_writer.hpp MaxFreq/MinNorm producers).

    Per-posting doc length is INLINED into the block (impact-ordered-index
    style): BM25 needs (tf, dl) per posting, and inlining dl (~1 varint
    byte) makes query scoring join-free — at cluster scale a per-query join
    of the hit set against a doclen table would dwarf everything else. If
    `postings_flat` lacks a dl column, pass `doclen` to attach it (merge
    path); `invert()` output already carries dl.
    """
    p = postings_flat
    if "dl" not in p.columns:
        assert doclen is not None, "postings_flat lacks dl; doclen required"
        p = p.join(doclen, "doc_id").withColumnRenamed("len", "dl")
    p = p.withColumn("_chunk", (F.col("doc_id") / F.lit(1 << chunk_bits)).cast("long"))

    entry = (
        F.struct("doc_id", "tf", "dl", "positions")
        if with_positions
        else F.struct("doc_id", "tf", "dl")
    )
    grouped = p.groupBy("term", "_chunk").agg(
        F.sort_array(F.collect_list(entry)).alias("plist")
    )
    doc_ids = F.transform("plist", lambda x: x["doc_id"])
    tfs = F.transform("plist", lambda x: x["tf"])
    dls = F.transform("plist", lambda x: x["dl"])
    if with_positions:
        # flat positions; per-doc boundaries recovered from tfs in the UDF
        pos_flat = F.flatten(F.transform("plist", lambda s: s["positions"])).cast(
            "array<long>"
        )
    else:
        pos_flat = F.lit(None).cast("array<long>")
    pre = grouped.select(
        "term",
        "_chunk",
        doc_ids.cast("array<long>").alias("_dd"),
        tfs.cast("array<long>").alias("_tf"),
        dls.cast("array<long>").alias("_dl"),
        pos_flat.alias("_pd"),
    )
    # The exchange below is (a) the physical layout we want on disk (term-
    # clustered, block-ordered, so term-IN parquet pushdown prunes row
    # groups) and (b) a CollapseProject barrier: without it Catalyst folds
    # the array projection into the UDF projection and fails with
    # "Cannot evaluate expression" (Python UDFs cannot take lambda-bearing
    # higher-order inputs).
    n_part = num_partitions or postings_flat.sparkSession.sparkContext.defaultParallelism
    # (term, chunk) in the partition key spreads hot terms across tasks;
    # sortWithinPartitions keeps term clustering for parquet row-group
    # pruning. The exchange is also the CollapseProject barrier Python UDFs
    # need under lambda-bearing inputs.
    pre = pre.repartition(n_part, "term", "_chunk").sortWithinPartitions("term", "_chunk")
    packer = _make_chunk_packer(block_size)
    blocks_per_chunk = max(1, (1 << chunk_bits) // block_size)
    exploded = pre.select(
        "term",
        "_chunk",
        F.explode(packer("_dd", "_tf", "_dl", "_pd")).alias("_b"),
    )
    out = exploded.select(
        "term",
        (F.col("_chunk") * blocks_per_chunk + F.col("_b.block_intra"))
        .cast("long")
        .alias("block_id"),
        F.col("_b.doc_count").alias("doc_count"),
        F.col("_b.first_doc").alias("first_doc"),
        F.col("_b.last_doc").alias("last_doc"),
        F.col("_b.max_tf").alias("max_tf"),
        F.col("_b.min_dl").alias("min_dl"),
        F.col("_b.sum_tf").alias("sum_tf"),
        F.col("_b.docs_bin").alias("docs_bin"),
        F.col("_b.tfs_bin").alias("tfs_bin"),
        F.col("_b.dls_bin").alias("dls_bin"),
        *([F.col("_b.pos_bin").alias("pos_bin")] if with_positions else []),
    )
    return out


# ---------------------------------------------------------------------------
# Single-shuffle build path: token-level groupBy(term, chunk)
# ---------------------------------------------------------------------------


def _make_token_packer(block_size: int):
    @pandas_udf(ArrayType(_BLOCK_STRUCT))
    def _pack_tokens_udf(
        doc_ids: pd.Series, dls: pd.Series, pos_flat: pd.Series
    ) -> pd.Series:
        """One input row = one (term, chunk) TOKEN group, sorted by
        (doc, pos); per-doc tf/positions are derived here instead of in a
        separate groupBy(doc, term) aggregation — the r2 single-shuffle
        build (the old two-agg pipeline moved every posting through TWO
        shuffles; this moves each token through ONE)."""
        out = []
        for d, l, p in zip(doc_ids, dls, pos_flat):
            darr = np.asarray(d, dtype=np.int64)
            larr = np.asarray(l, dtype=np.uint64)
            n = darr.size
            with_pos = p is not None
            # unique-doc boundaries (tokens sorted by doc, then pos)
            bnd = np.flatnonzero(np.concatenate(([True], darr[1:] != darr[:-1])))
            udocs = darr[bnd].astype(np.uint64)
            tf = np.diff(np.concatenate((bnd, [n]))).astype(np.uint64)
            udl = larr[bnd]
            if with_pos:
                parr = np.asarray(p, dtype=np.int64)
                deltas = np.empty_like(parr)
                if n:
                    deltas[0] = parr[0]
                    np.subtract(parr[1:], parr[:-1], out=deltas[1:])
                    deltas[bnd] = parr[bnd]  # delta resets per doc
                deltas = deltas.astype(np.uint64)
            blocks = []
            nu = udocs.size
            for bi, s in enumerate(range(0, nu, block_size)):
                e = min(s + block_size, nu)
                tok_s = int(bnd[s])
                tok_e = int(bnd[e]) if e < nu else n
                tb = tf[s:e]
                lb = udl[s:e]
                blocks.append(
                    {
                        "block_intra": bi,
                        "doc_count": int(e - s),
                        "first_doc": int(udocs[s]),
                        "last_doc": int(udocs[e - 1]),
                        "max_tf": int(tb.max()),
                        "min_dl": int(lb.min()),
                        "sum_tf": int(tb.sum()),
                        "docs_bin": varint_encode(delta_encode(udocs[s:e])),
                        "tfs_bin": varint_encode(tb),
                        "dls_bin": varint_encode(lb),
                        "pos_bin": varint_encode(deltas[tok_s:tok_e]) if with_pos else None,
                    }
                )
            out.append(blocks)
        return pd.Series(out)

    return _pack_tokens_udf


def pack_tokens(
    tokens: DataFrame,
    block_size: int = BLOCK_SIZE,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    with_positions: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-level rows (doc_id, dl, term[, pos]) -> packed block rows, in
    ONE shuffle: groupBy(term, chunk) collects sorted (doc, pos, dl)
    structs and the Arrow kernel derives per-doc tf/positions AND packs
    blocks in the same pass. Replaces the two-shuffle pipeline
    (groupBy(doc, term) then groupBy(term, chunk)) on the build path —
    measured the dominant cost at scale; the token payload through the one
    remaining shuffle is ~1.4x a posting row, for half the shuffles.
    Output schema identical to pack_postings()."""
    t = tokens.withColumn("_chunk", (F.col("doc_id") / F.lit(1 << chunk_bits)).cast("long"))
    entry = (
        F.struct("doc_id", "pos", "dl") if with_positions else F.struct("doc_id", "dl")
    )
    grouped = t.groupBy("term", "_chunk").agg(
        F.sort_array(F.collect_list(entry)).alias("tl")
    )
    doc_ids = F.transform("tl", lambda x: x["doc_id"])
    dls = F.transform("tl", lambda x: x["dl"])
    pos = (
        F.transform("tl", lambda x: x["pos"]).cast("array<long>")
        if with_positions
        else F.lit(None).cast("array<long>")
    )
    pre = grouped.select(
        "term",
        "_chunk",
        doc_ids.cast("array<long>").alias("_dd"),
        dls.cast("array<long>").alias("_dl"),
        pos.alias("_pp"),
    )
    n_part = num_partitions or tokens.sparkSession.sparkContext.defaultParallelism
    # exchange = physical term clustering for parquet pruning + the
    # CollapseProject barrier Python UDFs need under lambda-bearing inputs
    pre = pre.repartition(n_part, "term", "_chunk").sortWithinPartitions("term", "_chunk")
    packer = _make_token_packer(block_size)
    blocks_per_chunk = max(1, (1 << chunk_bits) // block_size)
    exploded = pre.select(
        "term",
        "_chunk",
        F.explode(packer("_dd", "_dl", "_pp")).alias("_b"),
    )
    return exploded.select(
        "term",
        (F.col("_chunk") * blocks_per_chunk + F.col("_b.block_intra"))
        .cast("long")
        .alias("block_id"),
        F.col("_b.doc_count").alias("doc_count"),
        F.col("_b.first_doc").alias("first_doc"),
        F.col("_b.last_doc").alias("last_doc"),
        F.col("_b.max_tf").alias("max_tf"),
        F.col("_b.min_dl").alias("min_dl"),
        F.col("_b.sum_tf").alias("sum_tf"),
        F.col("_b.docs_bin").alias("docs_bin"),
        F.col("_b.tfs_bin").alias("tfs_bin"),
        F.col("_b.dls_bin").alias("dls_bin"),
        *([F.col("_b.pos_bin").alias("pos_bin")] if with_positions else []),
    )


def tokenize_stream(
    docs: DataFrame,
    text_col: str = "content",
    analyzer=None,
    with_positions: bool = True,
) -> DataFrame:
    """docs -> token-level rows (doc_id, dl, term[, pos]) with stopword
    position gaps and post-filter term mapping (stemming) — the front half
    of invert() without the per-(doc, term) aggregation."""
    analyzer = analyzer or TextAnalyzer()
    raw = docs.select(
        F.col("doc_id"),
        analyzer.raw_tokens(F.col(text_col)).alias("_raw"),
    ).withColumn(
        "dl", F.size(F.filter("_raw", lambda t: analyzer.keep(t))).cast("int")
    )
    toks = raw.select(
        "doc_id", "dl", F.posexplode("_raw").alias("pos", "term")
    ).where(analyzer.keep(F.col("term")))
    toks = toks.withColumn("term", analyzer.map_term(F.col("term")))
    if with_positions:
        return toks.select("doc_id", "dl", "term", F.col("pos").cast("long").alias("pos"))
    return toks.select("doc_id", "dl", "term")


def term_stats(postings_flat: DataFrame) -> DataFrame:
    """Per-term corpus stats (reference term_meta docs_count/freq,
    core/formats/formats.hpp:92-108)."""
    return postings_flat.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )


def term_stats_from_packed(packed: DataFrame) -> DataFrame:
    """Same stats derived from packed block metadata (doc_count / sum_tf
    per block) — lets the build aggregate stats from the (small) written
    postings table instead of re-scanning or caching the flat postings."""
    return packed.groupBy("term").agg(
        F.sum("doc_count").cast("long").alias("doc_freq"),
        F.sum("sum_tf").cast("long").alias("total_tf"),
    )

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
- Exact 128-doc blocks WITHOUT a per-term window (hot terms like `the`,
  `license` would serialize into one task): rank within (term, doc-chunk)
  where chunk = doc_id >> chunk_bits bounds every window group to 2^chunk_bits
  rows, and per-term chunk offsets come from a window over per-chunk COUNTS
  (one row per (term, chunk) — tiny). This is the salting strategy from
  SURVEY.md §7.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

from iresearch_spark.analysis.analyzers import Analyzer, TextAnalyzer, tokenize
from iresearch_spark.index.codec import (
    BLOCK_SIZE,
    delta_encode,
    pack_positions,
    varint_encode,
)

DEFAULT_CHUNK_BITS = 14  # window groups bounded to 16384 postings


# ---------------------------------------------------------------------------
# Packing kernels (Arrow-vectorized; the data-plane work Catalyst can't do)
# ---------------------------------------------------------------------------

@pandas_udf(BinaryType())
def _pack_delta_varint(arrays: pd.Series) -> pd.Series:
    """array<long> (sorted) -> delta+varint bytes."""
    return arrays.map(lambda a: varint_encode(delta_encode(np.asarray(a, dtype=np.uint64))))


@pandas_udf(BinaryType())
def _pack_varint(arrays: pd.Series) -> pd.Series:
    """array<int> -> varint bytes (no delta; used for tfs)."""
    return arrays.map(lambda a: varint_encode(np.asarray(a, dtype=np.uint64)))


@pandas_udf(BinaryType())
def _pack_pos(arrays: pd.Series) -> pd.Series:
    """array<array<int>> (per-doc sorted positions) -> concatenated
    per-doc position-delta varints (.pos stream analogue)."""
    return arrays.map(
        lambda docs: pack_positions([np.asarray(p, dtype=np.uint64) for p in docs])
    )


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
    toks = tokenize(docs, text_col, doc_id_col, analyzer, with_positions=True)
    if with_positions:
        flat = toks.groupBy(doc_id_col, "term").agg(
            F.count("*").cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    else:
        flat = toks.groupBy(doc_id_col, "term").agg(F.count("*").cast("int").alias("tf"))
    # dl = sum(tf) per doc == emitted-token count; derived from `flat` (which
    # callers persist) instead of re-tokenizing the corpus
    doclen = flat.groupBy(doc_id_col).agg(F.sum("tf").cast("int").alias("len"))
    return flat, doclen


# ---------------------------------------------------------------------------
# Block packing
# ---------------------------------------------------------------------------

def pack_postings(
    postings_flat: DataFrame,
    doclen: DataFrame,
    block_size: int = BLOCK_SIZE,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    with_positions: bool = True,
) -> DataFrame:
    """(doc_id, term, tf[, positions]) -> packed block rows.

    Output: (term, block_id, doc_count, first_doc, last_doc, max_tf, min_dl,
    docs_bin, tfs_bin[, pos_bin]). Blocks hold exactly `block_size` docs
    (last block per term excepted) in ascending doc order; (max_tf, min_dl)
    is the block-max WAND pair (reference core/search/wand_writer.hpp:
    MaxFreq/MinNorm producers).
    """
    p = postings_flat.join(doclen, "doc_id")  # attach dl for block min_dl
    chunk = (F.col("doc_id") / F.lit(1 << chunk_bits)).cast("long")
    p = p.withColumn("_chunk", chunk)

    # per-(term, chunk) counts -> per-term running offset of each chunk
    counts = p.groupBy("term", "_chunk").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy("term")
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).drop("_cnt")

    w_rank = Window.partitionBy("term", "_chunk").orderBy("doc_id")
    ranked = (
        p.join(offsets, ["term", "_chunk"])
        .withColumn("_rank", F.row_number().over(w_rank) - 1 + F.col("_off"))
        .withColumn("block_id", (F.col("_rank") / block_size).cast("int"))
    )

    entry = (
        F.struct("doc_id", "tf", F.col("len").alias("dl"), "positions")
        if with_positions
        else F.struct("doc_id", "tf", F.col("len").alias("dl"))
    )
    grouped = ranked.groupBy("term", "block_id").agg(
        F.sort_array(F.collect_list(entry)).alias("plist"),
        F.min("len").alias("min_dl"),
    )
    doc_ids = F.transform("plist", lambda x: x["doc_id"])
    tfs = F.transform("plist", lambda x: x["tf"])
    # Per-posting doc length is INLINED into the block (impact-ordered-index
    # style): BM25 needs (tf, dl) per posting, and inlining dl makes query
    # scoring join-free — at cluster scale a per-query join of the hit set
    # against a doclen table would dwarf everything else. ~1 varint byte per
    # posting. This generalizes the reference's per-block MinNorm WAND pair
    # (core/search/wand_writer.hpp MinNorm) to exact per-doc norms.
    dls = F.transform("plist", lambda x: x["dl"])
    out = grouped.select(
        "term",
        "block_id",
        F.size("plist").alias("doc_count"),
        F.element_at(doc_ids, 1).alias("first_doc"),
        F.element_at(doc_ids, -1).alias("last_doc"),
        F.array_max(tfs).alias("max_tf"),
        F.col("min_dl").cast("int").alias("min_dl"),
        _pack_delta_varint(doc_ids).alias("docs_bin"),
        _pack_varint(tfs).alias("tfs_bin"),
        _pack_varint(dls).alias("dls_bin"),
        *(
            [_pack_pos(F.transform("plist", lambda x: x["positions"])).alias("pos_bin")]
            if with_positions
            else []
        ),
    )
    return out


def term_stats(postings_flat: DataFrame) -> DataFrame:
    """Per-term corpus stats (reference term_meta docs_count/freq,
    core/formats/formats.hpp:92-108)."""
    return postings_flat.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )

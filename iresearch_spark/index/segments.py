"""Segment store: immutable segments + manifest generations (MVCC).

Reference semantics (SURVEY.md §1.4, §3.1): an index is a metadata
*generation* pointing at immutable segments; every commit publishes
`segments_<gen+1>` atomically and readers pin a generation
(core/index/index_meta.hpp:80-87, index_writer.cpp:2356-2420 two-phase
commit). Production target is Iceberg (snapshot = generation, atomic swap =
commit); this sandbox has no Iceberg jars, so the same contract is
implemented as parquet segment directories + JSON manifests + an atomically
renamed CURRENT pointer. The store API is the seam where an Iceberg catalog
would plug in.

Layout:
    root/
      CURRENT                      -> "manifest-<gen>.json" (atomic rename)
      manifest-<gen>.json          {gen, segments: [...], analyzer, ...}
      segments/<name>/postings/    parquet
      segments/<name>/doclen/      parquet
      segments/<name>/term_stats/  parquet
      segments/<name>/docmap/      parquet (source identity + sha256)
      segments/<name>/lineage/     parquet (per-partition lineage rows)

Each manifest segment entry: {name, docs_count, sum_len, base_doc, bytes}
where base_doc is the segment's global docID offset (contiguous base
assignment exactly like merge_writer's doc_id_map base offsets,
core/index/merge_writer.cpp:1527-1571).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iresearch_spark.analysis.analyzers import Analyzer, TextAnalyzer
from iresearch_spark.index.build import (
    assign_doc_ids,
    doclen_from_partials,
    pack_docs_combined,
    pack_tokens,
    term_stats_from_packed,
    text_py_spec,
    tokenize_stream,
)

TABLES = ("postings", "doclen", "term_stats", "docmap", "lineage")


@dataclass
class SegmentMeta:
    name: str
    docs_count: int  # docs WITH the indexed field (len > 0): stats/idf/avgdl
    sum_len: int
    base_doc: int = 0
    bytes: int = 0
    created_at: float = 0.0
    # Total assigned docID range (input row count incl. zero-token docs).
    # base_doc spacing and merge remapping MUST use this, not docs_count:
    # ids are dense over ALL input rows, so spacing by docs_count would
    # overlap gdoc ranges whenever a doc emits no tokens (empty file,
    # all-stopword content). Reference parity: merge bases are spaced by
    # total segment doc count (core/index/merge_writer.cpp:1527-1571).
    docs_total: int = 0
    # Actual docmap id range [min_doc, max_doc] (r4): base_doc spacing uses
    # the range WIDTH so caller-supplied non-dense / 0-based ids can never
    # produce overlapping gdoc ranges across segments. max_doc = -1 marks
    # a legacy manifest entry (falls back to dense-1-based doc_span
    # spacing, the pre-r4 behavior).
    min_doc: int = 0
    max_doc: int = -1
    # Largest doc length in the segment (r5): lets the engine auto-select
    # the reference's 256-entry tiny-norm BM25 cache exactly when norms
    # fit one byte (bm25.cpp:348-353 picks kNorm2Tiny whenever dl <= 255).
    # -1 marks a legacy manifest entry (unknown -> auto-select disabled).
    max_dl: int = -1

    @property
    def doc_span(self) -> int:
        return self.docs_total or self.docs_count

    def to_dict(self) -> dict:
        return self.__dict__.copy()

    @staticmethod
    def from_dict(d: dict) -> "SegmentMeta":
        return SegmentMeta(**d)


@dataclass
class Manifest:
    gen: int
    segments: list[SegmentMeta] = field(default_factory=list)
    analyzer: str = "text"
    # generation of the live-delete (tombstone) table under root/deletes/,
    # or None when nothing is deleted. Reference: queued removals become a
    # per-segment document mask applied at query time and physically
    # dropped at merge (core/index/index_writer.hpp:381-416).
    deletes_gen: int | None = None

    @property
    def docs_count(self) -> int:
        return sum(s.docs_count for s in self.segments)

    @property
    def sum_len(self) -> int:
        return sum(s.sum_len for s in self.segments)

    @property
    def avg_dl(self) -> float:
        n = self.docs_count
        return (self.sum_len / n) if n else 0.0

    @property
    def max_dl(self) -> int:
        """Largest doc length across segments; -1 when any segment predates
        the field (auto tiny-norm selection then stays off)."""
        if not self.segments or any(s.max_dl < 0 for s in self.segments):
            return -1
        return max(s.max_dl for s in self.segments)


class IndexStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "segments"), exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def _manifest_path(self, gen: int) -> str:
        return os.path.join(self.root, f"manifest-{gen}.json")

    def current(self) -> Manifest:
        cur = os.path.join(self.root, "CURRENT")
        if not os.path.exists(cur):
            return Manifest(gen=0)
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.root, name)) as f:
            d = json.load(f)
        return Manifest(
            gen=d["gen"],
            segments=[SegmentMeta.from_dict(s) for s in d["segments"]],
            analyzer=d.get("analyzer", "text"),
            deletes_gen=d.get("deletes_gen"),
        )

    def commit(self, manifest: Manifest) -> None:
        """Two-phase: write manifest-<gen>, then atomically swing CURRENT
        (reference index_writer Begin/Finish, index_writer.hpp:536-560)."""
        # contiguous base_doc assignment in segment order; global doc =
        # base_doc + segment-local id. Spacing uses each segment's actual
        # id-range WIDTH (min_doc/max_doc) so non-dense or 0-based caller
        # ids stay collision-free; the first segment keeps its ids
        # verbatim. Legacy entries (max_doc sentinel) fall back to the
        # dense-1-based doc_span spacing they were committed under.
        acc: int | None = None
        for s in manifest.segments:
            known = s.max_doc >= s.min_doc and s.max_doc >= 0
            lo = s.min_doc if known else 1
            width = (s.max_doc - s.min_doc + 1) if known else s.doc_span
            if acc is None:
                acc = lo
            s.base_doc = acc - lo
            acc += width
        path = self._manifest_path(manifest.gen)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "gen": manifest.gen,
                    "analyzer": manifest.analyzer,
                    "deletes_gen": manifest.deletes_gen,
                    "segments": [s.to_dict() for s in manifest.segments],
                },
                f,
                indent=1,
            )
        os.replace(tmp, path)
        cur_tmp = os.path.join(self.root, "CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(os.path.basename(path))
        os.replace(cur_tmp, os.path.join(self.root, "CURRENT"))

    # -- segment IO ---------------------------------------------------------

    def seg_path(self, seg: str, table: str) -> str:
        return os.path.join(self.root, "segments", seg, table)

    def read(self, spark: SparkSession, seg: str, table: str) -> DataFrame:
        # doclen is a projection of docmap (which carries `len`) — one less
        # table to write per segment; docs with no emitted tokens are
        # excluded (docs_with_field semantics). Falls back to a physical
        # doclen directory for segments written by older builds.
        if table == "doclen" and not os.path.exists(self.seg_path(seg, "doclen")):
            return (
                spark.read.parquet(self.seg_path(seg, "docmap"))
                .select("doc_id", "len")
                .where(F.col("len") > 0)
            )
        return spark.read.parquet(self.seg_path(seg, table))

    def table_columns(self, spark: SparkSession, seg: str, table: str) -> list[str]:
        """Column names of a committed segment table from the parquet
        footer (pyarrow) — a schema probe without a spark.read per call
        (merge reads K of these just to detect stream mixes; the Spark
        path pays file-listing + schema-inference per segment)."""
        import glob

        path = self.seg_path(seg, table)
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if files:
            import pyarrow.parquet as pq

            return list(pq.read_schema(files[0]).names)
        return self.read(spark, seg, table).columns

    def read_union(self, spark: SparkSession, table: str, segments=None) -> DataFrame:
        """Union of a table across segments with a `segment` column."""
        m = self.current()
        segs = segments or [s.name for s in m.segments]
        dfs = [
            self.read(spark, s, table).withColumn("segment", F.lit(s)) for s in segs
        ]
        out = dfs[0]
        for d in dfs[1:]:
            # allowMissingColumns: a store can mix with_offsets and plain
            # segments (scoring never reads off_bin; absent ones read null)
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    # -- live deletes (tombstones) -------------------------------------------

    def deletes_path(self, gen: int) -> str:
        return os.path.join(self.root, "deletes", f"gen-{gen}")

    def read_deletes(self, spark: SparkSession):
        """Current tombstone table (segment, doc_id) or None."""
        m = self.current()
        if m.deletes_gen is None:
            return None
        return spark.read.parquet(self.deletes_path(m.deletes_gen))

    def remove(self, spark: SparkSession, condemned: DataFrame) -> Manifest:
        """Queue live deletes: `condemned` = (segment, doc_id) rows. Merged
        with any existing tombstones and committed as a new generation —
        the query-time mask analogue of IndexWriter::Remove(filter)
        (core/index/index_writer.hpp:381-416). Deleted docs stay in the
        stats (idf/avgdl) until a merge physically drops them, matching
        the reference's mask-until-consolidation semantics."""
        m = self.current()
        live_segs = [s.name for s in m.segments]
        dels = condemned.select("segment", "doc_id").where(
            F.col("segment").isin(live_segs)
        )
        existing = self.read_deletes(spark)
        if existing is not None:
            dels = dels.unionByName(existing.select("segment", "doc_id"))
        new_gen = m.gen + 1
        dels.distinct().coalesce(1).write.mode("overwrite").parquet(
            self.deletes_path(new_gen)
        )
        m.gen = new_gen
        m.deletes_gen = new_gen
        self.commit(m)
        return m

    def rewrite_deletes_after_merge(
        self, spark: SparkSession, manifest: Manifest, merged_away: list[str]
    ) -> None:
        """Drop tombstones belonging to segments that a merge just removed
        (the merge applied them physically). Mutates `manifest` in place —
        call AFTER bumping manifest.gen, BEFORE commit()."""
        existing = (
            spark.read.parquet(self.deletes_path(manifest.deletes_gen))
            if manifest.deletes_gen is not None
            else None
        )
        if existing is None:
            return
        remaining = existing.where(~F.col("segment").isin(merged_away))
        if remaining.limit(1).count() == 0:
            manifest.deletes_gen = None
            return
        remaining.coalesce(1).write.mode("overwrite").parquet(
            self.deletes_path(manifest.gen)
        )
        manifest.deletes_gen = manifest.gen

    def dir_bytes(self, seg: str) -> int:
        total = 0
        base = os.path.join(self.root, "segments", seg)
        for dirpath, _dirs, files in os.walk(base):
            total += sum(os.path.getsize(os.path.join(dirpath, fn)) for fn in files)
        return total


# ---------------------------------------------------------------------------
# Segment build (the "flush" job)
# ---------------------------------------------------------------------------

LINEAGE_PARTS = 64  # logical lineage partitioning (stable, not physical)


def _lineage(docs: DataFrame, key_cols: list[str], text_col: str = "content") -> DataFrame:
    """Per-logical-partition lineage rows: (part, doc_count, bytes,
    input_hash). part = hash(key) mod LINEAGE_PARTS is *logical* so it is
    stable across cluster sizes; input_hash is an order-free XOR of row
    hashes — recomputable for resume verification (north rule: per-partition
    lineage with sha256-of-inputs)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    part = F.pmod(F.xxhash64(key), F.lit(LINEAGE_PARTS))
    row_hash = F.xxhash64(key, F.col("content_sha256")) if "content_sha256" in docs.columns else F.xxhash64(key)
    sz = F.sum(F.length(text_col)).alias("bytes")
    return (
        docs.withColumn("_part", part)
        .withColumn("_rh", row_hash)
        .groupBy(F.col("_part").alias("part"))
        .agg(
            F.count("*").alias("doc_count"),
            sz,
            F.expr("bit_xor(_rh)").alias("input_hash"),  # order-free deterministic
        )
    )


def _sized_for_write(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Right-size small-table writes (docmap, lineage): a 50k-row docmap
    written through 32 shuffle partitions produced 32 near-empty files,
    and K-segment merges then paid 32*K-file listings+scan tasks on every
    docmap read (guide §6 small-files). When the row count is known,
    coalesce toward IR_DOCMAP_ROWS_PER_FILE rows/file (default 4M ~
    a few hundred MB); unknown counts keep the planner's layout."""
    import os as _os

    if n_rows is None:
        return df
    per_file = int(_os.environ.get("IR_DOCMAP_ROWS_PER_FILE", "4000000"))
    # repartition, NOT coalesce: coalesce(1) would collapse the whole
    # upstream (join/union + projection) into one task; the round-robin
    # exchange of these small rows is cheap and keeps the compute parallel
    return df.repartition(max(1, -(-n_rows // per_file)))


def build_segment(
    spark: SparkSession,
    store: IndexStore,
    docs: DataFrame,
    seg_name: str,
    text_col: str = "content",
    key_cols: list[str] | None = None,
    doc_id_col: str | None = None,
    analyzer: Analyzer | None = None,
    with_positions: bool = True,
    with_offsets: bool = False,
    payload_fn=None,
    commit: bool = True,
) -> SegmentMeta:
    """Build one immutable segment from a document slice and (optionally)
    commit it into the manifest. Idempotent per seg_name: rebuilding
    overwrites the same segment directory before the manifest swap, so a
    crash mid-build never corrupts the committed generation (resume =
    re-run; the committed CURRENT still points at the old manifest).
    with_offsets stores the per-occurrence (char start, length)
    highlighting stream; payload_fn stores caller-supplied per-occurrence
    payload bytes (the generic half of the reference .pay stream,
    formats_10.cpp:166-267) — a batch-vectorized callable
    (tokens, starts, lens) -> sequence of bytes. Both combiner-path only."""
    analyzer = analyzer or TextAnalyzer()
    key_cols = key_cols or ["repo", "path", "commit"]

    inner_cache = None
    n_docs_known: int | None = None
    if doc_id_col is None:
        docs = assign_doc_ids(docs, key_cols, out_col="doc_id", start=1)
        inner_cache = getattr(docs, "_ir_cached_input", None)
        n_docs_known = getattr(docs, "_ir_n_docs", None)
        doc_id_col = "doc_id"
    elif doc_id_col != "doc_id":
        docs = docs.withColumnRenamed(doc_id_col, "doc_id")
    docs = docs.persist()

    # Combiner build (r3): map-side tokenize + local invert + varint-pack
    # partials per input slice, shuffle ONLY packed bytes (~4-6 B/token vs
    # ~30 B/token for struct rows, ~25x fewer rows), then a sorted-stream
    # merge kernel re-blocks at 128 docs. Byte-identical output to the r2
    # token-level pack_tokens path (pinned by tests); partials also carry
    # the per-doc lengths, so docmap no longer re-tokenizes the corpus
    # (the r2 build tokenized twice). Falls back to tokenize_stream +
    # pack_tokens for analyzers without a Python-side spec.
    n_part = spark.sparkContext.defaultParallelism
    partials = None
    if text_py_spec(analyzer) is not None:
        packed, partials = pack_docs_combined(
            docs, analyzer, text_col,
            with_positions=with_positions, with_offsets=with_offsets,
            payload_fn=payload_fn,
            num_partitions=n_part,
        )
        partials = partials.persist()
    else:
        if with_offsets or payload_fn is not None:
            raise ValueError(
                "with_offsets / payload_fn require a combiner-path analyzer "
                "(text_py_spec); both need span-aware tokenization"
            )
        tokens = tokenize_stream(docs, text_col, analyzer, with_positions)
        packed = pack_tokens(tokens, with_positions=with_positions, num_partitions=n_part)
    packed.write.mode("overwrite").parquet(store.seg_path(seg_name, "postings"))
    if inner_cache is not None:
        # the write above materialized the docs cache; assign_doc_ids'
        # intermediate range-partition cache is no longer needed
        inner_cache.unpersist()

    packed_on_disk = spark.read.parquet(store.seg_path(seg_name, "postings"))

    def _write_term_stats():
        term_stats_from_packed(packed_on_disk).repartition(
            max(1, n_part // 4), "term"
        ).sortWithinPartitions("term").write.mode("overwrite").parquet(
            store.seg_path(seg_name, "term_stats")
        )

    # docmap carries the doc length (`len`) so no separate doclen table is
    # written — IndexStore.read(seg, "doclen") projects it back out. On the
    # combiner path the lengths come from the cached partials' doclen
    # side-channel rows (zero extra tokenize passes); fallback path
    # tokenizes once more via the analyzer expression.
    ident_cols = [c for c in docs.columns if c in ("repo", "path", "commit", "lang", "content_sha256", "source")]
    if partials is not None:
        dl_df = doclen_from_partials(partials)
        # the doclen side is (doc_id, len) — 16 B/doc; when the doc count
        # is known (assign_doc_ids collected it anyway) and small enough,
        # broadcast it so the docmap write shuffles NOTHING (guide §3.1 —
        # without stats Spark picked a two-sided shuffle join here).
        # Cluster scale keeps the shuffle join: cap parameterized via env.
        bcast_max = int(os.environ.get("IR_DL_BCAST_MAX", "2000000"))
        if n_docs_known is not None and n_docs_known <= bcast_max:
            dl_df = F.broadcast(dl_df)
        dm = docs.select("doc_id", *ident_cols).join(dl_df, "doc_id").select(
            "doc_id", "len", *ident_cols
        )
    else:
        dl_expr = F.size(
            F.filter(analyzer.raw_tokens(F.col(text_col)), lambda t: analyzer.keep(t))
        ).cast("int")
        dm = docs.select("doc_id", dl_expr.alias("len"), *ident_cols)

    def _write_docmap():
        _sized_for_write(dm, n_docs_known).write.mode("overwrite").parquet(
            store.seg_path(seg_name, "docmap")
        )

    def _write_lineage():
        _lineage(
            docs,
            key_cols if all(c in docs.columns for c in key_cols) else ["doc_id"],
            text_col,
        ).coalesce(1).write.mode("overwrite").parquet(store.seg_path(seg_name, "lineage"))

    # the three side tables are independent (postings are on disk, docs +
    # partials are cached): submit them from driver threads so each job's
    # task tail back-fills the others' idle cores (guide §2.6) instead of
    # paying three sequential job latencies
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(f) for f in (_write_term_stats, _write_docmap, _write_lineage)
        ]
        for fu in futs:
            fu.result()
    if partials is not None:
        partials.unpersist()

    agg = (
        store.read(spark, seg_name, "docmap")
        .agg(
            F.count("*").alias("total"),
            F.count(F.when(F.col("len") > 0, 1)).alias("n"),
            F.coalesce(F.sum("len"), F.lit(0)).alias("s"),
            F.coalesce(F.min("doc_id"), F.lit(0)).alias("lo"),
            F.coalesce(F.max("doc_id"), F.lit(-1)).alias("hi"),
            F.coalesce(F.max("len"), F.lit(0)).alias("mx"),
        )
        .collect()[0]
    )
    meta = SegmentMeta(
        name=seg_name,
        docs_count=int(agg["n"]),
        sum_len=int(agg["s"]),
        bytes=store.dir_bytes(seg_name),
        created_at=time.time(),
        docs_total=int(agg["total"]),
        min_doc=int(agg["lo"]),
        max_doc=int(agg["hi"]),
        max_dl=int(agg["mx"]),
    )
    docs.unpersist()

    if commit:
        m = store.current()
        m.segments = [s for s in m.segments if s.name != seg_name] + [meta]
        m.gen += 1
        m.analyzer = analyzer.name
        store.commit(m)
    return meta


def build_segment_from_tokens(
    spark: SparkSession,
    store: IndexStore,
    tokens: DataFrame,
    docmap: DataFrame,
    seg_name: str,
    analyzer_name: str = "custom",
    with_positions: bool = True,
    commit: bool = True,
) -> SegmentMeta:
    """Build a segment from a PRE-TOKENIZED stream instead of raw docs —
    the hook for analyzers whose token positions Spark arrays cannot
    express (increment-0 / overlapping tokens, reference
    token_attributes::increment, core/analysis/token_attributes.hpp:50-63:
    several terms may share one position).

    tokens: (doc_id, dl, term, pos) rows — multiple terms per (doc_id,
    pos) allowed. docmap: (doc_id, len, ...identity columns) for every doc.
    Lineage is recorded over the docmap rows (no raw text at this seam).
    """
    n_part = spark.sparkContext.defaultParallelism
    packed = pack_tokens(tokens, with_positions=with_positions, num_partitions=n_part)
    packed.write.mode("overwrite").parquet(store.seg_path(seg_name, "postings"))
    packed_on_disk = spark.read.parquet(store.seg_path(seg_name, "postings"))
    term_stats_from_packed(packed_on_disk).repartition(
        max(1, n_part // 4), "term"
    ).sortWithinPartitions("term").write.mode("overwrite").parquet(
        store.seg_path(seg_name, "term_stats")
    )
    docmap.write.mode("overwrite").parquet(store.seg_path(seg_name, "docmap"))
    key = F.col("doc_id").cast("string")
    docmap_src = store.read(spark, seg_name, "docmap")
    docmap_src.withColumn("_part", F.pmod(F.xxhash64(key), F.lit(LINEAGE_PARTS))).withColumn(
        "_rh", F.xxhash64(key, F.col("len"))
    ).groupBy(F.col("_part").alias("part")).agg(
        F.count("*").alias("doc_count"),
        F.sum("len").alias("bytes"),
        F.expr("bit_xor(_rh)").alias("input_hash"),
    ).write.mode("overwrite").parquet(store.seg_path(seg_name, "lineage"))
    agg = docmap_src.agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col("len") > 0, 1)).alias("n"),
        F.coalesce(F.sum("len"), F.lit(0)).alias("s"),
        F.coalesce(F.min("doc_id"), F.lit(0)).alias("lo"),
        F.coalesce(F.max("doc_id"), F.lit(-1)).alias("hi"),
        F.coalesce(F.max("len"), F.lit(0)).alias("mx"),
    ).collect()[0]
    meta = SegmentMeta(
        name=seg_name,
        docs_count=int(agg["n"]),
        sum_len=int(agg["s"]),
        bytes=store.dir_bytes(seg_name),
        created_at=time.time(),
        docs_total=int(agg["total"]),
        min_doc=int(agg["lo"]),
        max_doc=int(agg["hi"]),
        max_dl=int(agg["mx"]),
    )
    if commit:
        m = store.current()
        m.segments = [s for s in m.segments if s.name != seg_name] + [meta]
        m.gen += 1
        m.analyzer = analyzer_name
        store.commit(m)
    return meta


def import_segment(
    spark: SparkSession,
    dst: IndexStore,
    src: IndexStore,
    seg_name: str,
    new_name: str | None = None,
    commit: bool = True,
) -> SegmentMeta:
    """Bulk-import a committed segment from another store (reference
    IndexWriter::Import, core/index/index_writer.cpp:1653): the immutable
    segment tables are copied verbatim — no re-tokenize, no re-pack — and
    registered in the destination manifest (base_doc reassigned at
    commit). Pending deletes on the source segment are refused (the
    reference imports a READER snapshot with its mask already applied;
    consolidate in the source first). Analyzers must match, or the
    destination's queries would tokenize differently than the imported
    postings."""
    import dataclasses
    import shutil

    sm = src.current()
    by = {s.name: s for s in sm.segments}
    if seg_name not in by:
        raise KeyError(f"segment {seg_name!r} not committed in source store")
    dels = src.read_deletes(spark)
    if dels is not None and dels.where(F.col("segment") == seg_name).limit(1).count():
        raise ValueError(
            f"source segment {seg_name!r} has pending deletes; consolidate "
            "the source first (import takes a clean reader snapshot)"
        )
    dm = dst.current()
    if dm.segments and dm.analyzer != sm.analyzer:
        raise ValueError(
            f"analyzer mismatch: destination {dm.analyzer!r} vs source {sm.analyzer!r}"
        )
    new_name = new_name or seg_name
    for t in TABLES:
        sp = src.seg_path(seg_name, t)
        if os.path.exists(sp):
            dp = dst.seg_path(new_name, t)
            if os.path.exists(dp):
                shutil.rmtree(dp)
            shutil.copytree(sp, dp)
    meta = dataclasses.replace(by[seg_name], name=new_name, created_at=time.time())
    if commit:
        m = dst.current()
        m.segments = [s for s in m.segments if s.name != new_name] + [meta]
        if len(m.segments) == 1:
            m.analyzer = sm.analyzer
        m.gen += 1
        dst.commit(m)
    return meta


# ---------------------------------------------------------------------------
# Resume / verification helpers (north rule: resumable from checkpoint with
# per-partition lineage; per-row content-sha256 invariant vs the source)
# ---------------------------------------------------------------------------

def verify_lineage(
    spark: SparkSession,
    store: IndexStore,
    seg_name: str,
    source_docs: DataFrame,
    key_cols: list[str] | None = None,
    text_col: str = "content",
) -> bool:
    """Recompute the per-partition lineage of `source_docs` and compare to
    the lineage rows committed with the segment. Equality proves the
    committed segment was built from exactly this input (doc counts, byte
    sizes, and order-free row hashes all match per logical partition)."""
    key_cols = key_cols or ["repo", "path", "commit"]
    if not all(c in source_docs.columns for c in key_cols):
        key_cols = ["doc_id"]
    expected = {
        (r["part"]): (r["doc_count"], r["bytes"], r["input_hash"])
        for r in _lineage(source_docs, key_cols, text_col).collect()
    }
    got = {
        (r["part"]): (r["doc_count"], r["bytes"], r["input_hash"])
        for r in store.read(spark, seg_name, "lineage").collect()
    }
    return expected == got


def verify_sha_invariant(
    spark: SparkSession,
    store: IndexStore,
    seg_name: str,
    source_docs: DataFrame,
    key_cols: list[str] | None = None,
    text_col: str = "content",
) -> int:
    """Per-row invariant: every docmap row's content_sha256 must equal
    sha256(source content) for the same (key) row. Returns the number of
    violating rows (0 = invariant holds)."""
    key_cols = key_cols or ["repo", "path", "commit"]
    if not all(c in source_docs.columns for c in key_cols):
        key_cols = ["doc_id"]
    docmap = store.read(spark, seg_name, "docmap")
    if "content_sha256" not in docmap.columns:
        raise ValueError("segment docmap has no content_sha256 column")
    src = source_docs.select(
        *key_cols, F.sha2(F.col(text_col), 256).alias("_expected_sha")
    )
    joined = docmap.join(src, key_cols, "left")
    return joined.where(
        F.col("_expected_sha").isNull()
        | (F.col("_expected_sha") != F.col("content_sha256"))
    ).count()


def build_sliced(
    spark: SparkSession,
    store: IndexStore,
    docs: DataFrame,
    n_slices: int,
    prefix: str = "slice",
    key_cols: list[str] | None = None,
    text_col: str = "content",
    stage: bool = True,
    **build_kw,
) -> list[SegmentMeta]:
    """Resumable sliced corpus build — the 100-TB operational shape: the
    input is hash-partitioned into `n_slices` DETERMINISTIC slices on the
    canonical key, each built and committed as its own segment. Because
    every commit is an atomic manifest generation (the Iceberg-snapshot
    analogue) and slice membership is a pure function of the key, a crashed
    or pre-empted job is resumed by RE-INVOKING with the same arguments:
    slices whose segment is already committed are skipped (their lineage
    rows + sha invariant remain verifiable via verify_lineage /
    verify_sha_invariant), the in-flight slice is rebuilt idempotently, and
    the remainder proceeds. Reference analogue: index_writer commits are
    the recovery points; segments are never partially visible
    (core/index/index_writer.cpp:2356-2420 two-phase commit).

    ONE-PASS staging (r5 VERDICT next-3 — the r5 version filtered the full
    source K times, i.e. K full scans at 100 TB): with stage=True (default)
    the source is scanned ONCE, partitioned on the slice hash and written
    as a slice-partitioned parquet intermediate under the index root; each
    per-slice build then reads back only its own partition directory
    (partition-pruned). The stage is resumable too (Spark's _SUCCESS marker
    gates reuse) and is removed after the last slice commits. stage=False
    keeps the filter-per-slice shape for sources that are ALREADY
    bucket/partitioned on the same hash (e.g. an Iceberg table bucketed on
    the key), where engine-side pruning makes the K filters cheap.

    The slicing spec (n_slices + key_cols) is recorded atomically at
    `<root>/slicespec-<prefix>.json` on first invocation and validated on
    every resume: re-invoking with the same prefix but a different
    n_slices/key_cols raises instead of silently mixing partitionings
    across committed and new segments (r5 ADVICE).

    Returns the metas of the segments built or found committed, slice
    order. For cluster runs size slices so one slice's shuffle fits the
    cluster comfortably (e.g. 0.5-2 TB of input per slice at 10^12-file
    scale)."""
    key_cols = key_cols or ["repo", "path", "commit"]
    spec = {"n_slices": n_slices, "key_cols": list(key_cols)}
    spec_path = os.path.join(store.root, f"slicespec-{prefix}.json")
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            prev = json.load(f)
        if prev != spec:
            raise ValueError(
                f"slice spec mismatch for prefix '{prefix}': committed "
                f"{prev} vs invoked {spec} — resuming would silently mix "
                f"partitionings; use a new prefix or matching arguments"
            )
    else:
        tmp = spec_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(spec, f)
        os.replace(tmp, spec_path)
    committed = {s.name for s in store.current().segments}
    slice_col = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_slices))
    remaining = [
        i for i in range(n_slices) if f"{prefix}{i:05d}" not in committed
    ]
    staged: DataFrame | None = None
    stage_dir = os.path.join(store.root, f"_stage_{prefix}")
    if stage and remaining:
        if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
            # the single source scan: partitionBy writes one directory per
            # slice; an interrupted write leaves no _SUCCESS and is redone
            (
                docs.withColumn("_ir_slice", slice_col)
                .write.partitionBy("_ir_slice")
                .mode("overwrite")
                .parquet(stage_dir)
            )
        staged = spark.read.parquet(stage_dir)
    metas: list[SegmentMeta] = []
    for i in range(n_slices):
        name = f"{prefix}{i:05d}"
        if name in committed:
            metas.append(next(s for s in store.current().segments if s.name == name))
            continue
        if staged is not None:
            # partition-pruned read of ONE slice directory
            part = staged.where(F.col("_ir_slice") == i).drop("_ir_slice")
        else:
            part = docs.where(slice_col == i)
        metas.append(
            build_segment(
                spark, store, part, name,
                text_col=text_col, key_cols=key_cols, **build_kw,
            )
        )
    if stage and os.path.exists(stage_dir):
        import shutil

        shutil.rmtree(stage_dir, ignore_errors=True)
    return metas

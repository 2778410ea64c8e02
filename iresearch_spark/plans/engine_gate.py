"""Engine-backed driver-gate queries: build the packed index over the
driver's documents.parquet ONCE per sf_dir, then answer every gate query
through the real engine path (index/build.py -> segments -> search/executor
mapInPandas kernels), with the existing DuckDB SQL as the oracle.

This closes the r1 VERDICT's headline gap: the correctness gate previously
ran standalone SQL twins (plans/parity.py) that never touched the packed
index. Now each term/boolean/min-match/phrase/prefix/wildcard/range/fuzzy
CORRECTNESS row executes `SearchEngine.topk` over varint-packed posting
blocks — the reference's golden-rank discipline
(tests/search/bm25_test.cpp:144-198) applied to the actual implementation.

Score parity: the engine runs in "precise" (float64) scorer mode
(search/scorers.py PreciseBM25/PreciseTFIDF), which replicates the oracle's
exact double expression tree; both sides round to 6dp before ordering, so
leg-summation-order ulps cannot flip the compare (VERDICT r1 next-1: "or
run the gate kernel in float64").

The index cache lives under /tmp (content-fingerprinted per sf_dir); a
rebuild happens only when the source parquet changes.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STORES: dict[str, object] = {}
_ENGINES: dict[tuple[str, str], object] = {}

CACHE_ROOT = os.environ.get("IR_GATE_CACHE", "/tmp/ir_gate_index")


def _fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of documents.parquet (file names+sizes)."""
    p = os.path.join(sf_dir, "documents.parquet")
    h = hashlib.sha1(sf_dir.encode())
    if os.path.isdir(p):
        for name in sorted(os.listdir(p)):
            fp = os.path.join(p, name)
            h.update(f"{name}:{os.path.getsize(fp)}".encode())
    elif os.path.exists(p):
        h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()[:16]


def _app_id(spark: SparkSession) -> str:
    # cache DataFrame-holding objects per Spark application: a stale engine
    # bound to a stopped session must not be served to a new one
    return spark.sparkContext.applicationId


def gate_store(spark: SparkSession, sf_dir: str):
    """Packed index over {sf_dir}/documents.parquet (built once, cached)."""
    from iresearch_spark.index.segments import IndexStore, build_segment

    key = _fingerprint(sf_dir)
    if key in _STORES:
        return _STORES[key]
    root = os.path.join(CACHE_ROOT, key)
    store = IndexStore(root)
    if not os.path.exists(os.path.join(root, "CURRENT")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        # doc_id comes straight from the table (single segment, base_doc=0),
        # so gdoc == doc_id and results join 1:1 with the oracle's ids
        build_segment(
            spark,
            store,
            docs,
            "gate0",
            text_col="text",
            doc_id_col="doc_id",
        )
    _STORES[key] = store
    return store


def gate_store_deleted(spark: SparkSession, sf_dir: str):
    """A second gate index with live deletes queued (doc_id % 7 == 0):
    certifies the query-time tombstone mask end-to-end (the oracle keeps
    corpus stats over ALL docs and filters only the hit set — the
    reference's mask-until-consolidation semantics)."""
    from iresearch_spark.index.segments import IndexStore, build_segment

    key = _fingerprint(sf_dir) + "-del"
    if key in _STORES:
        return _STORES[key]
    root = os.path.join(CACHE_ROOT, key)
    store = IndexStore(root)
    if not os.path.exists(os.path.join(root, "CURRENT")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        build_segment(spark, store, docs, "gate0", text_col="text", doc_id_col="doc_id")
        victims = docs.where("doc_id % 7 = 0").select(
            F.lit("gate0").alias("segment"), F.col("doc_id")
        )
        store.remove(spark, victims)
    _STORES[key] = store
    return store


def deleted_topk_fn(node_factory, limit: int = 10):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from iresearch_spark.search import SearchEngine
        from iresearch_spark.search.scorers import PreciseBM25

        key = (_app_id(spark), _fingerprint(sf_dir), "del-bm25")
        if key not in _ENGINES:
            _ENGINES[key] = SearchEngine(
                spark, gate_store_deleted(spark, sf_dir), scorer=PreciseBM25()
            )
        return _as_gate_topk(_ENGINES[key].topk(node_factory(), limit))

    return run


def gate_engine(spark: SparkSession, sf_dir: str, scorer_name: str = "bm25", **kw):
    """SearchEngine over the cached gate index with a PRECISE scorer."""
    from iresearch_spark.search import SearchEngine
    from iresearch_spark.search.scorers import PreciseBM25, PreciseTFIDF

    key = (_app_id(spark), _fingerprint(sf_dir), scorer_name, tuple(sorted(kw.items())))
    if key in _ENGINES:
        return _ENGINES[key]
    store = gate_store(spark, sf_dir)
    if scorer_name == "tfidf":
        scorer = PreciseTFIDF(**kw)
    else:
        scorer = PreciseBM25(**kw)
    eng = SearchEngine(spark, store, scorer=scorer)
    _ENGINES[key] = eng
    return eng


def _as_gate_topk(df: DataFrame) -> DataFrame:
    """Engine topk output -> oracle-comparable (doc_id, score)."""
    return df.select(F.col("gdoc").alias("doc_id"), F.col("score"))


def batch_topk_fn(named_factories: dict, limit: int = 10):
    """Registry callable for SearchEngine.topk_batch (r6): a whole batch
    of queries through ONE shared postings scan, returning
    (query, doc_id, score) — each query's rows must equal its individual
    topk exactly (oracle: parity.batch_union_sql)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = gate_engine(spark, sf_dir)
        nodes = {name: f() for name, f in named_factories.items()}
        return eng.topk_batch(nodes, limit).select(
            "query", F.col("gdoc").alias("doc_id"), "score"
        )

    return run


def topk_fn(node_factory, limit: int = 10, scorer: str = "bm25", **scorer_kw):
    """Registry callable: (spark, sf_dir) -> DataFrame(doc_id, score) via
    the packed engine. `node_factory()` builds the filter tree; scorer_kw
    flows into the precise scorer (e.g. k=0.0 for BM1, b=0.0 for BM15)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = gate_engine(spark, sf_dir, scorer, **scorer_kw)
        return _as_gate_topk(eng.topk(node_factory(), limit))

    return run


# ---------------------------------------------------------------------------
# Build-surface gate queries: certify the committed index tables themselves
# against the oracle's tokenize-from-scratch CTEs.
# ---------------------------------------------------------------------------


def doclen_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = gate_store(spark, sf_dir)
    return (
        store.read(spark, "gate0", "doclen")
        .select(F.col("doc_id"), F.col("len").cast("long").alias("dl"))
        .orderBy("doc_id")
    )


def term_stats_fn(spark: SparkSession, sf_dir: str, limit: int = 100) -> DataFrame:
    eng = gate_engine(spark, sf_dir)
    return (
        eng.term_stats.select("term", "doc_freq", "total_tf")
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(limit)
    )


def field_stats_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = gate_engine(spark, sf_dir)
    m = eng.manifest
    avg = m.sum_len / m.docs_count if m.docs_count else 0.0
    import math

    return spark.createDataFrame(
        [(m.docs_count, m.sum_len, math.floor(avg * 1e6 + 0.5) / 1e6)],
        "n_docs long, sum_len long, avg_dl double",
    )


def column_existence_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """by_column_existence over the COMMITTED segment's docmap (the
    columnstore analogue: stored per-doc columns ride in docmap,
    reference core/search/column_existence_filter.cpp)."""
    store = gate_store(spark, sf_dir)
    dm = store.read(spark, "gate0", "docmap")
    return dm.where(F.col("lang").isNotNull()).agg(
        F.count("*").alias("docs_with_lang"),
        F.countDistinct("lang").alias("n_langs"),
    )


def gate_store_pos0(spark: SparkSession, sf_dir: str):
    """Gate index with an INCREMENT-0 (overlapping-token) stream: every
    word contributes all of its char-2-grams AT THE WORD'S POSITION
    (single-char words contribute themselves). Multiple terms share one
    position — the token_attributes::increment == 0 shape
    (core/analysis/token_attributes.hpp:50-63) that by_same_position
    exists for (same_position_filter.cpp:193). 2-grams (not 3) because the
    testdata vocabulary is small: 3-grams determine their word almost
    uniquely, which would collapse same-position back into term presence;
    2-grams collide across words ('rt' in both 'sort' and 'part'), so the
    operator's answer genuinely differs from the conjunction (pinned by
    tests). Built via build_segment_from_tokens since array-based
    analyzers cannot express overlapping positions."""
    from iresearch_spark.index.segments import IndexStore, build_segment_from_tokens

    key = _fingerprint(sf_dir) + "-pos0"
    if key in _STORES:
        return _STORES[key]
    root = os.path.join(CACHE_ROOT, key)
    store = IndexStore(root)
    if not os.path.exists(os.path.join(root, "CURRENT")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        toks = F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9_]+"), lambda t: t != F.lit("")
        )
        words = docs.select(
            "doc_id",
            F.size(toks).cast("int").alias("dl"),
            F.posexplode(toks).alias("pos", "w"),
        )
        grams = F.when(
            F.length("w") >= 2,
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"),
        ).otherwise(F.array("w"))
        tok_rows = words.select(
            "doc_id",
            "dl",
            F.explode(grams).alias("term"),
            F.col("pos").cast("long").alias("pos"),
        )
        docmap = docs.select("doc_id", F.size(toks).cast("int").alias("len"), "lang")
        build_segment_from_tokens(
            spark, store, tok_rows, docmap, "pos0", analyzer_name="word2gram"
        )
    _STORES[key] = store
    return store


def gate_store_offsets(spark: SparkSession, sf_dir: str):
    """Gate index built with the char-offset stream (with_offsets=True) —
    the highlighting payload surface (reference .pay offsets)."""
    from iresearch_spark.index.segments import IndexStore, build_segment

    key = _fingerprint(sf_dir) + "-off"
    if key in _STORES:
        return _STORES[key]
    root = os.path.join(CACHE_ROOT, key)
    store = IndexStore(root)
    if not os.path.exists(os.path.join(root, "CURRENT")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        build_segment(
            spark, store, docs, "off0",
            text_col="text", doc_id_col="doc_id", with_offsets=True,
        )
    _STORES[key] = store
    return store


def highlight_offsets_fn(term: str):
    """Offsets surface, DuckDB-oracled: for every doc containing `term`,
    emit (n_hits = occurrences via the offset stream, n_matches =
    occurrences whose text substring at [start, start+len) equals the
    term). The oracle computes tf per doc from scratch and asserts
    n_hits == n_matches == tf — equality proves both the occurrence COUNT
    and that every stored offset points at the right characters."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from iresearch_spark.search import SearchEngine

        key = (_app_id(spark), _fingerprint(sf_dir), "off")
        if key not in _ENGINES:
            _ENGINES[key] = SearchEngine(spark, gate_store_offsets(spark, sf_dir))
        offs = _ENGINES[key].offsets([term])
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        j = offs.join(docs, offs["gdoc"] == docs["doc_id"])
        matches = F.zip_with(
            "starts",
            "lens",
            lambda s, l: F.lower(F.col("text").substr(s + 1, l)) == F.lit(term),
        )
        return (
            j.select(
                F.col("gdoc").alias("doc_id"),
                F.size("starts").cast("long").alias("n_hits"),
                F.size(F.filter(matches, lambda m: m)).cast("long").alias("n_matches"),
            )
            .orderBy("doc_id")
        )

    return run


def same_position_fn(terms: tuple[str, str], k: int = 100):
    """by_same_position through the engine's positional kernel over the
    increment-0 gram index: docs where some single WORD contains both
    grams (same position), as opposed to the two grams merely co-occurring
    in the doc — the r2 fixture queried a term against itself, which
    degenerates to term presence (r2 VERDICT wrong-2); this one does not,
    and tests pin that it differs from the conjunction."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from iresearch_spark.search import SamePosition, SearchEngine
        from iresearch_spark.search.scorers import PreciseBM25

        key = (_app_id(spark), _fingerprint(sf_dir), "pos0")
        if key not in _ENGINES:
            _ENGINES[key] = SearchEngine(
                spark, gate_store_pos0(spark, sf_dir), scorer=PreciseBM25()
            )
        hits = _ENGINES[key].execute(SamePosition(terms))
        return hits.select(F.col("gdoc").alias("doc_id")).orderBy("doc_id").limit(k)

    return run


def _span_payloads(toks, starts, lens):
    """Deterministic per-occurrence payload bytes b'{token}@{start}' — the
    kind of annotation a real token filter attaches (reference token_stream
    payload attribute, formats_10.cpp:166-267 pay_buf)."""
    return [f"{t}@{s}".encode() for t, s in zip(toks.tolist(), starts.tolist())]


def gate_store_payloads(spark: SparkSession, sf_dir: str):
    """Gate index built with the generic payload stream (payload_fn)."""
    from iresearch_spark.index.segments import IndexStore, build_segment

    key = _fingerprint(sf_dir) + "-pay"
    if key in _STORES:
        return _STORES[key]
    root = os.path.join(CACHE_ROOT, key)
    store = IndexStore(root)
    if not os.path.exists(os.path.join(root, "CURRENT")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        build_segment(
            spark, store, docs, "pay0",
            text_col="text", doc_id_col="doc_id", payload_fn=_span_payloads,
        )
    _STORES[key] = store
    return store


def payload_stream_fn(term: str):
    """Payload surface, DuckDB-oracled like highlight_offsets: for every
    doc containing `term`, emit (n_hits = occurrences via the payload
    stream, n_matches = payloads whose '{token}@{start}' content BOTH names
    the term and points at characters spelling it in the source text). The
    oracle recomputes tf per doc from scratch; equality proves occurrence
    count AND byte-level payload content survive the build."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from iresearch_spark.search import SearchEngine

        key = (_app_id(spark), _fingerprint(sf_dir), "pay")
        if key not in _ENGINES:
            _ENGINES[key] = SearchEngine(spark, gate_store_payloads(spark, sf_dir))
        pays = _ENGINES[key].payloads([term])
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        j = pays.join(docs, pays["gdoc"] == docs["doc_id"])
        dec = F.transform("payloads", lambda b: F.decode(b, "UTF-8"))
        ok = F.transform(
            dec,
            lambda s: (F.substring_index(s, "@", 1) == F.lit(term))
            & (
                F.lower(
                    F.col("text").substr(
                        F.substring_index(s, "@", -1).cast("int") + 1,
                        F.lit(len(term)),
                    )
                )
                == F.lit(term)
            ),
        )
        return (
            j.select(
                F.col("gdoc").alias("doc_id"),
                F.size("payloads").cast("long").alias("n_hits"),
                F.size(F.filter(ok, lambda m: m)).cast("long").alias("n_matches"),
            )
            .orderBy("doc_id")
        )

    return run


def multifield_stores(spark: SparkSession, sf_dir: str):
    """Per-field packed stores over documents(text, source), one shared
    doc-id space (built once, cached) — the multi-field gate fixture."""
    from iresearch_spark.search.multifield import build_multifield

    key = _fingerprint(sf_dir) + "-mf"
    if key in _STORES:
        return _STORES[key]
    root = os.path.join(CACHE_ROOT, key)
    # cache is valid only when EVERY field committed — a crash between the
    # two builds must trigger a rebuild, not poison the cache forever
    if all(
        os.path.exists(os.path.join(root, f"field_{f}", "CURRENT"))
        for f in ("text", "source")
    ):
        from iresearch_spark.index.segments import IndexStore

        stores = {
            f: IndexStore(os.path.join(root, f"field_{f}"))
            for f in ("text", "source")
        }
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        stores = build_multifield(
            spark, root, docs, ["text", "source"], doc_id_col="doc_id"
        )
    _STORES[key] = stores
    return stores


def multifield_and_fn(text_term: str, src_term: str, limit: int = 10):
    """Cross-field conjunction through MultiFieldEngine: BM25(text leg) +
    BM25(source leg), each against its own field's stats."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from iresearch_spark.search import And, Term
        from iresearch_spark.search.multifield import Fielded, MultiFieldEngine
        from iresearch_spark.search.scorers import PreciseBM25

        key = (_app_id(spark), _fingerprint(sf_dir), "mf-eng")
        if key not in _ENGINES:
            _ENGINES[key] = MultiFieldEngine(
                spark, multifield_stores(spark, sf_dir), scorer=PreciseBM25()
            )
        node = And((Fielded("text", Term(text_term)), Fielded("source", Term(src_term))))
        return _as_gate_topk(_ENGINES[key].topk(node, limit))

    return run

"""Query execution: filter tree -> Spark jobs over packed segment tables.

Restates the reference's prepare/execute/iterate lifecycle (SURVEY.md §3.2)
in Spark terms:

  prepare   = tiny driver-side lookups on the (small) term_stats table to
              expand multiterm leaves and compute per-term float32 scoring
              constants (the reference's per-query "stats blob",
              core/search/bm25.cpp:366-410);
  execute   = one job: parquet scan of packed posting blocks with `term IN`
              pushdown -> Arrow mapInPandas kernel that unpacks
              delta+varint blocks and scores them (block-max WAND pruning
              inside the kernel when eligible);
  collect   = boolean combination via groupBy(doc) + kSum, then global
              `ORDER BY score DESC, doc ASC LIMIT k` which Spark compiles to
              TakeOrderedAndProject — per-partition top-k heaps merged on
              the driver, the distributed analogue of the reference's
              caller-side min-heap (utils/index-search.cpp:687-786).

Tie-break parity: score desc, docID asc (the reference's heap uses strict
`<` so earlier docIDs win; iteration is in docID order).
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iresearch_spark.index.codec import unpack_positions, varint_decode, delta_decode
from iresearch_spark.index.segments import IndexStore
from iresearch_spark.search.query import (
    All,
    And,
    Empty,
    Fuzzy,
    Node,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    Term,
    Terms,
    Wildcard,
    normalize,
    wildcard_to_like,
)
from iresearch_spark.search.scorers import BM25, FieldStats, Scorer, TermScorer

SCORE_SCHEMA = StructType(
    [
        StructField("gdoc", LongType()),
        StructField("term", StringType()),
        StructField("score", FloatType()),
    ]
)

POS_SCHEMA = StructType(
    [
        StructField("gdoc", LongType()),
        StructField("term_idx", IntegerType()),
        StructField("tf", IntegerType()),
        StructField("dl", IntegerType()),
        StructField("positions", ArrayType(LongType())),
    ]
)


def _score_kernel(scorers: dict[str, TermScorer], seg_base: dict[str, int], wand_k: int | None):
    """mapInPandas kernel: packed block rows -> (gdoc, term, score).

    With wand_k set (single-leaf top-k), keeps a per-partition k-heap and
    skips whole blocks whose (max_tf, min_dl) upper bound cannot beat the
    running k-th score — reference wanderator block skipping
    (core/formats/formats_10.cpp:2424-2579). Safe across partitions because
    per-partition thresholds only prune, never change survivors' scores;
    the global TakeOrderedAndProject re-merges exactly.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        heap: list[float] = []  # size-k min-heap of scores seen (per partition)

        def threshold() -> float:
            return heap[0] if len(heap) == (wand_k or 0) else float("-inf")

        for pdf in batches:
            out_docs: list[np.ndarray] = []
            out_scores: list[np.ndarray] = []
            out_terms: list[np.ndarray] = []
            for row in pdf.itertuples(index=False):
                sc = scorers[row.term]
                if wand_k is not None:
                    bound = sc.max_score(int(row.max_tf), int(row.min_dl))
                    if len(heap) == wand_k and bound <= threshold():
                        continue  # block-max skip
                docs = delta_decode(varint_decode(row.docs_bin)).astype(np.int64)
                tfs = varint_decode(row.tfs_bin).astype(np.float32)
                dls = varint_decode(row.dls_bin).astype(np.float32)
                scores = sc.scores(tfs, dls)
                gdocs = docs + seg_base.get(row.segment, 0)
                if wand_k is not None:
                    for s in scores:
                        if len(heap) < wand_k:
                            heapq.heappush(heap, float(s))
                        elif s > heap[0]:
                            heapq.heapreplace(heap, float(s))
                out_docs.append(gdocs)
                out_scores.append(scores)
                out_terms.append(np.full(len(gdocs), row.term, dtype=object))
            if out_docs:
                yield pd.DataFrame(
                    {
                        "gdoc": np.concatenate(out_docs),
                        "term": np.concatenate(out_terms),
                        "score": np.concatenate(out_scores),
                    }
                )

    return kernel


def _positions_kernel(term_idx: dict[str, int], seg_base: dict[str, int]):
    """mapInPandas kernel for phrase legs: emit per-posting positions."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"gdoc": [], "term_idx": [], "tf": [], "dl": [], "positions": []}
            for row in pdf.itertuples(index=False):
                docs = delta_decode(varint_decode(row.docs_bin)).astype(np.int64)
                tfs = varint_decode(row.tfs_bin).astype(np.int64)
                dls = varint_decode(row.dls_bin).astype(np.int64)
                poss = unpack_positions(row.pos_bin, tfs)
                base = seg_base.get(row.segment, 0)
                ti = term_idx[row.term]
                for d, tf, dl, p in zip(docs, tfs, dls, poss):
                    rows["gdoc"].append(int(d) + base)
                    rows["term_idx"].append(ti)
                    rows["tf"].append(int(tf))
                    rows["dl"].append(int(dl))
                    rows["positions"].append(p.astype(np.int64))
            if rows["gdoc"]:
                yield pd.DataFrame(rows)

    return kernel


class SearchEngine:
    def __init__(self, spark: SparkSession, store: IndexStore, scorer: Scorer | None = None):
        self.spark = spark
        self.store = store
        self.scorer = scorer or BM25()
        self.manifest = store.current()
        if not self.manifest.segments:
            raise ValueError(f"index at {store.root} has no committed segments")
        self.field = FieldStats(self.manifest.docs_count, self.manifest.sum_len)
        self.seg_base = {s.name: s.base_doc for s in self.manifest.segments}
        self.postings = store.read_union(spark, "postings")
        self.has_positions = "pos_bin" in self.postings.columns
        # index-wide term stats (reference prepare() walks all segments);
        # cached — this is the term dictionary, hit by every query's prepare
        self.term_stats = (
            store.read_union(spark, "term_stats")
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("doc_freq"), F.sum("total_tf").alias("total_tf"))
            .persist()
        )
        self._doclen = store.read_union(spark, "doclen")

    # ------------------------------------------------------------------ util

    def doc_universe(self) -> DataFrame:
        base_map = F.create_map(*[F.lit(x) for kv in sorted(self.seg_base.items()) for x in kv])
        return self._doclen.select(
            (F.col("doc_id") + base_map[F.col("segment")]).alias("gdoc")
        )

    def _stats_for(self, terms: list[str]) -> dict[str, int]:
        """Batched doc_freq lookup: one driver roundtrip for many terms."""
        rows = self.term_stats.where(F.col("term").isin(*terms)).collect()
        return {r["term"]: r["doc_freq"] for r in rows}

    def _collect_expansion(self, df: DataFrame, limit: int) -> list[tuple[str, int]]:
        rows = (
            df.orderBy(F.desc("doc_freq"), F.asc("term")).limit(limit).collect()
        )
        return [(r["term"], r["doc_freq"]) for r in rows]

    def expand(self, leaf: Node) -> list[tuple[str, int]]:
        """Multiterm expansion against the term dictionary (term_stats).

        Top `scored_terms_limit` terms by (doc_freq desc, term asc) — the
        top_terms_collector analogue (core/search/top_terms_collector.hpp).
        """
        ts = self.term_stats
        if isinstance(leaf, Term):
            df = ts.where(F.col("term") == leaf.term)
            return self._collect_expansion(df, 1)
        if isinstance(leaf, Terms):
            df = ts.where(F.col("term").isin(*leaf.terms))
            return self._collect_expansion(df, len(leaf.terms))
        if isinstance(leaf, Prefix):
            df = ts.where(F.col("term").startswith(leaf.prefix))
            return self._collect_expansion(df, leaf.scored_terms_limit)
        if isinstance(leaf, Wildcard):
            df = ts.where(F.col("term").like(wildcard_to_like(leaf.pattern)))
            return self._collect_expansion(df, leaf.scored_terms_limit)
        if isinstance(leaf, Fuzzy):
            df = ts.where(F.levenshtein(F.col("term"), F.lit(leaf.term)) <= leaf.distance)
            return self._collect_expansion(df, leaf.max_terms)
        if isinstance(leaf, Range):
            c = F.col("term")
            cond = F.lit(True)
            if leaf.min_term is not None:
                cond = cond & (c >= leaf.min_term if leaf.include_min else c > leaf.min_term)
            if leaf.max_term is not None:
                cond = cond & (c <= leaf.max_term if leaf.include_max else c < leaf.max_term)
            return self._collect_expansion(ts.where(cond), leaf.scored_terms_limit)
        raise TypeError(f"not an expandable leaf: {leaf}")

    # ------------------------------------------------------ physical pieces

    SCAN_COLS = ("segment", "term", "max_tf", "min_dl", "docs_bin", "tfs_bin", "dls_bin")

    def _scan_scores(
        self, scorers: dict[str, TermScorer], wand_k: int | None = None
    ) -> DataFrame:
        # explicit projection: mapInPandas does not push column pruning into
        # the scan, and pos_bin (the largest column) is not needed to score
        blocks = self.postings.where(F.col("term").isin(*scorers.keys())).select(
            *self.SCAN_COLS
        )
        if wand_k is not None:
            # order blocks most-promising-first inside each partition so the
            # kernel's threshold tightens early (WAND efficiency, not
            # correctness). max_tf desc / min_dl asc approximates the real
            # float32 bound ordering without computing it JVM-side.
            blocks = blocks.sortWithinPartitions(F.desc("max_tf"), F.asc("min_dl"))
        return blocks.mapInPandas(
            _score_kernel(scorers, self.seg_base, wand_k), SCORE_SCHEMA
        )

    def _leaf_scorers(
        self, expansion: list[tuple[str, int]], boost: float
    ) -> dict[str, TermScorer]:
        return {
            t: self.scorer.prepare(self.field, df, boost) for t, df in expansion
        }

    def _leaf_hits(self, leaf: Node, boost: float, wand_k: int | None = None) -> DataFrame:
        """One scoring leaf -> DataFrame(gdoc, score:float). Distinct gdoc."""
        if isinstance(leaf, Phrase):
            return self._phrase_hits(leaf, boost)
        expansion = self.expand(leaf)
        if not expansion:
            return self._empty_hits()
        min_match = leaf.min_match if isinstance(leaf, Terms) else 1
        scored = self._scan_scores(
            self._leaf_scorers(expansion, boost * leaf.boost),
            wand_k if len(expansion) == 1 and min_match <= 1 else None,
        )
        agg = scored.groupBy("gdoc").agg(
            F.sum("score").cast("float").alias("score"),
            F.count("*").alias("_nterms"),
        )
        if min_match > 1:
            agg = agg.where(F.col("_nterms") >= min_match)
        return agg.drop("_nterms")

    def _phrase_hits(self, leaf: Phrase, boost: float) -> DataFrame:
        if not self.has_positions:
            raise ValueError("index built without positions; phrase queries unavailable")
        terms = list(leaf.terms)
        if len(terms) == 1:
            return self._leaf_hits(Term(terms[0], boost=leaf.boost), boost)
        stats = {t: df for t, df in self.expand(Terms(tuple(set(terms))))}
        if any(t not in stats for t in terms):
            return self._empty_hits()
        term_idx = {t: i for i, t in enumerate(dict.fromkeys(terms))}
        blocks = self.postings.where(F.col("term").isin(*term_idx.keys())).select(
            "segment", "term", "docs_bin", "tfs_bin", "dls_bin", "pos_bin"
        )
        pos_df = blocks.mapInPandas(_positions_kernel(term_idx, self.seg_base), POS_SCHEMA)
        uniq = len(term_idx)
        piv = (
            pos_df.groupBy("gdoc", "dl")
            .pivot("term_idx", list(range(uniq)))
            .agg(F.first("positions"))
        )
        cond = F.lit(True)
        for i in range(uniq):
            cond = cond & F.col(str(i)).isNotNull()
        piv = piv.where(cond)
        # phrase occurrences: positions p of term_0 with p+offset_j in
        # positions(term at slot j) for every following slot
        inter = F.col(str(term_idx[terms[0]]))
        for off in range(1, len(terms)):
            ti = term_idx[terms[off]]

            def shift(off: int):
                return lambda x: x - off

            inter = F.array_intersect(inter, F.transform(F.col(str(ti)), shift(off)))
        hits = piv.select(
            "gdoc", "dl", F.size(inter).alias("phrase_tf")
        ).where(F.col("phrase_tf") > 0)
        # phrase scoring: BM25 over phrase_tf with idf = sum of member idfs
        idf_sum = float(np.float32(sum(np.float32(self.scorer.idf(stats[t], self.field)) for t in terms)))
        sc = _PhraseScorerShim(self.scorer, self.field, idf_sum, boost * leaf.boost)

        @F.pandas_udf(FloatType())
        def phrase_score(tf: pd.Series, dl: pd.Series) -> pd.Series:
            return pd.Series(
                sc.scores(tf.to_numpy(np.float32), dl.to_numpy(np.float32))
            )

        return hits.select("gdoc", phrase_score("phrase_tf", "dl").alias("score"))

    def _empty_hits(self) -> DataFrame:
        return self.spark.createDataFrame([], "gdoc long, score float")

    # ------------------------------------------------------------- boolean

    def _eval(self, node: Node, boost: float = 1.0, wand_k: int | None = None) -> DataFrame:
        node = normalize(node)
        if isinstance(node, Empty):
            return self._empty_hits()
        if isinstance(node, All):
            return self.doc_universe().withColumn(
                "score", F.lit(float(np.float32(boost * node.boost))).cast("float")
            )
        if isinstance(node, (Term, Terms, Prefix, Wildcard, Fuzzy, Range, Phrase)):
            return self._leaf_hits(node, boost, wand_k)
        if isinstance(node, Not):
            # lone NOT = all docs minus child (boolean_filter.cpp:83-87)
            child = self._eval(node.child, boost)
            return (
                self.doc_universe()
                .join(child.select("gdoc"), "gdoc", "left_anti")
                .withColumn("score", F.lit(float(np.float32(boost * node.boost))).cast("float"))
            )
        if isinstance(node, And) and any(isinstance(c, Not) for c in node.children):
            # exclusion legs: anti-join, no score contribution
            # (core/search/exclusion.hpp:33; boolean_query.cpp:127-153)
            negs = [c for c in node.children if isinstance(c, Not)]
            poss = tuple(c for c in node.children if not isinstance(c, Not))
            if poss:
                out = self._eval(
                    And(poss, boost=node.boost, const_boost=node.const_boost), boost
                )
            else:  # And(Not x, Not y) -> all docs minus the union
                out = self._eval(All(boost=node.boost), boost)
            for n in negs:
                excl = self._eval(n.child, 1.0)
                out = out.join(excl.select("gdoc"), "gdoc", "left_anti")
            return out
        if isinstance(node, (And, Or)) and all(
            isinstance(c, Term) for c in node.children
        ) and len({c.term for c in node.children}) == len(node.children):
            # flat boolean of distinct exact terms: ONE block scan for all
            # legs instead of a job per leg (cost-ordered conjunction /
            # disjunction specialization collapse into a single shuffle)
            stats = self._stats_for([c.term for c in node.children])
            scorers = {
                c.term: self.scorer.prepare(
                    self.field, stats[c.term], boost * node.boost * c.boost
                )
                for c in node.children
                if c.term in stats
            }
            need = len(node.children) if isinstance(node, And) else node.min_match
            if len(scorers) < (len(node.children) if isinstance(node, And) else 1):
                return self._empty_hits()
            agg = self._scan_scores(scorers).groupBy("gdoc").agg(
                F.sum("score").alias("_s"), F.count("*").alias("_n")
            )
            agg = agg.where(F.col("_n") >= need)
            const = node.const_boost if isinstance(node, And) else 0.0
            score = (F.col("_s") + F.lit(float(np.float32(const * boost)))) if const else F.col("_s")
            return agg.select("gdoc", score.cast("float").alias("score"))
        if isinstance(node, (And, Or)):
            poss = list(node.children)
            legs = [self._eval(c, boost * node.boost).withColumn("_leg", F.lit(i)) for i, c in enumerate(poss)]
            if not legs:
                return self._empty_hits()
            u = legs[0]
            for df in legs[1:]:
                u = u.unionByName(df)
            agg = u.groupBy("gdoc").agg(
                F.sum("score").alias("_s"), F.count("*").alias("_n")
            )
            need = len(poss) if isinstance(node, And) else node.min_match
            agg = agg.where(F.col("_n") >= need)
            const = node.const_boost if isinstance(node, And) else 0.0
            score = (F.col("_s") + F.lit(float(np.float32(const * boost)))) if const else F.col("_s")
            return agg.select("gdoc", score.cast("float").alias("score"))
        raise TypeError(f"unknown node {node}")

    # ---------------------------------------------------------------- API

    def execute(self, node: Node) -> DataFrame:
        """All hits with scores (unordered)."""
        return self._eval(node)

    def topk(self, node: Node, k: int = 10, wand: bool = True) -> DataFrame:
        """Top-k by (score desc, gdoc asc). WAND pruning auto-enables when
        the normalized query is a single exact-term leaf (the eligibility
        the reference requires: a wanderator-capable iterator,
        core/search/term_query.cpp:49-63)."""
        n = normalize(node)
        wand_k = k if (wand and isinstance(n, Term)) else None
        hits = self._eval(n, wand_k=wand_k)
        return hits.orderBy(F.desc("score"), F.asc("gdoc")).limit(k)


class _PhraseScorerShim:
    """BM25/TFIDF evaluation for phrase frequency with precomputed idf."""

    def __init__(self, scorer: Scorer, field: FieldStats, idf: float, boost: float):
        from iresearch_spark.search.scorers import BM25 as _BM25
        from iresearch_spark.search.scorers import (
            BM25TermScorer,
            ConstTermScorer,
            TFIDFTermScorer,
        )

        F32 = np.float32
        if isinstance(scorer, _BM25):
            c0 = F32(boost) * F32(scorer.k + 1) * F32(idf)
            if scorer.k == 0.0:
                self._impl: TermScorer = ConstTermScorer(float(c0))
            else:
                kb = F32(scorer.k) * F32(scorer.b)
                k1b = F32(scorer.k) * F32(1.0 - scorer.b)
                inv = kb / F32(field.avg_dl) if field.avg_dl else F32(0.0)
                self._impl = BM25TermScorer(float(c0), float(k1b), float(inv))
        else:
            self._impl = TFIDFTermScorer(float(F32(boost) * F32(idf)), getattr(scorer, "with_norms", False))

    def scores(self, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        return self._impl.scores(tfs, dls)

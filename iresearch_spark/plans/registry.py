"""Named query registry: every SURVEY.md §2 operator exposed as a
(spark_sql, duck_sql) pair over the driver's parquet tables.

Query terms are pinned to the deterministic testdata vocabulary
(High='batch' df~402, Med='key' df~373, Low='dup' df~25 at sf0.01;
phrase 'part filter' present at all SFs)."""

from __future__ import annotations

from iresearch_spark.plans import parity as P

HIGH, MED, LOW = "batch", "key", "dup"
PHRASE = ["part", "filter"]
PHRASE_MED = ["table", "hash"]


def _pair(fn, *args, **kw):
    return {
        "spark": fn(P.SPARK, *args, **kw),
        "duck": fn(P.DUCK, *args, **kw),
    }


def build_registry() -> dict[str, dict[str, str]]:
    r: dict[str, dict[str, str]] = {}
    # --- index-build surface (invert / stats / norms) ---
    r["doclen"] = _pair(P.doclen_sql)
    r["term_stats"] = _pair(P.term_stats_sql)
    r["field_stats"] = _pair(P.field_stats_sql)
    # --- term / boolean / min-match queries (BM25 top-k) ---
    r["term_high"] = _pair(P.bm25_topk, terms=[HIGH])
    r["term_med"] = _pair(P.bm25_topk, terms=[MED])
    r["term_low"] = _pair(P.bm25_topk, terms=[LOW])
    r["and_high_med"] = _pair(P.bm25_topk, terms=[HIGH, MED], require_all=True)
    r["and_high_low"] = _pair(P.bm25_topk, terms=[HIGH, LOW], require_all=True)
    r["or_high_med"] = _pair(P.bm25_topk, terms=[HIGH, MED])
    r["or_high_low"] = _pair(P.bm25_topk, terms=[HIGH, LOW])
    r["or4"] = _pair(P.bm25_topk, terms=[HIGH, MED, "spark", "window"])
    r["min_match_2of3"] = _pair(P.bm25_topk, terms=[HIGH, MED, LOW], min_match=2)
    r["not_high_minus_med"] = _pair(P.bm25_topk, terms=[HIGH], exclude_terms=[MED])
    # --- multiterm expansions ---
    r["prefix_s"] = _pair(P.bm25_topk, term_pred="tf.term LIKE 's%'")
    r["wildcard"] = _pair(P.bm25_topk, term_pred="tf.term LIKE '%a%n'")
    r["range_q_t"] = _pair(P.bm25_topk, term_pred="tf.term >= 'q' AND tf.term < 't'")
    r["fuzzy_batch"] = _pair(
        P.bm25_topk, term_pred="levenshtein(tf.term, 'batch') <= 1"
    )
    # --- phrase ---
    r["phrase_low"] = _pair(P.phrase_topk, terms=PHRASE)
    r["phrase_med"] = _pair(P.phrase_topk, terms=PHRASE_MED)
    # --- scorer variants ---
    r["tfidf_high"] = _pair(P.tfidf_topk, terms=[HIGH])
    r["tfidf_norms_high"] = _pair(P.tfidf_topk, terms=[HIGH], with_norms=True)
    r["bm15_high_med"] = _pair(P.bm25_variant_topk, terms=[HIGH, MED], k1=1.2, b=0.0)
    r["bm11_high_med"] = _pair(P.bm25_variant_topk, terms=[HIGH, MED], k1=1.2, b=1.0)
    r["bm1_high"] = _pair(P.bm25_variant_topk, terms=[HIGH], k1=0.0, b=0.75)
    # --- structural filters ---
    r["column_existence"] = _pair(P.column_existence_sql)
    r["ngram_similarity"] = _pair(
        P.ngram_similarity_sql, query_terms=["fast", "key", "order", "sort"]
    )
    # --- training-data pipeline ops ---
    r["dedup_exact"] = _pair(P.dedup_exact_sql)
    r["token_quality"] = _pair(P.token_count_sql)
    r["langid"] = _pair(P.langid_sql)
    r["ngram_jaccard_pairs"] = _pair(P.ngram_jaccard_pairs_sql)
    r["fingerprint"] = _pair(P.fingerprint_sql)
    r["quality_stats"] = _pair(P.quality_sql)
    # --- embeddings / similarity search ---
    r["embedding_topk"] = _pair(P.embedding_topk_sql)
    # --- streaming (batch form of the watermarked windowed agg) ---
    r["event_window_stats"] = _pair(P.event_window_sql)

    # --- engine-backed entries (DataFrame ops; rows-only driver check:
    # genuinely non-SQL-expressible — LSH banding and hyperplane probing
    # use seeded RNG streams DuckDB cannot replicate) ---
    def _minhash(spark, sf_dir):
        from iresearch_spark.functions import minhash_lsh_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_lsh_pairs(docs, shingle=2, threshold=0.5)

    def _simhash(spark, sf_dir):
        from iresearch_spark.functions import simhash

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return simhash(docs)

    def _lsh_ann(spark, sf_dir):
        from iresearch_spark.functions import hyperplane_lsh_buckets, lsh_cosine_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where("vec_id = 0").collect()[0]["embedding"]
        dim = len(q)
        bucketed = hyperplane_lsh_buckets(emb, dim, n_planes=8)
        return lsh_cosine_topk(bucketed, list(q), dim, 10, n_planes=8, multiprobe_bits=2)

    r["minhash_lsh_pairs"] = {"fn": _minhash, "duck": None}
    r["simhash_sketch"] = {"fn": _simhash, "duck": None}
    r["ann_lsh_topk"] = {"fn": _lsh_ann, "duck": None}
    return r


REGISTRY = build_registry()

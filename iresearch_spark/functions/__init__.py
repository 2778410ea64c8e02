from iresearch_spark.functions.dedup import (  # noqa: F401
    connected_components,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from iresearch_spark.functions.ngramsim import (  # noqa: F401
    ngram_match_topk,
    ngram_similarity_topk,
)
from iresearch_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    hyperplane_lsh_buckets,
    ivf_build,
    ivf_topk,
    ivf_write_bucketed,
    lsh_cosine_topk,
    release_cached,
)
from iresearch_spark.functions.textstats import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_stats,
)

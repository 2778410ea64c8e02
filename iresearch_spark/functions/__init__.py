from iresearch_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from iresearch_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    hyperplane_lsh_buckets,
    lsh_cosine_topk,
)
from iresearch_spark.functions.textstats import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_stats,
)

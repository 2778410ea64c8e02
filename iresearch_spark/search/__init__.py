from iresearch_spark.search.query import (  # noqa: F401
    All,
    And,
    Empty,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    Term,
    Terms,
    Wildcard,
)
from iresearch_spark.search.scorers import BM25, TFIDF, get_scorer  # noqa: F401
from iresearch_spark.search.executor import SearchEngine  # noqa: F401

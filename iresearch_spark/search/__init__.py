from iresearch_spark.search.query import (  # noqa: F401
    All,
    And,
    Empty,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    Proxy,
    Range,
    SamePosition,
    Term,
    Terms,
    VarPhrase,
    Wildcard,
)
from iresearch_spark.search.scorers import (  # noqa: F401
    BM25,
    TFIDF,
    PreciseBM25,
    PreciseTFIDF,
    get_scorer,
)
from iresearch_spark.search.executor import SearchEngine  # noqa: F401
from iresearch_spark.search.multifield import (  # noqa: F401
    Fielded,
    MultiFieldEngine,
    build_multifield,
)

from iresearch_spark.analysis.analyzers import (  # noqa: F401
    DEFAULT_DELIM_REGEX,
    DEFAULT_STOPWORDS,
    Analyzer,
    DelimiterAnalyzer,
    NgramAnalyzer,
    NormAnalyzer,
    PipelineAnalyzer,
    StringAnalyzer,
    TextAnalyzer,
    get_analyzer,
    register_analyzer,
    tokenize,
)

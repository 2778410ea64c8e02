"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (BM25 top-10 HighTerm at sf0.001)
THROUGH the packed engine: build the inverted index over documents.parquet
(cached per sf_dir), then SearchEngine.topk over varint-packed posting
blocks. `queries()` exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) callables — search/build ops execute the engine
(plans/engine_gate.py), pipeline ops execute the functions/ DataFrame
implementations; `oracle_sql()` carries each entry's DuckDB oracle
(plans/parity.py; engine runs float64 'precise' scorers replicating the
oracle expression tree, both sides round 6dp before ordering).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _register(spark: SparkSession, sf_dir: str, tables=("documents", "embeddings", "events")) -> None:
    import os

    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


def _runner(spark_sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(spark_sql)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for the high-frequency term at sf0.001,
    through the packed engine (build -> segment tables -> WAND kernel)."""
    from iresearch_spark.plans.registry import REGISTRY

    return REGISTRY["term_high"]["fn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from iresearch_spark.plans.registry import REGISTRY

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, pair in REGISTRY.items():
        if "fn" in pair:
            out[name] = pair["fn"]
        else:
            out[name] = _runner(pair["spark"])
    return out


def oracle_sql() -> dict[str, str]:
    from iresearch_spark.plans.registry import REGISTRY

    return {name: pair["duck"] for name, pair in REGISTRY.items() if pair.get("duck")}

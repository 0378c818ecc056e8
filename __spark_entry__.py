"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the paired registry in
``lucille_spark.gate`` — every entry implements an operator from
SURVEY.md §2 as an idiomatic Spark plan plus a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents via the distributed
    DataFrame executor (tokenize → tf/df/avgdl → score → TakeOrdered)."""
    from lucille_spark.gate import bm25_or

    return bm25_or(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lucille_spark import gate

    return dict(gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    from lucille_spark import gate

    return dict(gate.ORACLES)

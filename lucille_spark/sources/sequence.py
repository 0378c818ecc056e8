"""SequenceConnector parity (reference: connector/SequenceConnector.java:1-49):
emit N empty documents with numeric ids (testing/synthetic loads)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sequence_docs(spark: SparkSession, num_docs: int, start_number: int = 0,
                  doc_id_prefix: str = "") -> DataFrame:
    return spark.range(start_number, start_number + num_docs).select(
        F.concat(F.lit(doc_id_prefix), F.col("id").cast("string")).alias("id"))

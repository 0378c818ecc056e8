"""Dense, deterministic doc-ordinal assignment — identical at any parallelism.

Why not ``zipWithIndex`` / ``monotonically_increasing_id``: both depend on the
physical partitioning, so two cluster sizes would produce different ordinals
and therefore different posting lists (breaking the scaling-identity and
resume contracts — SURVEY.md §7.3 hard part (d)).

Scheme: ``doc_id`` is already a uniform hash (sha256 hex). Bucket each doc by
its first hex digits (content-derived → partition-independent), count docs
per bucket, cumsum the counts into bucket base offsets (tiny driver-side
array), then ``doc_ord = base[bucket] + rank_within_bucket(order by doc_id)``.
Buckets are uniformly sized by construction, so the per-bucket sort windows
are balanced; at 10^12 docs raise ``bucket_hex_digits`` so each bucket stays
executor-sized (5 hex digits → ~1M buckets → ~1M docs/bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ord(df: DataFrame, id_col: str = "doc_id",
                   bucket_hex_digits: int = 3) -> DataFrame:
    """Add a dense ``doc_ord`` long column, ordered by (bucket, doc_id)."""
    spark = df.sparkSession
    bucketed = df.withColumn(
        "_bucket", F.conv(F.substring(F.col(id_col), 1, bucket_hex_digits), 16, 10
                          ).cast("long"))
    counts = (
        bucketed.groupBy("_bucket").count().toPandas().sort_values("_bucket")
    )
    counts["base"] = counts["count"].cumsum().shift(fill_value=0)
    bases = spark.createDataFrame(counts[["_bucket", "base"]])
    w = Window.partitionBy("_bucket").orderBy(id_col)
    return (
        bucketed.join(F.broadcast(bases), "_bucket")
        .withColumn("doc_ord", (F.col("base") + F.row_number().over(w) - 1
                                ).cast("long"))
        .drop("_bucket", "base")
    )

"""Benchmark decontamination for training corpora.

The standard recipe (GPT-3 appendix C / PaLM: n-gram collision against
the evaluation sets) as one Spark plan: a document is contaminated when
any of its token n-grams appears in the benchmark's n-gram set.

Scale shape: the benchmark side is eval-set-sized (10^3-10^6 grams —
tiny next to a 100 TB corpus), so the overlap is a BROADCAST semi-join
on the gram string: the corpus side explodes distinct n-grams (narrow,
JVM `shingles_col`), the benchmark gram set builds once, and no
corpus-sized shuffle exists anywhere — each corpus partition streams
through the broadcast hash set. For a benchmark too big to broadcast,
Spark's planner falls back to a hash join on the gram key (still one
shuffle of gram-sized rows, never full documents).

Deviation from the papers (documented): grams are analyzer tokens
joined by single spaces (the same normalization the dedup plane uses),
not raw-byte grams — so the DuckDB gate oracle replays membership
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucille_spark.ml.dedup import shingles_col


def benchmark_grams(benchmark: DataFrame, text_col: str,
                    n: int = 8) -> DataFrame:
    """Distinct n-gram set of the benchmark table: one `gram` column."""
    return (benchmark
            .select(F.explode(shingles_col(text_col, n)).alias("gram"))
            .distinct())


def decontaminate(docs: DataFrame, id_col: str, text_col: str,
                  benchmark: DataFrame, bench_text_col: str,
                  n: int = 8) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every document: ``n_hits`` =
    how many DISTINCT n-grams of the doc appear in the benchmark's
    n-gram set, ``contaminated`` = n_hits > 0. Join the result back (or
    use :func:`clean`) to drop leaked documents before training."""
    grams = benchmark_grams(benchmark, bench_text_col, n)
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles_col(text_col, n)))
        .alias("gram"))
    hits = (doc_grams
            .join(F.broadcast(grams), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_hits")))
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return (ids.join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                    .alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") > 0))


def clean(docs: DataFrame, id_col: str, text_col: str,
          benchmark: DataFrame, bench_text_col: str,
          n: int = 8) -> DataFrame:
    """Docs with every benchmark-colliding document removed — a
    broadcast LEFT ANTI join, the shape you'd run at 100 TB."""
    grams = benchmark_grams(benchmark, bench_text_col, n)
    dirty = (docs.select(F.col(id_col).alias("_did"),
                         F.explode(F.array_distinct(
                             shingles_col(text_col, n))).alias("gram"))
             .join(F.broadcast(grams), "gram")
             .select("_did").distinct())
    return docs.join(dirty, docs[id_col] == dirty["_did"], "left_anti")

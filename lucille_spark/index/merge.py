"""Incremental index merge: bulk upsert/delete into an existing index —
the SolrIndexer/OpenSearchIndexer sendToIndex contract
(/root/reference/lucille-core/.../indexer/SolrIndexer.java:151-245: bulk
add/update + delete-by-id, final state per id = last operation) applied to
the from-scratch index instead of a Solr collection.

Mechanics (Lucene-segment-like):
- new/updated docs get FRESH ordinals above every existing ordinal (dense,
  sha-ordered within the batch), so their posting blocks sort strictly
  after existing blocks per term — append-only postings, no rewrite.
- superseded ordinals (upserts) and deleted doc_ids become tombstones;
  the searcher excludes them everywhere. As in Lucene, corpus statistics
  keep counting tombstoned postings until compaction; corpus_stats
  (N, avgdl) however track LIVE docs exactly.
- avgdl drift safety: blocks record the avgdl their score bounds were
  computed with (``bound_avgdl``); the reader scales bounds by
  max(1, avgdl_now/bound_avgdl) — provably an upper bound (mediant
  inequality), so block-max WAND stays exact across merges.
- ``compact()`` folds tombstones away with a full rebuild over live docs.
"""

from __future__ import annotations

import os
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucille_spark import BLOCK_SIZE
from lucille_spark.analysis import tokenize_col
from lucille_spark.index.builder import (
    POSTINGS_SCHEMA, _Ledger, add_doc_identity, postings_blocks,
)
from lucille_spark.index.ordinals import assign_doc_ord


def merge_index(
    new_corpus: DataFrame,
    index_dir: str,
    fields: Sequence[str] = ("content",),
    deletes: DataFrame | None = None,       # df with doc_id column
    store_positions: bool = True,
    block_size: int = BLOCK_SIZE,
    docs_per_salt: int = 1 << 17,
    run_id: str = "merge-0",
) -> dict:
    """Upsert ``new_corpus`` rows (and apply ``deletes``) into the index."""
    spark = new_corpus.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.time()

    old_stats = {r["field"]: r for r in spark.read.parquet(
        os.path.join(index_dir, "corpus_stats")).collect()}
    doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    max_ord = doc_stats.agg(F.max("doc_ord")).collect()[0][0] or -1

    # delta with fresh ordinals above everything existing
    delta = add_doc_identity(new_corpus)
    delta = assign_doc_ord(delta, "doc_id").withColumn(
        "doc_ord", F.col("doc_ord") + F.lit(max_ord + 1))
    for f_name in fields:
        delta = delta.withColumn(
            f"dl_{f_name}", F.size(tokenize_col(F.col(f_name))).cast("long"))
    delta = delta.persist()

    # tombstones: superseded versions of upserted ids + explicit deletes.
    # (only LIVE rows are tombstoned — re-deleting a dead ord is harmless)
    gone_ids = delta.select("doc_id")
    if deletes is not None:
        gone_ids = gone_ids.unionByName(deletes.select("doc_id"))
    tombs = (doc_stats.join(F.broadcast(gone_ids.distinct()), "doc_id")
             .select("doc_ord", *[f"dl_{f}" for f in fields]))
    tombs_rows = tombs.collect()
    n_tomb = len(tombs_rows)

    # delta stats (one agg)
    agg = delta.agg(
        F.count("*").alias("n"),
        *[F.sum(f"dl_{f}").alias(f"total_{f}") for f in fields]).collect()[0]
    n_delta = int(agg["n"])

    # live corpus stats: subtract tombstoned dls, add delta dls
    cs_rows, avgdl_by_field = [], {}
    for f_name in fields:
        dead_total = sum(r[f"dl_{f_name}"] for r in tombs_rows)
        live_n = int(old_stats[f_name]["n_docs"]) - n_tomb + n_delta
        live_total = (int(old_stats[f_name]["total_terms"]) - dead_total
                      + int(agg[f"total_{f_name}"] or 0))
        avgdl = live_total / live_n if live_n else 0.0
        avgdl_by_field[f_name] = avgdl
        cs_rows.append((f_name, live_n, avgdl, live_total))

    # delta postings appended; blocks carry bound_avgdl = avgdl_new
    blocks = postings_blocks(
        delta, fields, avgdl_by_field, ord_span=max_ord + 1 + n_delta,
        block_size=block_size, docs_per_salt=docs_per_salt,
        store_positions=store_positions)
    (blocks.repartitionByRange(
        max(spark.sparkContext.defaultParallelism, 8), "field", "term")
     .sortWithinPartitions("field", "term", "salt", "block_seq")
     .write.mode("append").parquet(os.path.join(index_dir, "postings")))

    # append doc_stats rows for the delta
    stat_cols = ["doc_id", "doc_ord"] + [f"dl_{f}" for f in fields] + [
        c for c in ("repo", "path", "commit", "lang")
        if c in new_corpus.columns] + ["content_sha256"]
    delta.select(*stat_cols).write.mode("append").parquet(
        os.path.join(index_dir, "doc_stats"))

    # tombstones + corpus_stats + lexicon rebuild (tiny agg over postings)
    if n_tomb:
        spark.createDataFrame([(int(r["doc_ord"]),) for r in tombs_rows],
                              "doc_ord long").write.mode("append").parquet(
            os.path.join(index_dir, "_tombstones"))
    spark.createDataFrame(
        cs_rows, "field string, n_docs long, avgdl double, total_terms long"
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "corpus_stats"))

    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    lexicon = (postings.groupBy("field", "term")
               .agg(F.sum("n_docs").cast("long").alias("df"),
                    F.sum("sum_tf").cast("long").alias("cf"),
                    F.count("*").cast("int").alias("n_blocks"),
                    F.max("block_max_tfnorm").alias("max_tfnorm"),
                    F.min("bound_avgdl").alias("bound_avgdl")))
    lexicon.write.mode("overwrite").parquet(os.path.join(index_dir, "lexicon"))

    _Ledger(spark, index_dir, run_id).record(
        "merge", n_delta, t0)
    delta.unpersist()
    spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    return {"added": n_delta, "tombstoned": n_tomb,
            "avgdl": avgdl_by_field}


def compact(index_dir: str, live_corpus: DataFrame, out_dir: str,
            fields: Sequence[str] = ("content",), **kwargs) -> dict:
    """Fold tombstones away: full rebuild of the index over the live corpus
    (the Lucene segment-merge equivalent). The caller supplies the live
    corpus (content is not stored in the index tables)."""
    from lucille_spark.index.builder import build_index

    return build_index(live_corpus, out_dir, fields=fields, **kwargs)

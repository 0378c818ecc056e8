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
import shutil
import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucille_spark import BLOCK_SIZE
from lucille_spark.analysis import tokenize_col
from lucille_spark.index.builder import (
    POSTINGS_SCHEMA, _Ledger, add_doc_identity, postings_blocks,
    write_corpus_stats, write_index_meta,
)
from lucille_spark.index.ordinals import assign_doc_ord


from lucille_spark.index.reader import recover_lexicon as _recover_lexicon


def merge_index(
    new_corpus: DataFrame,
    index_dir: str,
    fields: Sequence[str] = ("content",),
    deletes: DataFrame | None = None,       # df with doc_id column
    store_positions: bool = True,
    block_size: int = BLOCK_SIZE,
    docs_per_salt: int = 1 << 17,
    run_id: str = "merge-0",
    order_col: Optional[str] = None,
) -> dict:
    """Upsert ``new_corpus`` rows (and apply ``deletes``) into the index.

    Duplicate doc_ids WITHIN the batch collapse to one row before ordinal
    assignment (otherwise the ordinal join-back would multiply rows and
    double postings): last write wins by ``order_col`` when given (a source
    offset/sequence column — Indexer.java sendToIndex order), else by a
    deterministic content_sha256 tiebreak.
    """
    spark = new_corpus.sparkSession
    _recover_lexicon(index_dir)
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.time()

    # corpus_stats is a driver-written handful-of-rows table
    # (write_small_parquet): read it driver-side — launching a Spark job
    # costs ~0.3-0.5 s of scheduling per micro-batch for a 1-row read
    import pyarrow.dataset as _ds

    old_stats = {r["field"]: r for r in _ds.dataset(
        os.path.join(index_dir, "corpus_stats"),
        ignore_prefixes=[".", "_"]).to_table().to_pylist()}
    doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    # ordinal high-water mark from _meta (1-row read) — scanning the
    # corpus-sized doc_stats for max(doc_ord) on every microbatch is the
    # kind of O(index) step this path must not have
    from lucille_spark.index.reader import read_meta

    meta = read_meta(index_dir)
    if meta is not None:
        max_ord = int(meta["ord_span"]) - 1
    else:
        max_ord = doc_stats.agg(F.max("doc_ord")).collect()[0][0] or -1

    # delta rows (ordinals attached AFTER the stats job below, so the
    # batch size can pick the cheap ordinal path)
    delta = add_doc_identity(new_corpus)
    order_expr = (F.col(order_col).desc_nulls_last() if order_col
                  else F.col("content_sha256").desc())
    w = Window.partitionBy("doc_id").orderBy(order_expr)
    delta = (delta.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1).drop("_rn"))
    for f_name in fields:
        delta = delta.withColumn(
            f"dl_{f_name}", F.size(tokenize_col(F.col(f_name))).cast("long"))
    delta_base = delta = delta.persist()

    # tombstones: superseded versions of upserted ids + explicit deletes.
    # Only LIVE rows are tombstoned: doc_stats is append-only, so a doc_id
    # upserted twice has a dead row whose ordinal is ALREADY in _tombstones —
    # counting it again would re-subtract its dl and corrupt corpus_stats
    # (n_docs/avgdl and hence every idf). Anti-join the existing tombstones.
    gone_ids = delta.select("doc_id")
    if deletes is not None:
        gone_ids = gone_ids.unionByName(deletes.select("doc_id"))
    tomb_dir = os.path.join(index_dir, "_tombstones")
    live_stats = doc_stats
    if os.path.exists(tomb_dir):
        dead = spark.read.parquet(tomb_dir).select("doc_ord").distinct()
        live_stats = doc_stats.join(dead, "doc_ord", "left_anti")
    # localCheckpoint: the doc_stats append below invalidates any cached
    # plan that reads the doc_stats path, and a recompute after the append
    # would see the delta's fresh rows and tombstone them — checkpointing
    # severs the lineage so the pre-append snapshot is final. LAZY
    # (eager=False): the combined stats job below is the first action, so
    # materializing here would just spend an extra Spark job per
    # micro-batch on the same work (guide §1.2: fewer passes).
    tombs = (live_stats.join(F.broadcast(gone_ids.distinct()), "doc_id")
             .select("doc_ord", *[f"dl_{f}" for f in fields])
             ).localCheckpoint(eager=False)

    # ONE combined stats job for what used to be three (checkpoint
    # materialize + tombstone agg + delta agg): a micro-batch pays
    # ~0.3-0.5 s of scheduling per Spark job, which dominates 100-doc
    # merges. The union also materializes the delta cache and the
    # tombstone checkpoint in the same pass.
    stats_u = (delta.select(
        F.lit(1).alias("_is_delta"),
        *[F.col(f"dl_{f}").alias(f"dl_{f}") for f in fields])
        .unionByName(tombs.select(
            F.lit(0).alias("_is_delta"),
            *[F.col(f"dl_{f}") for f in fields])))
    srows = {int(r["_is_delta"]): r for r in (
        stats_u.groupBy("_is_delta").agg(
            F.count("*").alias("n"),
            *[F.sum(f"dl_{f}").alias(f"total_{f}") for f in fields])
        .collect())}
    _empty = {"n": 0, **{f"total_{f}": 0 for f in fields}}
    agg = srows.get(1, _empty)
    tomb_agg = srows.get(0, _empty)
    n_tomb = int(tomb_agg["n"])
    n_delta = int(agg["n"])

    # fresh ordinals above everything existing. (r7 note: a "cheap"
    # global-window rank — provably the same ordinals, since the bucket
    # prefix is monotone in doc_id — was tried for small batches and
    # REJECTED on measurement: the SinglePartition exchange it forces
    # under the postings plan made the 100-doc postings write 16-20 s vs
    # 3.2-3.6 s with the bucketed path.)
    delta = assign_doc_ord(delta, "doc_id")
    delta = delta.withColumn("doc_ord", F.col("doc_ord") + F.lit(max_ord + 1))

    # live corpus stats: subtract tombstoned dls, add delta dls
    cs_rows, avgdl_by_field = [], {}
    for f_name in fields:
        dead_total = int(tomb_agg[f"total_{f_name}"] or 0)
        live_n = int(old_stats[f_name]["n_docs"]) - n_tomb + n_delta
        live_total = (int(old_stats[f_name]["total_terms"]) - dead_total
                      + int(agg[f"total_{f_name}"] or 0))
        avgdl = live_total / live_n if live_n else 0.0
        avgdl_by_field[f_name] = avgdl
        cs_rows.append((f_name, live_n, avgdl, live_total))

    # delta postings appended; blocks carry bound_avgdl = avgdl_new.
    # Persisted so the incremental lexicon below aggregates the DELTA blocks
    # only (block rows are compressed binary — tiny relative to the corpus).
    # The delta's token totals were just aggregated: a micro-batch whose
    # total is <= docs_per_salt provably has no hot term, so
    # postings_blocks skips the hot-table job outright (one Spark job per
    # batch on the streaming path).
    micro = n_delta * len(fields) <= 1 << 16
    blocks = postings_blocks(
        delta, fields, avgdl_by_field, ord_span=max_ord + 1 + n_delta,
        block_size=block_size, docs_per_salt=docs_per_salt,
        store_positions=store_positions,
        totals_by_field={f: int(agg[f"total_{f}"] or 0) for f in fields},
        single_partition_encode=micro).persist()
    if micro:
        # micro-batch fast path (guide §1.2/§6): the delta is shuffled to
        # ONE partition and block-encoded by the vectorized
        # single-partition kernel (builder._encode_single_partition_factory
        # — no per-group Python, ~10 ms for a 100-doc delta where the
        # per-group route paid ~2 s), then written as one term-sorted
        # file: no boundary-sampling pass, no small-file accretion, and
        # the row-group pruning layout is preserved by the sort.
        (blocks.sortWithinPartitions("field", "term", "salt", "block_seq")
         .write.mode("append").parquet(os.path.join(index_dir, "postings")))
    else:
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
        tombs.select("doc_ord").write.mode("append").parquet(
            os.path.join(index_dir, "_tombstones"))
    write_corpus_stats(os.path.join(index_dir, "corpus_stats"), cs_rows)

    # incremental lexicon: aggregate the DELTA blocks only and fold into the
    # existing lexicon (df/cf/n_blocks are additive across blocks,
    # max_tfnorm a max, bound_avgdl a min). The old full-postings rescan made
    # every streaming microbatch O(index); this is O(delta + lexicon).
    delta_lex = (blocks.groupBy("field", "term")
                 .agg(F.sum("n_docs").cast("long").alias("df"),
                      F.sum("sum_tf").cast("long").alias("cf"),
                      F.count("*").cast("long").alias("n_blocks"),
                      F.max("block_max_tfnorm").alias("max_tfnorm"),
                      F.min("bound_avgdl").alias("bound_avgdl")))
    lex_dir = os.path.join(index_dir, "lexicon")
    old_lex = spark.read.parquet(lex_dir).withColumn(
        "n_blocks", F.col("n_blocks").cast("long"))
    merged_lex = (old_lex.unionByName(delta_lex)
                  .groupBy("field", "term")
                  .agg(F.sum("df").cast("long").alias("df"),
                       F.sum("cf").cast("long").alias("cf"),
                       F.sum("n_blocks").cast("int").alias("n_blocks"),
                       F.max("max_tfnorm").alias("max_tfnorm"),
                       F.min("bound_avgdl").alias("bound_avgdl")))
    # can't overwrite a path being read → write aside, then swap.
    # Crash-safe order (ADVICE r2): rename the live dir ASIDE first, then
    # tmp into place, then drop the aside copy — at no point is the index
    # without a recoverable lexicon (_recover_lexicon restores from
    # lexicon_old if a crash lands between the renames). On an object
    # store / Iceberg this is a snapshot commit instead.
    lex_tmp = lex_dir + "_tmp"
    lex_old = lex_dir + "_old"
    merged_lex.write.mode("overwrite").parquet(lex_tmp)
    shutil.rmtree(lex_old, ignore_errors=True)
    os.rename(lex_dir, lex_old)
    os.rename(lex_tmp, lex_dir)
    shutil.rmtree(lex_old, ignore_errors=True)
    blocks.unpersist()

    write_index_meta(spark, index_dir, ord_span=max_ord + 1 + n_delta,
                     run_id=run_id)
    _Ledger(spark, index_dir, run_id).record(
        "merge", n_delta, t0)
    delta_base.unpersist()
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

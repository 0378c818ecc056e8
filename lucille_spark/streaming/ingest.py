"""Streaming ingest: the reference's Kafka-decoupled Connector -> Worker ->
Indexer topology (SURVEY.md §2.8, §3.3) as Structured Streaming.

Mapping of the reference's guarantees:
- Kafka topics between components  -> the streaming source + shuffle
  (doc/site/.../message-ordering.md:23-31: per-doc order via keying — here
  per-id order within a microbatch is enforced by last-write-wins in the
  idempotent sink)
- at-least-once + idempotent upsert (core/Indexer.java:419-424, offset
  commits core/Worker.java:188-197) -> checkpointed source offsets +
  IndexSink.upsert keyed by id
- batch flush by count/timeout (core/Indexer.java:105-108) -> trigger
  interval / availableNow microbatches
- lifecycle events CREATE/FINISH (core/Event.java:22) -> per-batch metrics
  rows appended to ``_metrics``

Works with any streaming source; file-source and rate-source are wired
here, Kafka is ``format("kafka")`` with the same downstream code.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucille_spark.pipeline import Pipeline
from lucille_spark.sinks.index_sink import IndexSink


class StreamingIngest:
    def __init__(self, spark: SparkSession, pipeline: Pipeline,
                 sink: IndexSink, checkpoint_dir: str,
                 metrics_dir: Optional[str] = None, run_id: str = "stream-0",
                 failed_dir: Optional[str] = None):
        self.spark = spark
        self.pipeline = pipeline
        self.sink = sink
        self.checkpoint_dir = checkpoint_dir
        self.metrics_dir = metrics_dir
        self.run_id = run_id
        # dead-letter quarantine (core/Worker.java:97-114: a doc whose
        # stage processing throws goes to the DLQ topic instead of killing
        # the worker). Vectorized pipelines fail per-BATCH, so the unit of
        # quarantine is the microbatch: its raw rows land in ``_failed``
        # as JSON with the error, and the stream keeps running.
        self.failed_dir = failed_dir

    def _quarantine(self, batch_df: DataFrame, batch_id: int,
                    err: Exception) -> None:
        if not self.failed_dir:
            raise err
        quarantined = batch_df.select(
            F.to_json(F.struct(*[F.col(c) for c in batch_df.columns])
                      ).alias("doc_json"),
            F.lit(self.run_id).alias("run_id"),
            F.lit(int(batch_id)).alias("batch_id"),
            F.lit(f"{type(err).__name__}: {err}").alias("error"),
            F.current_timestamp().alias("failed_at"))
        quarantined.write.mode("append").parquet(
            os.path.join(self.failed_dir, "_failed"))

    def _foreach_batch(self) -> Callable:
        pipeline, sink = self.pipeline, self.sink
        metrics_dir, run_id = self.metrics_dir, self.run_id

        def process(batch_df: DataFrame, batch_id: int):
            t0 = time.time()
            try:
                out = pipeline.finish(batch_df)
                res = sink.upsert(out)
                status, n_rows = "complete", int(res["rows"])
            except Exception as e:   # noqa: BLE001 — quarantine, don't die
                self._quarantine(batch_df, batch_id, e)
                status, n_rows = "failed_quarantined", 0
            if metrics_dir:
                batch_df.sparkSession.createDataFrame(
                    [(run_id, int(batch_id), n_rows,
                      time.time() - t0, status)],
                    "run_id string, batch_id long, n_rows long, "
                    "seconds double, status string",
                ).write.mode("append").parquet(metrics_dir)

        return process

    def from_kafka(self, bootstrap_servers: str, topic: str, schema: str,
                   starting_offsets: str = "earliest",
                   available_now: bool = True):
        """Kafka source with the SAME downstream foreachBatch code path as
        the file source (the reference's Connector->Kafka->Worker topology,
        message-ordering.md:23-31: per-doc order via doc-id keying —
        enforced here by last-write-wins in the idempotent sink/merge).

        Sandbox waiver (re-verified 2026-08-17, round 4): this container
        has no network (maven unreachable), no ivy-cached
        spark-sql-kafka jar, and no broker, so this path cannot be
        integration-tested here; on a cluster submit with
        ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
        The file-source variant exercises every line downstream of the
        source swap (tests/test_sources_sinks.py), and
        tests/test_round4_fixes.py asserts the exact reader topology this
        method constructs (format/options/projection) against a recorded
        builder, so a connector-jar regression would be caught without a
        broker."""
        stream = (self.spark.readStream.format("kafka")
                  .option("kafka.bootstrap.servers", bootstrap_servers)
                  .option("subscribe", topic)
                  .option("startingOffsets", starting_offsets)
                  .load()
                  .select(F.from_json(F.col("value").cast("string"),
                                      schema).alias("doc"))
                  .select("doc.*"))
        writer = (stream.writeStream
                  .foreachBatch(self._foreach_batch())
                  .option("checkpointLocation", self.checkpoint_dir))
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return q
        return writer.start()

    def from_json_files(self, input_dir: str, schema: str,
                        available_now: bool = True):
        """File-source stream: each new file in input_dir is a microbatch
        of JSONL documents (the FileConnector 'runDuration/refreshIncrement'
        loop, RSSConnector-style incremental publish — SURVEY.md §2.1)."""
        stream = (self.spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 16).json(input_dir))
        writer = (stream.writeStream
                  .foreachBatch(self._foreach_batch())
                  .option("checkpointLocation", self.checkpoint_dir))
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return q
        return writer.start()


class StreamingIndexer(StreamingIngest):
    """Continuous search indexing: each microbatch is upserted into the
    LIVE index via the incremental merge (index/merge.py) — the
    streaming-mode equivalent of the reference's Worker->Indexer->Solr
    topology, except the 'Solr' half is our own index tables, and documents
    become searchable after every microbatch commit.

    Delete markers: rows where ``delete_marker_field`` is truthy become
    tombstones instead of upserts (core/Indexer.java:132-135)."""

    def __init__(self, spark: SparkSession, pipeline: Pipeline,
                 index_dir: str, checkpoint_dir: str,
                 corpus_cols=("repo", "path", "commit", "lang", "content"),
                 delete_marker_field: Optional[str] = None,
                 fields=("content",), metrics_dir: Optional[str] = None,
                 run_id: str = "stream-idx-0", **merge_kwargs):
        super().__init__(spark, pipeline, sink=None,
                         checkpoint_dir=checkpoint_dir,
                         metrics_dir=metrics_dir, run_id=run_id)
        self.index_dir = index_dir
        self.corpus_cols = list(corpus_cols)
        self.fields = tuple(fields)
        self.delete_marker_field = delete_marker_field
        self.merge_kwargs = merge_kwargs

    def _foreach_batch(self) -> Callable:
        pipeline = self.pipeline
        index_dir, fields = self.index_dir, self.fields
        cols, marker = self.corpus_cols, self.delete_marker_field
        metrics_dir, run_id = self.metrics_dir, self.run_id
        merge_kwargs = self.merge_kwargs

        def process(batch_df: DataFrame, batch_id: int):
            from lucille_spark.index.builder import add_doc_identity
            from lucille_spark.index.merge import merge_index

            t0 = time.time()
            out = pipeline.finish(batch_df)
            deletes = None
            if marker and marker in out.columns:
                is_del = F.coalesce(
                    F.col(marker).cast("string") == "true", F.lit(False))
                deletes = add_doc_identity(
                    out.filter(is_del)).select("doc_id")
                out = out.filter(~is_del)
            corpus = out.select(*cols)
            if not os.path.exists(os.path.join(index_dir, "corpus_stats")):
                # bootstrap: the first microbatch creates the index.
                # Dedup per doc_id first (merge_index does this itself for
                # later batches): duplicate ids would multiply rows through
                # the ordinal join-back and double postings.
                from pyspark.sql import Window

                from lucille_spark.index.builder import (add_doc_identity,
                                                         build_index)

                ident = add_doc_identity(corpus)
                w = Window.partitionBy("doc_id").orderBy(
                    F.col("content_sha256").desc())
                corpus = (ident.withColumn("_rn", F.row_number().over(w))
                          .filter(F.col("_rn") == 1)
                          .drop("_rn", "doc_id", "content_sha256"))
                build_index(corpus, index_dir, fields=fields,
                            run_id=f"{run_id}-b{batch_id}", **merge_kwargs)
                res = {"added": -1, "tombstoned": 0}
            else:
                res = merge_index(corpus, index_dir, fields=fields,
                                  deletes=deletes,
                                  run_id=f"{run_id}-b{batch_id}",
                                  **merge_kwargs)
            if metrics_dir:
                batch_df.sparkSession.createDataFrame(
                    [(run_id, int(batch_id), int(res["added"]),
                      int(res["tombstoned"]), time.time() - t0, "complete")],
                    "run_id string, batch_id long, n_added long, "
                    "n_tombstoned long, seconds double, status string",
                ).write.mode("append").parquet(metrics_dir)

        return process

"""Indexer-semantics sink: the abstract Indexer contract from the reference
(core/Indexer.java:103-603) applied to our own index/doc tables instead of a
Solr/ES bulk API.

Matched semantics:
- id override field (core/Indexer.java:513-521) — a column whose value
  replaces the doc id before writing
- field whitelist/blacklist (util/FieldFilter.java:10-20, applied at
  core/Indexer.java:531-537)
- deletion markers (core/Indexer.java:132-135,215-224): rows whose
  ``delete_marker_field == delete_marker_value`` become deletes, not upserts
- routing field (OpenSearchIndexer.java:353-354) -> repartition on it so
  co-routed docs land in the same output task/file
- batch size (core/Indexer.java:105) -> maxRecordsPerFile
- idempotent upsert-by-id: last-write-wins against the existing table
  (the Kafka at-least-once + idempotent-upsert story, Indexer.java:419-424)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class IndexSink:
    def __init__(self, table_dir: str, id_col: str = "id",
                 id_override_field: Optional[str] = None,
                 include_fields: Optional[Sequence[str]] = None,
                 exclude_fields: Optional[Sequence[str]] = None,
                 delete_marker_field: Optional[str] = None,
                 delete_marker_value: str = "true",
                 routing_field: Optional[str] = None,
                 batch_size: int = 100_000,
                 order_field: Optional[str] = None,
                 n_buckets: int = 64):
        self.table_dir = table_dir
        self.id_col = id_col
        self.id_override_field = id_override_field
        self.include_fields = include_fields
        self.exclude_fields = exclude_fields
        self.delete_marker_field = delete_marker_field
        self.delete_marker_value = delete_marker_value
        self.routing_field = routing_field
        self.batch_size = batch_size
        # explicit intra-batch ordering column (source offset / sequence /
        # ingest timestamp): "last write wins" must mean last in SOURCE
        # order, not last in physical partition order — after any upstream
        # shuffle, monotonically_increasing_id encodes partition layout,
        # which picks an arbitrary winner (Indexer.java sendToIndex order).
        self.order_field = order_field
        # the doc table is hash-partitioned by pmod(xxhash64(id), n_buckets)
        # so upserts rewrite ONLY the buckets containing changed ids —
        # O(delta × table/n_buckets), not O(table) per microbatch. On
        # Iceberg/Delta this whole method is a single MERGE INTO.
        self.n_buckets = n_buckets

    def _bucket_col(self):
        return F.pmod(F.xxhash64(F.col(self.id_col).cast("string")),
                      F.lit(self.n_buckets)).cast("int")

    def _prepare(self, df: DataFrame) -> DataFrame:
        if self.id_override_field and self.id_override_field in df.columns:
            df = df.withColumn(
                self.id_col,
                F.coalesce(F.col(self.id_override_field).cast("string"),
                           F.col(self.id_col)))
        if self.include_fields:
            keep = [c for c in df.columns
                    if c in set(self.include_fields) or c == self.id_col
                    or c == self.delete_marker_field]
            df = df.select(*keep)
        if self.exclude_fields:
            df = df.drop(*[c for c in self.exclude_fields
                           if c != self.id_col and c in df.columns])
        return df

    def upsert(self, df: DataFrame) -> dict:
        """Idempotent bulk upsert + deletes into the parquet doc table.

        Equivalent of one SolrIndexer.sendToIndex flush cycle
        (indexer/SolrIndexer.java:151-245): deletes and adds applied so the
        final state per id reflects the LAST operation in this batch.
        On Iceberg this is a single MERGE INTO; on plain parquet we rewrite
        via anti-join (same result, coarser granularity)."""
        spark = df.sparkSession
        df = self._prepare(df)
        if self.delete_marker_field and self.delete_marker_field in df.columns:
            is_del = (F.col(self.delete_marker_field).cast("string")
                      == self.delete_marker_value)
            deletes = df.filter(is_del).select(self.id_col)
            adds = df.filter(~F.coalesce(is_del, F.lit(False))) \
                     .drop(self.delete_marker_field)
        else:
            deletes = None
            adds = df
        # last-write-wins within the batch, in explicit source order when
        # the caller carries one (order_field); the monotonic-id fallback is
        # only deterministic for an unshuffled single-source batch.
        if self.order_field and self.order_field in adds.columns:
            order = F.col(self.order_field).desc_nulls_last()
        else:
            order = F.monotonically_increasing_id().desc()
        w = Window.partitionBy(self.id_col).orderBy(order)
        adds = (adds.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn")
                .withColumn("_bucket", self._bucket_col()))
        adds = adds.persist()
        n_adds = adds.count()

        try:
            existing = spark.read.parquet(self.table_dir)
        except Exception:
            existing = None

        gone = adds.select(self.id_col)
        if deletes is not None:
            gone = gone.unionByName(deletes)
        gone = gone.distinct().withColumn("_bucket", self._bucket_col())

        overwrite_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            legacy_migration = False
            if existing is not None and "_bucket" not in existing.columns:
                # legacy unbucketed table: one-time full migration
                legacy_migration = True
                existing = existing.withColumn("_bucket", self._bucket_col())
                affected = list(range(self.n_buckets))
            elif existing is not None:
                # partition pruning: touch only buckets holding changed ids
                affected = [r[0] for r in gone.select("_bucket")
                            .distinct().collect()]
                existing = existing.filter(F.col("_bucket").isin(affected))
            else:
                affected = []

            if existing is not None:
                survivors = existing.join(
                    F.broadcast(gone.select(self.id_col)),
                    self.id_col, "left_anti")
                merged = survivors.unionByName(adds,
                                               allowMissingColumns=True)
                # break lineage off table_dir: the overwrite below would
                # otherwise read the path it is replacing. (With an Iceberg/
                # Delta catalog this whole read-modify-write is one
                # snapshot-isolated MERGE INTO; localCheckpoint bounds the
                # materialization to the affected buckets only.)
                merged = merged.localCheckpoint(eager=True)
            else:
                merged = adds
            out_buckets = {r[0] for r in
                           merged.select("_bucket").distinct().collect()}
            if self.routing_field and self.routing_field in merged.columns:
                merged = merged.repartition(F.col(self.routing_field))
            (merged.write.mode("overwrite")
             .option("maxRecordsPerFile", self.batch_size)
             .partitionBy("_bucket").parquet(self.table_dir))
            # dynamic overwrite only replaces partitions PRESENT in the
            # output; an affected bucket whose rows were all deleted writes
            # nothing — clear its directory explicitly.
            import shutil

            for b in set(affected) - out_buckets:
                shutil.rmtree(os.path.join(self.table_dir, f"_bucket={b}"),
                              ignore_errors=True)
            if legacy_migration:
                # the dynamic partitionBy overwrite leaves the pre-migration
                # root-level part files in place (Spark's partition discovery
                # ignores them, but they waste storage and double-count for
                # non-Spark readers — ADVICE r2). All their rows now live
                # under _bucket=N dirs (the merged frame was materialized via
                # localCheckpoint BEFORE the write), so drop them.
                for name in os.listdir(self.table_dir):
                    p = os.path.join(self.table_dir, name)
                    if os.path.isfile(p) and not name.startswith("_bucket="):
                        os.remove(p)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           overwrite_mode)
            adds.unpersist()
        return {"rows": n_adds}

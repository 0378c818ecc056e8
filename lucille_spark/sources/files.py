"""FileConnector parity: filesystem traversal -> Document rows, with
include/exclude regex filtering, modification cutoffs, and incremental
publish state (reference: connector/FileConnector.java:83-327, traversal in
connector/storageclient/BaseStorageClient.java:100-281, state DB in
connector/FileConnectorStateManager.java:1-315).

Spark-first mapping:
- traversal        -> ``spark.read.format("binaryFile")`` (works on local,
  s3a://, gs://, abfs:// — the reference's four storage clients collapse
  into Hadoop FS URIs)
- include/exclude  -> ``filter(col("path").rlike(...))`` — pushed to the
  file index where possible
- lastModified cutoff -> filter on the source's modificationTime column
- incremental state   -> a parquet state table keyed by path with
  (modificationTime, last_published); new/changed files are published,
  vanished files yield delete tombstones (``___deleted`` rows), matching
  FileConnector.java:222-253.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FileSource:
    def __init__(self, spark: SparkSession, root: str,
                 include_regex: Optional[str] = None,
                 exclude_regex: Optional[str] = None,
                 modified_after: Optional[str] = None,
                 doc_id_prefix: str = "",
                 state_dir: Optional[str] = None):
        self.spark = spark
        self.root = root
        self.include_regex = include_regex
        self.exclude_regex = exclude_regex
        self.modified_after = modified_after
        self.doc_id_prefix = doc_id_prefix
        self.state_dir = state_dir

    def _listing(self) -> DataFrame:
        df = (self.spark.read.format("binaryFile")
              .option("recursiveFileLookup", "true").load(self.root))
        if self.include_regex:
            df = df.filter(F.col("path").rlike(self.include_regex))
        if self.exclude_regex:
            df = df.filter(~F.col("path").rlike(self.exclude_regex))
        if self.modified_after:
            df = df.filter(F.col("modificationTime") > F.lit(self.modified_after))
        return df

    def read(self) -> DataFrame:
        """Full publish: (doc_id, file_path, file_size_bytes,
        file_modification_date, content:binary) — field names per
        connector/storageclient/BaseStorageClient (FileConnector docs)."""
        df = self._listing()
        return df.select(
            F.concat(F.lit(self.doc_id_prefix),
                     F.sha2(F.col("path").cast("binary"), 256)).alias("doc_id"),
            F.col("path").alias("file_path"),
            F.col("length").alias("file_size_bytes"),
            F.col("modificationTime").alias("file_modification_date"),
            F.col("content"),
        )

    # --- incremental publish with state (FileConnectorStateManager parity)
    def _state_path(self) -> str:
        assert self.state_dir, "state_dir required for incremental mode"
        return os.path.join(self.state_dir, "file_state")

    def read_incremental(self) -> DataFrame:
        """New/changed files since the last run + delete tombstones for
        files that vanished; rows carry ``___deleted`` boolean. Call
        :meth:`commit_state` after a successful downstream write."""
        current = self.read()
        try:
            state = self.spark.read.parquet(self._state_path())
        except Exception:
            state = None
        if state is None:
            return current.withColumn("___deleted", F.lit(False))
        st = state.select(
            F.col("file_path").alias("_st_path"),
            F.col("file_modification_date").alias("_st_mtime"))
        joined = current.join(
            st, current.file_path == st._st_path, "full_outer")
        fresh = (
            joined.filter(F.col("file_path").isNotNull()
                          & (F.col("_st_path").isNull()
                             | (F.col("file_modification_date")
                                > F.col("_st_mtime"))))
            .drop("_st_path", "_st_mtime")
            .withColumn("___deleted", F.lit(False)))
        tombstones = (
            joined.filter(F.col("file_path").isNull())
            .select(
                F.sha2(F.col("_st_path").cast("binary"), 256).alias("doc_id"),
                F.col("_st_path").alias("file_path"),
                F.lit(None).cast("long").alias("file_size_bytes"),
                F.col("_st_mtime").alias("file_modification_date"),
                F.lit(None).cast("binary").alias("content"),
                F.lit(True).alias("___deleted")))
        return fresh.unionByName(tombstones)

    def commit_state(self) -> None:
        """Record the current listing as the new state snapshot."""
        (self._listing()
         .select(F.col("path").alias("file_path"),
                 F.col("modificationTime").alias("file_modification_date"))
         .write.mode("overwrite").parquet(self._state_path()))

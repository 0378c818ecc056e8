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


# ARCHIVE_FILE_SEPARATOR: entry paths are "<archive-path>!<entry-name>"
# (connector/FileConnector.java:91, BaseStorageClient.getArchiveEntryFullPath
# :391-392). Supported types mirror isSupportedArchiveFileType /
# isSupportedCompressedFileType (BaseStorageClient.java:430-455).
ARCHIVE_SEP = "!"
_ARCHIVE_RE = r"\.(zip|tar|tar\.gz|tgz)$"
_COMPRESSED_RE = r"\.gz$"


class FileSource:
    def __init__(self, spark: SparkSession, root: str,
                 include_regex: Optional[str] = None,
                 exclude_regex: Optional[str] = None,
                 modified_after: Optional[str] = None,
                 doc_id_prefix: str = "",
                 state_dir: Optional[str] = None,
                 handle_archived_files: bool = False,
                 handle_compressed_files: bool = False):
        self.spark = spark
        self.root = root
        self.include_regex = include_regex
        self.exclude_regex = exclude_regex
        self.modified_after = modified_after
        self.doc_id_prefix = doc_id_prefix
        self.state_dir = state_dir
        self.handle_archived_files = handle_archived_files
        self.handle_compressed_files = handle_compressed_files

    def _raw_listing(self) -> DataFrame:
        df = (self.spark.read.format("binaryFile")
              .option("recursiveFileLookup", "true").load(self.root))
        if self.modified_after:
            df = df.filter(F.col("modificationTime") > F.lit(self.modified_after))
        return df

    def _name_filter(self, df: DataFrame, col: str = "path") -> DataFrame:
        if self.include_regex:
            df = df.filter(F.col(col).rlike(self.include_regex))
        if self.exclude_regex:
            df = df.filter(~F.col(col).rlike(self.exclude_regex))
        return df

    def _is_expandable(self):
        cond = F.lit(False)
        if self.handle_archived_files:
            cond = cond | F.lower(F.col("path")).rlike(_ARCHIVE_RE)
        if self.handle_compressed_files:
            cond = cond | F.lower(F.col("path")).rlike(_COMPRESSED_RE)
        return cond

    def _listing(self) -> DataFrame:
        df = self._raw_listing()
        if self.handle_archived_files or self.handle_compressed_files:
            df = df.filter(~self._is_expandable())
        return self._name_filter(df)

    def _expanded(self) -> DataFrame:
        """Archive/compressed members as file rows (path!entry), the
        BaseStorageClient.handleArchiveFiles:281-330 edge path. Python
        zipfile/tarfile/gzip inside mapInPandas — per-file CPU-bound
        decompression with no JVM builtin; each archive is one row so the
        work distributes per archive. Recursive archives are not expanded
        (matching the reference's documented limitation)."""
        import pandas as pd

        handle_arch = self.handle_archived_files
        handle_comp = self.handle_compressed_files
        schema = ("path string, length long, modificationTime timestamp, "
                  "content binary")

        def expand(batches):
            import datetime
            import gzip
            import io
            import os as _os
            import tarfile
            import zipfile

            def tar_entries(fileobj, base, rows, mode="r"):
                with tarfile.open(fileobj=fileobj, mode=mode) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        data = tf.extractfile(m).read()
                        rows.append((f"{base}{ARCHIVE_SEP}{m.name}",
                                     len(data),
                                     datetime.datetime.utcfromtimestamp(
                                         m.mtime),
                                     data))

            for pdf in batches:
                rows = []
                for path, mtime, content in zip(pdf["path"],
                                                pdf["modificationTime"],
                                                pdf["content"]):
                    low = path.lower()
                    try:
                        if handle_arch and (low.endswith(".tar.gz")
                                            or low.endswith(".tgz")):
                            tar_entries(io.BytesIO(content), path, rows,
                                        mode="r:gz")
                        elif handle_arch and low.endswith(".tar"):
                            tar_entries(io.BytesIO(content), path, rows)
                        elif handle_arch and low.endswith(".zip"):
                            with zipfile.ZipFile(io.BytesIO(content)) as zf:
                                for info in zf.infolist():
                                    if info.is_dir():
                                        continue
                                    data = zf.read(info)
                                    rows.append((
                                        f"{path}{ARCHIVE_SEP}{info.filename}",
                                        len(data),
                                        datetime.datetime(*info.date_time),
                                        data))
                        elif handle_comp and low.endswith(".gz"):
                            data = gzip.decompress(content)
                            inner = _os.path.basename(path)[:-3]
                            rows.append((f"{path}{ARCHIVE_SEP}{inner}",
                                         len(data), mtime, data))
                    except Exception:
                        # unreadable member/archive -> skip, like the
                        # reference's canReadEntryData guard (:294-297)
                        continue
                yield pd.DataFrame(
                    rows, columns=["path", "length", "modificationTime",
                                   "content"])

        src = self._raw_listing().filter(self._is_expandable())
        out = src.select("path", "modificationTime", "content") \
            .mapInPandas(expand, schema=schema)
        # include/exclude apply to the ENTRY path (BaseStorageClient:300)
        return self._name_filter(out)

    def read(self) -> DataFrame:
        """Full publish: (doc_id, file_path, file_size_bytes,
        file_modification_date, content:binary) — field names per
        connector/storageclient/BaseStorageClient (FileConnector docs).
        With handle_archived_files/handle_compressed_files, .zip/.tar/
        .tar.gz/.gz members become documents with path archive!entry."""
        df = self._listing()
        if self.handle_archived_files or self.handle_compressed_files:
            df = df.select("path", "length", "modificationTime", "content") \
                .unionByName(self._expanded())
        return df.select(
            F.concat(F.lit(self.doc_id_prefix),
                     F.sha2(F.col("path").cast("binary"), 256)).alias("doc_id"),
            F.col("path").alias("file_path"),
            F.col("length").alias("file_size_bytes"),
            F.col("modificationTime").alias("file_modification_date"),
            F.col("content"),
        )

    def move_after_processing(self, dest_dir: str) -> int:
        """FileConnector moveToAfterProcessing (FileConnector.java:83-196):
        relocate successfully processed LOCAL files; returns count moved.
        Cloud URIs are left in place (the reference likewise implements the
        move for local storage only)."""
        import shutil

        os.makedirs(dest_dir, exist_ok=True)
        moved = 0
        for r in self._listing().select("path").collect():
            p = r["path"]
            local = p[len("file:"):] if p.startswith("file:") else p
            if os.path.exists(local):
                shutil.move(local,
                            os.path.join(dest_dir, os.path.basename(local)))
                moved += 1
        return moved

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

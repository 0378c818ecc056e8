"""CSVFileHandler parity (reference: core/fileHandler/CSVFileHandler.java:33-297).

Semantics matched:
- header row = field names (BOM on the first header stripped, :235-260)
- configurable separator / quote / escape
- blank + ragged rows dropped (DROPMALFORMED, :129-138)
- a header column named ``id`` is treated as reserved and renamed to
  ``csvLineNumber``-safe form (:187) — we rename to ``id_from_csv`` and
  synthesize the doc id per the rules below
- doc id synthesis (:156-194): default ``<filename>-<lineNum>``; with
  ``id_fields`` (+ optional ``doc_id_format``) a compound id from columns
- ``csvLineNumber`` field (1-based data-row number within its file)
- ``source`` (= filename) field
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_csv_docs(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    id_fields: Optional[Sequence[str]] = None,
    doc_id_format: Optional[str] = None,
    doc_id_prefix: str = "",
) -> DataFrame:
    df = (spark.read
          .option("header", True)
          .option("sep", sep)
          .option("quote", quote)
          .option("escape", escape)
          .option("multiLine", True)
          .option("mode", "DROPMALFORMED")
          .option("ignoreTrailingWhiteSpace", False)
          .csv(path))
    # BOM stripping: Spark leaves a BOM on the first header name
    renames = {}
    for c in df.columns:
        clean = c.lstrip("﻿")
        if clean != c:
            renames[c] = clean
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    # reserved field collision (CSVFileHandler.java:187)
    if "id" in df.columns:
        df = df.withColumnRenamed("id", "id_from_csv")

    df = df.withColumn("_file", F.input_file_name())
    df = df.withColumn("source",
                       F.regexp_extract(F.col("_file"), r"([^/]+)$", 1))
    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    df = df.withColumn("csvLineNumber", F.row_number().over(w))

    if id_fields:
        if doc_id_format:
            fmt = doc_id_format
            cols = [F.col(c) for c in id_fields]
            doc_id = F.format_string(fmt, *cols)
        else:
            doc_id = F.concat_ws("-", *[F.col(c) for c in id_fields])
    else:
        doc_id = F.concat_ws("-", F.col("source"),
                             F.col("csvLineNumber").cast("string"))
    df = df.withColumn("id", F.concat(F.lit(doc_id_prefix), doc_id))
    # drop fully-blank rows
    data_cols = [c for c in df.columns
                 if c not in ("id", "source", "csvLineNumber", "_file")]
    non_blank = None
    for c in data_cols:
        cond = F.col(c).isNotNull() & (F.trim(F.col(c)) != "")
        non_blank = cond if non_blank is None else (non_blank | cond)
    if non_blank is not None:
        df = df.filter(non_blank)
    return df.drop("_file")

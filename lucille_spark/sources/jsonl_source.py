"""JsonFileHandler parity (reference: core/fileHandler/JsonFileHandler.java:41-193).

- one Document per JSONL line
- doc id from ``id_field`` (or synthesized ``<filename>-<lineNum>``)
- field whitelist (``include_fields``) / blacklist (``exclude_fields``)
  — util/FieldFilter.java:10-56 applied at read (:58-103)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    id_field: Optional[str] = "id",
    include_fields: Optional[Sequence[str]] = None,
    exclude_fields: Optional[Sequence[str]] = None,
    doc_id_prefix: str = "",
) -> DataFrame:
    df = spark.read.json(path)
    if include_fields:
        keep = [c for c in df.columns if c in set(include_fields)
                or c == id_field]
        df = df.select(*keep)
    if exclude_fields:
        df = df.drop(*[c for c in exclude_fields if c != id_field
                       and c in df.columns])
    if id_field and id_field in df.columns:
        doc_id = F.col(id_field).cast("string")
        if id_field != "id":
            df = df.drop("id") if "id" in df.columns else df
    else:
        df = df.withColumn("_file", F.input_file_name())
        w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
        doc_id = F.concat_ws(
            "-", F.regexp_extract(F.col("_file"), r"([^/]+)$", 1),
            F.row_number().over(w).cast("string"))
    out = df.withColumn("id", F.concat(F.lit(doc_id_prefix), doc_id))
    return out.drop("_file") if "_file" in out.columns else out

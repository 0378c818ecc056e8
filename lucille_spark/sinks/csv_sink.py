"""CSVIndexer parity (reference: indexer/CSVIndexer.java:34-161):
selected fields -> CSV rows; multi-valued fields rendered as a
list-string ("[a, b]", :137-148)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, columns: Sequence[str],
              mode: str = "overwrite") -> None:
    out = []
    dtypes = dict(df.dtypes)
    for c in columns:
        if dtypes.get(c, "").startswith("array"):
            out.append(F.concat(F.lit("["), F.array_join(F.col(c), ", "),
                                F.lit("]")).alias(c))
        else:
            out.append(F.col(c))
    df.select(*out).write.mode(mode).option("header", True).csv(path)

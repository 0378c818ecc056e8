"""Dump .explain('formatted') for the query paths touched in round 7.
Usage: python tools/dump_r07_plans.py <suffix>   (suffix = before|after)"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"
OUT = "plans/r07"


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)
    import shutil
    import tempfile

    from lucille_spark import gate
    from lucille_spark.corpus import documents_as_corpus
    from lucille_spark.index.builder import build_index, postings_blocks, \
        add_doc_identity
    from lucille_spark.index.ordinals import assign_doc_ord
    from lucille_spark.analysis import tokenize_col
    from lucille_spark.query.executor_df import search_batch
    from lucille_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("plans-r07", cpus=8, shuffle_partitions=8)

    def dump(name, df):
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain(df))
        print("dumped", name)

    # the postings-pipeline plan (the build's corpus-sized stage)
    corpus = documents_as_corpus(spark, SF)
    docs = assign_doc_ord(add_doc_identity(corpus), "doc_id")
    docs = docs.withColumn(
        "dl_content", F.size(tokenize_col(F.col("content"))).cast("long"))
    n = docs.count()
    blocks = postings_blocks(docs, ("content",), {"content": 100.0}, n)
    dump("index_build_postings", blocks)

    dump("bm25_df_or", gate.bm25_or(spark, SF))
    dump("bm25_grouped_df", gate.bm25_grouped_df(spark, SF))

    # search_batch over a real index
    idx = tempfile.mkdtemp(prefix="plans_idx_")
    try:
        build_index(documents_as_corpus(spark, SF), idx,
                    fields=("content",), store_positions=True)
        dump("search_batch", search_batch(
            spark, idx, [("q0", "content:merge")], k=10))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

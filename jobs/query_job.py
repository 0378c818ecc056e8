"""Cluster entrypoint: run a BM25 query (or a query-set file) against a
built index.

Single query (driver-side block-max WAND, no Spark job):
    spark-submit --py-files lucille_spark.zip jobs/query_job.py \
        --index /path/to/index --query 'content:giraffe AND content:test' -k 10

Query batch (distributed — queries are the unit of parallelism):
    ... --index /path/to/index --query-file queries.tsv --out results/
    (TSV: query_id<TAB>query)

Solr-handler analogues on the single-query path (r5):
    --facet FIELD      field facet counts over the query's boolean
                       matches (doc-values route for stored fields)
    --facet-limit N    facet.limit (default 10)
    --mlt TEXT         MoreLikeThis: rank documents similar to TEXT
                       (ignores --query)
    --suggest WORD     SpellCheck suggestions for WORD from the term
                       dictionary (ignores --query)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query")
    ap.add_argument("--query-file")
    ap.add_argument("--out")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--default-field", default="content")
    ap.add_argument("--facet", metavar="FIELD")
    ap.add_argument("--facet-limit", type=int, default=10)
    ap.add_argument("--mlt", metavar="TEXT")
    ap.add_argument("--suggest", metavar="WORD")
    args = ap.parse_args()

    if args.facet and not args.query:
        ap.error("--facet FIELD requires --query (the facet is computed "
                 "over that query's match set)")
    if not (args.query or args.mlt or args.suggest or args.query_file):
        ap.error("one of --query / --query-file / --mlt / --suggest "
                 "is required")

    if args.query or args.mlt or args.suggest:
        from lucille_spark.query.searcher import IndexSearcher

        searcher = IndexSearcher(args.index, args.default_field)
        if args.suggest:
            for term in searcher.suggest(args.suggest, k=args.k):
                print(json.dumps({"suggestion": term}))
            return
        if args.mlt:
            for rank, (doc_id, score) in enumerate(
                    searcher.more_like_this(args.mlt, k=args.k), 1):
                print(json.dumps({"rank": rank, "doc_id": doc_id,
                                  "score": round(score, 6)}))
            return
        if args.facet:
            for value, n in searcher.facet(args.query, args.facet,
                                           size=args.facet_limit):
                print(json.dumps({"facet_value": value, "count": n}))
            return
        for rank, (doc_id, score) in enumerate(
                searcher.search(args.query, args.k), 1):
            print(json.dumps({"rank": rank, "doc_id": doc_id,
                              "score": round(score, 6)}))
        return

    from pyspark.sql import SparkSession

    from lucille_spark.query.executor_df import search_batch

    spark = SparkSession.builder.appName("lucille-query-batch").getOrCreate()
    queries = []
    with open(args.query_file) as fh:
        for line in fh:
            qid, q = line.rstrip("\n").split("\t", 1)
            queries.append((qid, q))
    res = search_batch(spark, args.index, queries, k=args.k,
                       default_field=args.default_field)
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
    else:
        res.show(100, truncate=False)


if __name__ == "__main__":
    main()

"""Parallelism-identity contract (FIXTURES.md F6): the index artifacts and
query results must be byte-identical regardless of how many partitions (or
executors) built them — the property the N vs 4N scaling evidence rests on.

Ordinals are content-derived (ordinals.py), avgdl is an exact integer
division, and block layout depends only on (term, doc_ord, salt), so two
builds at different parallelism must agree exactly.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    from lucille_spark.corpus import corpus_df
    from lucille_spark.index.builder import build_index

    dirs = []
    for parts in (3, 13):
        out = str(tmp_path_factory.mktemp("scale") / f"idx_{parts}")
        build_index(corpus_df(spark, 800, partitions=parts), out,
                    fields=("content",), block_size=32, docs_per_salt=64)
        dirs.append(out)
    return dirs


def _pdf(spark, path, order):
    return (spark.read.parquet(path).toPandas()
            .sort_values(order).reset_index(drop=True))


def test_lexicon_identical(spark, two_indexes):
    a, b = two_indexes
    la = _pdf(spark, f"{a}/lexicon", ["field", "term"])
    lb = _pdf(spark, f"{b}/lexicon", ["field", "term"])
    assert la.equals(lb)


def test_corpus_stats_identical(spark, two_indexes):
    a, b = two_indexes
    sa = _pdf(spark, f"{a}/corpus_stats", ["field"])
    sb = _pdf(spark, f"{b}/corpus_stats", ["field"])
    assert sa.equals(sb)


def test_doc_stats_identical(spark, two_indexes):
    a, b = two_indexes
    da = _pdf(spark, f"{a}/doc_stats", ["doc_ord"])
    db = _pdf(spark, f"{b}/doc_stats", ["doc_ord"])
    assert da.equals(db)


def test_posting_blocks_identical(spark, two_indexes):
    a, b = two_indexes
    cols = ["field", "term", "salt", "block_seq", "first_doc", "last_doc",
            "n_docs", "sum_tf", "block_max_tf", "block_max_tfnorm"]
    pa = _pdf(spark, f"{a}/postings", ["field", "term", "salt", "block_seq"])
    pb = _pdf(spark, f"{b}/postings", ["field", "term", "salt", "block_seq"])
    assert pa[cols].equals(pb[cols])
    # compressed payloads byte-identical too
    for col in ("doc_gaps", "tfs", "dls", "positions"):
        assert [bytes(x) for x in pa[col]] == [bytes(x) for x in pb[col]]


def test_query_results_identical(two_indexes):
    from lucille_spark.query.searcher import IndexSearcher

    sa, sb = (IndexSearcher(d) for d in two_indexes)
    for q in ["content:test OR content:giraffe",
              "content:return AND content:import",
              "content:if"]:
        assert sa.search(q, 10) == sb.search(q, 10)

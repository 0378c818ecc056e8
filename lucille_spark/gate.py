"""Correctness-gate registry: paired (Spark query, DuckDB oracle SQL).

Each entry implements one operator from SURVEY.md §2 as an idiomatic Spark
plan AND as ANSI-ish SQL that DuckDB runs over the same parquet views
(region nation customer supplier part orders lineitem events documents
embeddings). The driver compares row-count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides,
- integer outputs are cast to BIGINT on both sides,
- float outputs are ROUND()ed after arithmetic that is kept textually
  identical (same op order → bit-identical doubles),
- averages are expressed as exact-integer-sum / count,
- decimal-exact sums are used where a float sum's order would differ.

Entries whose Spark side runs the *compressed index + block-max WAND* engine
still get a full SQL oracle (the BM25 formula in SQL) — that is the
strongest gate this repo has: codecs + salting + WAND vs DuckDB.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Callable, Dict, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucille_spark import BM25_B, BM25_K1
from lucille_spark.analysis import duckdb_tokens_sql, tokenize_col
from lucille_spark.query.executor_df import bm25_query_df, phrase_pred

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


TOKS_SQL = duckdb_tokens_sql("text")
_TOKS_CTE = f"""
toks AS (
  SELECT doc_id, text, lang, source,
         {TOKS_SQL} AS toks
  FROM documents
)"""


# =========================================================================
# 1. Ingest plane: doc stats / lexicon / corpus stats
#    (reference: Document model + indexer accounting, SURVEY.md §1, §2.2)
# =========================================================================

@register("ingest_doc_stats", sql=f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS dl,
       sha256(text) AS content_sha256
FROM toks
""")
def ingest_doc_stats(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(tokenize_col(F.col("text"))).cast("long").alias("dl"),
        F.sha2(F.col("text").cast("binary"), 256).alias("content_sha256"),
    )


@register("lexicon_term_stats", sql=f"""
WITH {_TOKS_CTE},
ex AS (SELECT doc_id, unnest(toks) AS term FROM toks)
SELECT term,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS cf
FROM ex GROUP BY term
""")
def lexicon_term_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ex = docs.select("doc_id",
                     F.explode(tokenize_col(F.col("text"))).alias("term"))
    return ex.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count("*").cast("long").alias("cf"))


@register("corpus_stats", sql=f"""
WITH {_TOKS_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(toks)) AS BIGINT) AS total_terms,
       CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
FROM toks
""")
def corpus_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        F.size(tokenize_col(F.col("text"))).cast("long").alias("dl"))
    return docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_terms"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )


# =========================================================================
# 2. BM25 ranked retrieval (query plane, SURVEY.md §2.9)
# =========================================================================

def _bm25_sql(terms: Sequence[str], k: int = 10, mode: str = "or",
              exclude: Sequence[str] = (),
              phrases: Sequence[Sequence[str]] = ()) -> str:
    """DuckDB SQL mirroring executor_df.bm25_query_df term-for-term."""
    tf_cols = ",\n       ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms))
    df_cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i} / (tf_{i} + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl)))"
        f" ELSE 0.0 END)"
        for i in range(len(terms)))
    op = " AND " if mode == "and" else " OR "
    match = op.join(f"tf_{i} > 0" for i in range(len(terms)))
    for ph in phrases:
        n = len(ph)
        conds = " AND ".join(
            f"toks[CAST(i AS BIGINT) + {off + 1}] = '{t}'"
            for off, t in enumerate(ph))
        match += (f" AND len(toks) >= {n} AND len(list_filter(range(0, "
                  f"len(toks) - {n} + 1), i -> {conds})) > 0")
    for t in exclude:
        match += f" AND len(list_filter(toks, x -> x = '{t}')) = 0"
    return f"""
WITH {_TOKS_CTE},
d AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl,
       {tf_cols}
  FROM toks
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       {df_cols}
  FROM d
),
scored AS (
  SELECT d.doc_id, 0.0 + {score} AS raw_score,
         ({match}) AS matched
  FROM d, stats
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY raw_score DESC, doc_id) AS BIGINT) AS rank,
       ROUND(raw_score, 4) AS score
FROM scored WHERE matched
ORDER BY raw_score DESC, doc_id LIMIT {k}
"""


def _bm25_spark(spark, sf_dir, terms, mode="or", exclude=(), phrases=(), k=10):
    res = bm25_query_df(_docs(spark, sf_dir), "doc_id", "text", terms, k=k,
                        mode=mode, exclude=exclude, phrases=phrases)
    return res.select("doc_id", F.col("rank").cast("long").alias("rank"),
                      "score")


@register("bm25_single", sql=_bm25_sql(["spark"]))
def bm25_single(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["spark"])


@register("bm25_or", sql=_bm25_sql(["window", "filter"]))
def bm25_or(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["window", "filter"])


@register("bm25_and", sql=_bm25_sql(["hash", "merge"], mode="and"))
def bm25_and(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["hash", "merge"], mode="and")


@register("bm25_rare_or", sql=_bm25_sql(["dup", "vector"], k=20))
def bm25_rare_or(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["dup", "vector"], k=20)


@register("bm25_not", sql=_bm25_sql(["merge"], exclude=["join"]))
def bm25_not(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["merge"], exclude=["join"])


@register("bm25_phrase",
          sql=_bm25_sql(["key", "order"], mode="and",
                        phrases=[["key", "order"]]))
def bm25_phrase(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, ["key", "order"], mode="and",
                       phrases=[["key", "order"]])


# =========================================================================
# 3. Compressed index + block-max WAND vs the same SQL oracle
#    (the from-scratch engine end-to-end: build → codecs → WAND)
# =========================================================================

_WAND_QUERY_TERMS = ["window", "filter"]


def _corpus_sha_sql(inner: str) -> str:
    """doc_id of the corpus adapter, in DuckDB terms (matches
    corpus.documents_as_corpus + builder.add_doc_identity)."""
    return (
        "sha256('org/' || source || chr(0) || 'docs/doc_' || "
        "CAST(doc_id AS VARCHAR) || '.txt' || chr(0) || sha256(source))"
    )


_WAND_SQL = f"""
WITH base AS (
  SELECT {_corpus_sha_sql('documents')} AS sha_id,
         {TOKS_SQL} AS toks
  FROM documents
),
d AS (
  SELECT sha_id, toks, CAST(len(toks) AS BIGINT) AS dl,
       CAST(len(list_filter(toks, x -> x = 'window')) AS BIGINT) AS tf_0,
       CAST(len(list_filter(toks, x -> x = 'filter')) AS BIGINT) AS tf_1
  FROM base
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
       CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1
  FROM d
),
scored AS (
  SELECT d.sha_id AS doc_id,
    0.0 + (CASE WHEN tf_0 > 0 THEN ln(1.0 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
         * (tf_0 / (tf_0 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))) ELSE 0.0 END)
      + (CASE WHEN tf_1 > 0 THEN ln(1.0 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
         * (tf_1 / (tf_1 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))) ELSE 0.0 END)
      AS raw_score,
    (tf_0 > 0 OR tf_1 > 0) AS matched
  FROM d, stats
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY raw_score DESC, doc_id) AS BIGINT) AS rank,
       ROUND(raw_score, 4) AS score
FROM scored WHERE matched
ORDER BY raw_score DESC, doc_id LIMIT 10
"""


def _gate_index_dir(sf_dir: str) -> str:
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"lucille_gate_idx_{tag}")


def _ensure_gate_index(spark, sf_dir: str) -> str:
    from lucille_spark.corpus import documents_as_corpus
    from lucille_spark.index.builder import build_index

    out = _gate_index_dir(sf_dir)
    build_index(documents_as_corpus(spark, sf_dir), out, fields=("content",),
                block_size=64, docs_per_salt=256, run_id=f"gate-{sf_dir}",
                resume=True)
    return out


@register("wand_index_top10", sql=_WAND_SQL)
def wand_index_top10(spark, sf_dir):
    """Full engine path: compressed index + block-max WAND, vs SQL BM25."""
    from lucille_spark.query.searcher import IndexSearcher

    idx = _ensure_gate_index(spark, sf_dir)
    hits = IndexSearcher(idx).search("content:window OR content:filter", k=10)
    rows = [(doc_id, i + 1, round(score, 4))
            for i, (doc_id, score) in enumerate(hits)]
    return spark.createDataFrame(rows, "doc_id string, rank long, score double")


@register("wand_conjunctive_top10",
          sql=_WAND_SQL.replace("tf_0 > 0 OR tf_1 > 0",
                                "tf_0 > 0 AND tf_1 > 0"))
def wand_conjunctive_top10(spark, sf_dir):
    from lucille_spark.query.searcher import IndexSearcher

    idx = _ensure_gate_index(spark, sf_dir)
    hits = IndexSearcher(idx).search(
        "content:window AND content:filter", k=10)
    rows = [(doc_id, i + 1, round(score, 4))
            for i, (doc_id, score) in enumerate(hits)]
    return spark.createDataFrame(rows, "doc_id string, rank long, score double")


# =========================================================================
# 4. Boolean matching (MatchQuery percolator semantics, SURVEY.md §2.4)
# =========================================================================

@register("bool_match_not", sql=f"""
WITH {_TOKS_CTE}
SELECT doc_id FROM toks
WHERE len(list_filter(toks, x -> x = 'merge')) > 0
  AND len(list_filter(toks, x -> x = 'dup')) = 0
  AND len(list_filter(toks, x -> x = 'vector')) = 0
""")
def bool_match_not(spark, sf_dir):
    from lucille_spark.query.executor_df import boolean_match_df

    return boolean_match_df(_docs(spark, sf_dir), "doc_id", "text",
                            all_of=["merge"], none_of=["dup", "vector"])


@register("bool_match_phrase", sql=f"""
WITH {_TOKS_CTE}
SELECT doc_id FROM toks
WHERE len(toks) >= 2 AND len(list_filter(range(0, len(toks) - 1),
      i -> toks[CAST(i AS BIGINT) + 1] = 'key'
       AND toks[CAST(i AS BIGINT) + 2] = 'order')) > 0
""")
def bool_match_phrase(spark, sf_dir):
    from lucille_spark.query.executor_df import boolean_match_df

    return boolean_match_df(_docs(spark, sf_dir), "doc_id", "text",
                            phrases=[["key", "order"]])

"""Round-2: JDBC DatabaseConnector (embedded Derby), dead-letter
quarantine, LSH hot-bucket cap, hash-id token dictionary."""

import json
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------- JDBC (Derby embedded)

def test_database_connector_derby(spark, tmp_path):
    """DatabaseConnector.java:52-431: preSQL/postSQL, partitioned main
    read, otherSQLs child merge — against a real JDBC database."""
    from lucille_spark.sources.jdbc import DatabaseConnector

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    dc = DatabaseConnector(
        spark, url,
        sql="SELECT * FROM animal",
        id_field="ID",
        pre_sql=[
            "CREATE TABLE animal (id INT, name VARCHAR(40))",
            "INSERT INTO animal VALUES (1,'Matt'),(2,'Sonny'),(3,'Blaze')",
            "CREATE TABLE meal (id INT, animal_id INT, name VARCHAR(40))",
            "INSERT INTO meal VALUES (1,1,'breakfast'),(2,1,'lunch'),"
            "(3,2,'dinner')",
        ],
        post_sql=["DROP TABLE meal"],
        other_sqls=["SELECT * FROM meal"],
        other_join_fields=["ANIMAL_ID"],
        partition_column="id", lower_bound=1, upper_bound=4,
        num_partitions=2, fetch_size=100)
    df = dc.read()
    rows = {r["ID"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["NAME"] == "Matt"
    meals = sorted(c["NAME"] for c in rows[1]["children"])
    assert meals == ["breakfast", "lunch"]
    assert len(rows[2]["children"]) == 1
    assert rows[3]["children"] is None
    # partitioned read actually split (pre-join scan)
    raw = dc._read_query("SELECT * FROM animal", partitioned=True)
    assert raw.rdd.getNumPartitions() == 2
    dc.finish()  # post_sql runs without error
    # meal is gone now; animal remains
    dc2 = DatabaseConnector(spark, url, sql="SELECT COUNT(*) AS n FROM animal",
                            id_field="N")
    assert dc2.read().collect()[0]["N"] == 3


def test_database_connector_validation(spark):
    from lucille_spark.sources.jdbc import DatabaseConnector

    with pytest.raises(ValueError):
        DatabaseConnector(spark, "jdbc:derby:x", sql="SELECT 1",
                          other_sqls=["SELECT 2"], other_join_fields=[])


# ---------------------------------------------------- dead-letter quarantine

def test_streaming_dead_letter_quarantine(spark, tmp_path):
    """A poison microbatch lands in _failed as JSON + error, the stream
    survives, and metrics record failed_quarantined (core/Worker.java:97-114)."""
    from lucille_spark.pipeline import Pipeline
    from lucille_spark.pipeline.stages import PythonUDF
    from lucille_spark.sinks import IndexSink
    from lucille_spark.streaming.ingest import StreamingIngest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "batch1.json").write_text(
        '{"id": "a1", "val": "ok"}\n{"id": "a2", "val": "boom"}\n')

    def explode_on_boom(pdf):
        if (pdf["val"] == "boom").any():
            raise RuntimeError("poison document")
        return pdf

    pipeline = Pipeline([PythonUDF(fn=explode_on_boom,
                                   schema="id string, val string")])
    ing = StreamingIngest(
        spark, pipeline, IndexSink(str(tmp_path / "docs"), id_col="id"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        metrics_dir=str(tmp_path / "metrics"),
        failed_dir=str(tmp_path))
    ing.from_json_files(str(in_dir), "id string, val string")

    failed = spark.read.parquet(str(tmp_path / "_failed"))
    rows = failed.collect()
    assert len(rows) == 2
    assert any(json.loads(r["doc_json"])["val"] == "boom" for r in rows)
    assert all("poison document" in r["error"] for r in rows)
    metrics = spark.read.parquet(str(tmp_path / "metrics")).collect()
    assert any(m["status"] == "failed_quarantined" for m in metrics)


# --------------------------------------------------------- LSH hot buckets

def test_lsh_hot_bucket_cap(spark):
    from lucille_spark.ml.dedup import lsh_candidate_pairs

    # 20 docs with IDENTICAL signatures (a degenerate bucket) + 2 normal
    rows = [(f"dup{i:02d}", 1, 1, 2, 2, 3, 3, 4, 4) for i in range(20)]
    rows += [("solo_a", 9, 9, 8, 8, 7, 7, 6, 6),
             ("solo_b", 9, 9, 8, 8, 5, 5, 3, 2)]
    sigs = spark.createDataFrame(
        rows, "doc_id string, h_0 long, h_1 long, h_2 long, h_3 long, "
              "h_4 long, h_5 long, h_6 long, h_7 long")
    uncapped = lsh_candidate_pairs(sigs, 8, 2).count()
    assert uncapped == 20 * 19 // 2 + 1   # dup clique + solo_a~solo_b
    capped = lsh_candidate_pairs(sigs, 8, 2, max_bucket_size=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == {("solo_a", "solo_b")}  # clique dropped, normal pair kept


def test_token_dictionary_hash_ids(spark):
    from lucille_spark.ml.dedup import minhash_signatures, token_dictionary

    df = spark.createDataFrame(
        [("a", "alpha beta gamma"), ("b", "alpha beta gamma"),
         ("c", "totally different words")],
        "doc_id string, text string")
    td = token_dictionary(df, "text", hash_ids=True)
    # injective on this vocab, no Window in the plan
    assert td.count() == td.select("tid").distinct().count()
    assert "Window" not in td._jdf.queryExecution().executedPlan().toString()
    sigs = minhash_signatures(df, "doc_id", "text", 8, tokdict=td)
    rows = {r["doc_id"]: tuple(r[f"h_{j}"] for j in range(8))
            for r in sigs.collect()}
    assert rows["a"] == rows["b"] != rows["c"]

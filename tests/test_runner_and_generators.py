"""Runner-CLI parity (core/Runner.java run + -validate modes) and the
generator / entity-extraction stages."""

import json
import subprocess
import sys


def test_generator_stages_deterministic(spark):
    from lucille_spark.pipeline.stages import (
        AddRandomBoolean, AddRandomDouble, AddRandomInt, AddRandomString,
        RandomVector,
    )
    from lucille_spark.sources import sequence_docs

    docs = sequence_docs(spark, 50)
    out = AddRandomBoolean(dest="b").apply(docs)
    out = AddRandomInt(dest="n", min_value=10, max_value=20).apply(out)
    out = AddRandomDouble(dest="d").apply(out)
    out = AddRandomString(dest="w").apply(out)
    out = RandomVector(dest="v", dim=4).apply(out)
    rows1 = {r["id"]: (r["b"], r["n"], r["d"], tuple(r["v"]), r["w"])
             for r in out.collect()}
    rows2 = {r["id"]: (r["b"], r["n"], r["d"], tuple(r["v"]), r["w"])
             for r in out.collect()}
    assert rows1 == rows2                      # deterministic
    assert all(10 <= v[1] < 20 for v in rows1.values())
    assert {v[0] for v in rows1.values()} == {True, False}
    assert all(len(v[3]) == 4 for v in rows1.values())


def test_extract_entities(spark):
    from lucille_spark.pipeline.stages import ExtractEntities

    df = spark.createDataFrame(
        [("d1", "visited New York and paris last year"),
         ("d2", "nothing here"),
         ("d3", "york is not new york unless adjacent")],
        "id string, text string")
    stage = ExtractEntities(source="text", dest="ents", dictionary={
        "new york": "CITY_NYC", "paris": "CITY_PARIS"})
    out = {r["id"]: sorted(r["ents"]) for r in stage.apply(df).collect()}
    assert out["d1"] == ["CITY_NYC", "CITY_PARIS"]
    assert out["d2"] == []
    assert out["d3"] == ["CITY_NYC"]


def test_fetch_file_content(spark, tmp_path):
    from lucille_spark.pipeline.stages import FetchFileContent

    (tmp_path / "x.bin").write_bytes(b"payload")
    df = spark.createDataFrame([("d1", str(tmp_path / "x.bin"))],
                               "id string, file_path string")
    out = FetchFileContent(path_field="file_path", dest="content",
                           root=str(tmp_path)).apply(df).collect()
    assert bytes(out[0]["content"]) == b"payload"


def test_runner_cli_validate_and_run(tmp_path):
    inbox = tmp_path / "in"
    inbox.mkdir()
    (inbox / "a.jsonl").write_text(
        '{"id": "r1", "title": "Hello There"}\n'
        '{"id": "r2", "title": "Bye Now"}\n')
    out_table = str(tmp_path / "out_table")
    cfg = {
        "source": {"type": "jsonl", "path": str(inbox), "id_field": "id"},
        "pipeline": {"stages": [
            {"class": "NormalizeText", "source": "title", "mode": "lowercase"},
            {"class": "CopyFields", "mapping": {"title": "title_copy"}},
        ]},
        "sink": {"type": "parquet", "path": out_table},
    }
    cfg_path = tmp_path / "pipeline.json"
    cfg_path.write_text(json.dumps(cfg))

    # validate mode
    r = subprocess.run(
        [sys.executable, "jobs/run_pipeline_job.py", "--config",
         str(cfg_path), "--validate"], capture_output=True, text=True,
        cwd="/root/repo", timeout=300)
    assert json.loads(r.stdout.strip().splitlines()[-1])["valid"] is True

    # invalid config is rejected with errors
    bad = dict(cfg)
    bad["pipeline"] = {"stages": [{"class": "NoSuchStage"}]}
    bad_path = tmp_path / "bad.json"
    bad_path.write_text(json.dumps(bad))
    r = subprocess.run(
        [sys.executable, "jobs/run_pipeline_job.py", "--config",
         str(bad_path), "--validate"], capture_output=True, text=True,
        cwd="/root/repo", timeout=300)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["valid"] is False and "unknown stage" in out["errors"][0]
    assert r.returncode == 1

    # full run (own JVM)
    r = subprocess.run(
        [sys.executable, "jobs/run_pipeline_job.py", "--config",
         str(cfg_path)], capture_output=True, text=True, cwd="/root/repo",
        timeout=600)
    assert '"status": "complete"' in r.stdout, r.stderr[-2000:]


def test_runner_written_output(spark, tmp_path):
    # verify the pipeline transforms landed (separate session reads output)
    import os

    candidates = [p for p in tmp_path.parent.rglob("out_table")
                  if os.path.isdir(p)]
    # covered by test above writing into its own tmp dir; do a direct run here
    from jobs.run_pipeline_job import build_source, run_sink
    from lucille_spark.pipeline import Pipeline

    inbox = tmp_path / "in2"
    inbox.mkdir()
    (inbox / "a.jsonl").write_text('{"id": "r1", "title": "ABC"}\n')
    df = build_source(spark, {"type": "jsonl", "path": str(inbox),
                              "id_field": "id"})
    p = Pipeline.from_config({"stages": [
        {"class": "NormalizeText", "source": "title", "mode": "lowercase"}]})
    out_dir = str(tmp_path / "res")
    run_sink(p.finish(df), {"type": "parquet", "path": out_dir})
    back = spark.read.parquet(out_dir).collect()
    assert back[0]["title"] == "abc"

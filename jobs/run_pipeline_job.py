"""Config-driven pipeline runner — the Runner.main equivalent
(reference: core/Runner.java:198 config load, :279-320 validation mode,
example topology in application-example.conf:9-100).

    spark-submit --py-files lucille_spark.zip jobs/run_pipeline_job.py \
        --config pipeline.json [--validate]

Config (JSON; same shape as the reference's HOCON):

{
  "source": {"type": "csv", "path": "/data/in", "sep": ","}
          | {"type": "jsonl", "path": ...}
          | {"type": "files", "root": ..., "include_regex": ...}
          | {"type": "parquet", "path": ...}
          | {"type": "sequence", "num_docs": 100},
  "pipeline": {"stages": [{"class": "NormalizeText", ...}, ...]},
  "sink": {"type": "index_table", "table_dir": ...,
           "id_col": "id", ...}
        | {"type": "csv", "path": ..., "columns": [...]}
        | {"type": "parquet", "path": ...}
        | {"type": "search_index", "out_dir": ..., "fields": ["content"]}
}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# when run as a script (spark-submit / python jobs/...), make the repo-root
# package importable; on a cluster --py-files provides it instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_source(spark, cfg):
    kind = cfg.pop("type")
    if kind == "csv":
        from lucille_spark.sources import read_csv_docs

        return read_csv_docs(spark, **cfg)
    if kind == "jsonl":
        from lucille_spark.sources import read_jsonl_docs

        return read_jsonl_docs(spark, **cfg)
    if kind == "files":
        from lucille_spark.sources import FileSource

        incremental = cfg.pop("incremental", False)
        src = FileSource(spark, **cfg)
        return src.read_incremental() if incremental else src.read()
    if kind == "parquet":
        return spark.read.parquet(cfg["path"])
    if kind == "sequence":
        from lucille_spark.sources import sequence_docs

        return sequence_docs(spark, **cfg)
    raise ValueError(f"unknown source type {kind!r}")


def run_sink(df, cfg):
    kind = cfg.pop("type")
    if kind == "index_table":
        from lucille_spark.sinks import IndexSink

        return IndexSink(**cfg).upsert(df)
    if kind == "csv":
        from lucille_spark.sinks import write_csv

        path, columns = cfg.pop("path"), cfg.pop("columns")
        write_csv(df, path, columns, **cfg)
        return {"rows": None, "path": path}
    if kind == "parquet":
        df.write.mode(cfg.get("mode", "overwrite")).parquet(cfg["path"])
        return {"path": cfg["path"]}
    if kind == "search_index":
        from lucille_spark.index.builder import build_index

        return build_index(df, cfg.pop("out_dir"), **cfg)
    raise ValueError(f"unknown sink type {kind!r}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--validate", action="store_true",
                    help="validate the config and exit (Runner -validate)")
    args = ap.parse_args(argv)

    with open(args.config) as fh:
        cfg = json.load(fh)

    from lucille_spark.pipeline import Pipeline

    errors = Pipeline.validate(cfg.get("pipeline", {"stages": []}))
    for k in ("source", "sink"):
        if k not in cfg:
            errors.append(f"missing top-level key {k!r}")
    if args.validate or errors:
        print(json.dumps({"valid": not errors, "errors": errors}))
        sys.exit(1 if errors else 0)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lucille-pipeline").getOrCreate()
    pipeline = Pipeline.from_config(cfg.get("pipeline", {"stages": []}))
    df = build_source(spark, dict(cfg["source"]))
    out = pipeline.finish(df)
    res = run_sink(out, dict(cfg["sink"]))
    print(json.dumps({"status": "complete", "result": res}, default=str))


if __name__ == "__main__":
    main()

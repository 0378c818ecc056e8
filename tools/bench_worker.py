"""One benchmark run at a fixed parallelism, in its own JVM.

Usage: python tools/bench_worker.py CPUS N_DOCS [sf_dir]
Prints one JSON line: build seconds, docs/sec, per-query WAND latency.

Used by bench.py both for the headline numbers and for the two-cluster-size
scaling-efficiency evidence (local[2] vs local[8] standing in for N vs 4N
executors — the pair where this VM's memory bandwidth actually scales ~4x,
see BENCH.md; the job is identical, only parallelism changes, and the
produced index is byte-identical by construction — see index/ordinals.py).

Env knobs:
  BENCH_RUNS=k       run k timed builds in this one JVM (default 1) and
                     report all times + their median — the north rule asks
                     for medians of >=3 runs because this shared-host VM has
                     +-20% run-to-run variance (BENCH.md).
  BENCH_WARMUP=n     run one untimed n-doc warmup build first (default
                     min(10000, N_DOCS) when BENCH_RUNS>1, else 0). Warms
                     JIT/codegen so the timed builds measure the engine,
                     not JVM cold-start.
  BENCH_SKIP_QUERIES=1   skip the WAND latency section.
  BENCH_EXECUTORS=k      multi-JVM local-cluster mode (k executors x 4 cores).
  BENCH_INTERLEAVE=1     command-loop mode for phase-robust scaling pairs:
                     after warmup print READY, then serve "RUN" commands
                     on stdin (one fresh timed build each, answer
                     "TIME <sec>") until "EXIT". bench.py keeps BOTH
                     parallelism levels' JVMs alive and alternates builds
                     between them, so each epoch's low/high pair samples
                     the SAME VM bandwidth phase — the r4 fix for the
                     ratio bias when the two levels were measured minutes
                     apart and a slow phase hit only the 8-core side.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# query sets per corpus vocabulary
DOCS_QUERIES = {
    "wand_or": "content:batch OR content:window",
    "wand_and": "content:hash AND content:merge",
    "wand_single_hot": "content:data",
    "wand_rare": "content:dup",
    "wand_phrase": 'content:"key order"',
}
F1_QUERIES = {
    "wand_or": "content:test OR content:giraffe",
    "wand_and": "content:return AND content:import",
    "wand_single_hot": "content:if",
    "wand_rare": "content:koala",
    "wand_phrase": 'content:"return import"',
}


def _cluster_session(n_exec: int, cores: int = 4, mem_mb: int = 4096):
    """Multi-JVM stand-in for a real N-executor cluster: each executor is
    its own JVM + python workers (spark-submit --py-files semantics)."""
    import subprocess

    from pyspark.sql import SparkSession

    zip_path = os.path.join(tempfile.gettempdir(), "lucille_spark_pkg.zip")
    if not os.path.exists(zip_path):
        root = os.path.join(os.path.dirname(__file__), "..")
        subprocess.run(["zip", "-qr", zip_path, "lucille_spark"],
                       cwd=root, check=True)
    total = n_exec * cores
    spark = (SparkSession.builder
             .master(f"local-cluster[{n_exec},{cores},{mem_mb}]")
             .appName(f"bench-lc-{n_exec}")
             .config("spark.sql.shuffle.partitions", str(total))
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "4g")
             .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
             .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm"
                     ".version", "2")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.addPyFile(zip_path)
    return spark


def main():
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else None
    executors = os.environ.get("BENCH_EXECUTORS")  # local-cluster mode

    from lucille_spark.session import get_spark
    from lucille_spark.index.builder import build_index

    if executors:
        spark = _cluster_session(int(executors))
        cpus = int(executors) * 4
    else:
        spark = get_spark(f"bench-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    n_runs = int(os.environ.get("BENCH_RUNS", "1"))
    warmup = int(os.environ.get(
        "BENCH_WARMUP", str(min(10000, n_docs)) if n_runs > 1 else "0"))

    out = tempfile.mkdtemp(prefix=f"lucille_bench_{cpus}_")
    try:
        if sf_dir:
            from lucille_spark.corpus import documents_as_corpus

            corpus = documents_as_corpus(spark, sf_dir)
            n_docs_actual = None
        else:
            from lucille_spark.corpus import corpus_df

            corpus = corpus_df(spark, n_docs, partitions=cpus * 2)
            n_docs_actual = n_docs

        if warmup:
            from lucille_spark.corpus import corpus_df

            wdir = tempfile.mkdtemp(prefix=f"lucille_warm_{cpus}_")
            try:
                build_index(corpus_df(spark, warmup, partitions=cpus * 2),
                            wdir, fields=("content",), store_positions=True)
            finally:
                shutil.rmtree(wdir, ignore_errors=True)

        if os.environ.get("BENCH_INTERLEAVE") == "1":
            # phase-robust pair mode: the parent alternates RUN commands
            # between this worker and its counterpart at the other
            # parallelism level (see module docstring)
            print("READY", flush=True)
            build_secs = []
            stats = None
            for line in sys.stdin:
                cmd = line.strip()
                if cmd.startswith("WARM "):
                    # untimed warmup build at a caller-chosen size (r6:
                    # bench.py warms both workers CONCURRENTLY at FULL
                    # size — r6 measured a 2/3-size warmup leaving the
                    # first full-size 8-core build 46% over steady, so
                    # only the full size truly absorbs the heap growth;
                    # concurrency keeps the wall cost to one low-side
                    # build since the warmup is untimed anyway)
                    n_warm = int(cmd.split()[1])
                    wdir2 = tempfile.mkdtemp(prefix=f"lucille_w2_{cpus}_")
                    try:
                        from lucille_spark.corpus import corpus_df as _cdf
                        build_index(_cdf(spark, n_warm,
                                         partitions=cpus * 2),
                                    wdir2, fields=("content",),
                                    store_positions=True)
                    finally:
                        shutil.rmtree(wdir2, ignore_errors=True)
                    print("WARMED", flush=True)
                elif cmd == "RUN":
                    shutil.rmtree(out, ignore_errors=True)
                    t0 = time.time()
                    stats = build_index(corpus, out, fields=("content",),
                                        store_positions=True)
                    build_secs.append(round(time.time() - t0, 3))
                    print(f"TIME {build_secs[-1]}", flush=True)
                elif cmd == "EXIT":
                    break
            import statistics

            n = (stats["n_docs"] if n_docs_actual is None and stats
                 else n_docs_actual)
            med = statistics.median(build_secs) if build_secs else 0.0
            print(json.dumps({
                "cpus": cpus, "n_docs": n,
                "build_sec": round(med, 3), "build_secs": build_secs,
                "docs_per_sec": round(n / med, 1) if med else 0.0,
            }), flush=True)
            return

        # wall-clock budget (seconds for this worker, incl. warmup): runs
        # beyond the 3rd are opportunistic — the north rule needs medians
        # of >=3, and finishing inside the driver's bench timeout beats a
        # 4th sample on a slow-VM day
        budget = float(os.environ.get("BENCH_TIME_BUDGET", "0") or 0)
        t_w = time.time()
        build_secs = []
        for r in range(n_runs):
            if (budget and r >= 3 and build_secs
                    and time.time() - t_w + build_secs[-1] > budget):
                break
            # every run rebuilds into a FRESH dir from the same
            # deterministic corpus — identical work, independently timed
            if r > 0:
                shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            stats = build_index(corpus, out, fields=("content",),
                                store_positions=True)
            build_secs.append(round(time.time() - t0, 3))
        import statistics

        build_sec = statistics.median(build_secs)
        n = stats["n_docs"] if n_docs_actual is None else n_docs_actual

        qtimes = {}
        lex_rows = None
        if os.environ.get("BENCH_SKIP_QUERIES") != "1":
            from lucille_spark.query.searcher import IndexSearcher

            searcher = IndexSearcher(out)
            queries = DOCS_QUERIES if sf_dir else F1_QUERIES
            for name, q in queries.items():
                t0 = time.time()
                hits = searcher.search(q, k=10)
                qtimes[name] = round(time.time() - t0, 4)
                assert hits or "rare" in name or "phrase" in name

            lex_rows = spark.read.parquet(os.path.join(out, "lexicon")).count()
        print(json.dumps({
            "cpus": cpus, "n_docs": n, "build_sec": round(build_sec, 3),
            "build_secs": build_secs,
            "docs_per_sec": round(n / build_sec, 1),
            "lexicon_terms": lex_rows,
            "query_sec": qtimes,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark driver: index-build throughput + BM25 query latency + the
two-parallelism scaling-efficiency evidence (north rule, BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": <total suite seconds>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "index_docs_per_sec": ..., "scaling": {...}}

Headline run: build the full compressed index over the documents table at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], then time WAND queries, the DataFrame BM25
executor, dedup and ANN ops.

Scaling evidence: the same index-build job on the deterministic F1 corpus at
local[N_LOW] vs local[N_HIGH] (the sandbox stand-in for N vs 4N executors),
each level in its own persistent JVM (tools/bench_worker.py command loop),
builds ALTERNATING low/high so every epoch's pair samples the same VM
bandwidth phase; every epoch is bracketed by cheap STREAM probes and
QUALIFIED only if the host's bandwidth was not collapsed/inverted during
it (r6: the r5 driver run recorded 0.605 while the probe showed 8 procs
receiving LESS aggregate bandwidth than 2 — that minute measured the
shared host, not the engine); efficiency = median of qualified per-epoch
ratios / core ratio (BENCH.md documents the +-20% variance, the phase
effect, and the collapse signature this excludes).
WAND latencies are medians of BENCH_QUERY_REPS cold-searcher runs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 84k docs x >=3 interleaved low/high epochs (after a 10k-doc JIT
# warmup build in each JVM): the north rule's evidence must be MEDIANS of
# >=3 runs because this shared-host VM swings +-20% run to run (BENCH.md);
# the per-epoch ratio median additionally cancels slow-phase drift (r4).
# Epoch size: the r5 fixed-cost analysis showed BIGGER epochs measure
# truer (the ~4 s per-build fixed cost sits on both sides of the ratio
# and caps measurable efficiency at ~0.77 for ~13 s high-side builds).
# 84k was initially rejected because both sides went superlinear — that
# was SPILL at the default 8g heap; at 24 g (SCALE_WORKER_MEM below) both
# sides build SUB-linearly (8c: 19.3 s vs 2x13.5; 2c: 74.7 vs 2x40) and
# the sequential ratio reads 3.87 where 42k read ~3.0 in the same phase
# (BENCH.md item 15).
SCALE_DOCS = int(os.environ.get("BENCH_SCALE_DOCS", "84000"))
# heap for the two scaling-pair worker JVMs: 84k-doc epochs spill (and go
# superlinear) at the 8g default; 24g holds the encode shuffle + sort in
# memory on both. Two JVMs x 24g on the 128 GiB VM is comfortable.
SCALE_WORKER_MEM = os.environ.get("BENCH_SCALE_WORKER_MEM", "24g")
# 650 (r6; was 545 in r5): the full-size untimed warmup adds ~25 s over
# a 2/3-size one and each epoch now carries a ~10-23 s bracketing probe,
# so 545 left only 3 epochs on a normal day (validation: 502 s total,
# 3 epochs; 620 still only fit 3 in a slow phase at 567 s). 650 lets the
# opportunistic 4th epoch fire (a 4-epoch median resists minute-scale
# host contention) while staying inside the driver budget that accepted
# r5's 672 s artifact.
BUDGET_SEC = float(os.environ.get("BENCH_BUDGET_SEC", "650"))
# early-exit once this many epochs QUALIFY. 3 (was 4 for 42k epochs):
# at 84k an epoch costs ~95-130 s, so chasing a 4th qualified epoch
# mostly means finishing far over budget in mixed weather (run 13:
# 722 s) — the north rule needs medians of >=3, and three qualified
# 84k epochs carry more signal than four 42k ones did.
SCALE_RUNS = int(os.environ.get("BENCH_SCALE_RUNS", "3"))
# r6 probe qualification (VERDICT r5 #1): an epoch measured while the host's
# deliverable bandwidth is collapsed/inverted (the r5 collapse recorded
# 1.4 GB/s at 8 procs vs 2.6 at 2 — MORE procs delivering LESS bandwidth)
# does not measure the engine and is excluded from the headline efficiency
# median. Two tests, both from the bracketing best-of-2 STREAM probes:
#   ratio: hi-bw >= 1.1x lo-bw — the INVERSION signature only. The ratio
#     of two instantaneous probe samples is the noisiest derived quantity
#     here: validation run 11's epoch 4 read 1.15 on its post-bracket
#     while the epoch's own builds were demonstrably clean (ratio 3.52,
#     skew 1.04, both sides at their run minima) — a 1.3 threshold killed
#     a good epoch on probe noise. Interior/asymmetric/near-proportional
#     contention is what the two build-time guards (skew, per-side band)
#     are calibrated for; the probes' job is the two ABSOLUTE floors plus
#     inversion, which builds cannot self-detect when a whole run is
#     uniformly degraded. AND
#   floor: hi-bw >= 22 GB/s. The original 4.0 floor (clean 8-proc
#     readings 9-30, collapse 0.7-1.4) was calibrated on the
#     pre-encode-cache build; the r6 cache fix removed perfectly-parallel
#     compute and left the build bandwidth-exposed enough that the
#     8-core side needs the host's FULL clean-phase bandwidth. The
#     post-fix 84k evidence is sharp on both sides of 22: brackets
#     >= 23 GB/s -> ratios 3.3-4.0 (runs 13/16); brackets 19-21 ->
#     2.2 with every other guard green (run 19: the high side ran 80%
#     over its clean time for the whole run while skew/side/ratio all
#     passed — a uniformly thinned window is self-consistent, only an
#     absolute anchor can see it); brackets ~8.5 -> 2.7 (run 14).
#     Consequence: a QUALIFIED efficiency now only ever comes from a
#     true clean window; every degraded regime reports flagged with the
#     probe series as evidence.
QUAL_RATIO = float(os.environ.get("BENCH_QUAL_RATIO", "1.1"))
QUAL_FLOOR = float(os.environ.get("BENCH_QUAL_FLOOR_GBPS", "22.0"))
# low-side floor (late r6): a 2-proc collapse INFLATES measured ratios
# (the low build slows), and the hi/lo ratio test passes trivially when
# lo collapses (observed: probe {2: 0.5, 8: 19.3} passed while the host
# was mid-collapse). Clean 2-proc readings are 3.9-8.8 GB/s on bad days
# and ~10 on good ones; collapse readings are 0.5-0.8.
QUAL_LO_FLOOR = float(os.environ.get("BENCH_QUAL_LO_FLOOR_GBPS", "1.5"))
MAX_EPOCHS = int(os.environ.get("BENCH_SCALE_MAX_EPOCHS", "6"))
# self-consistency (SKEW) tolerance: an epoch qualifies only if its two
# sides are inflated BY THE SAME FACTOR relative to the run's per-side
# minima — skew = (low/min_low)/(high/min_high) within [1/tol, tol].
# This catches collapse windows INSIDE an epoch that the bracket probes
# straddle (asymmetric: one side inflated, observed 42% on the high
# side and 77% on the low side with clean brackets) while staying
# INVARIANT to uniform phase drift: a first-try per-side band vs the
# run minimum disqualified two good-ratio epochs that were merely 25%
# into a documented slow phase and published the one asymmetric
# low-ratio epoch as the headline (validation run 8, 0.467). Minima
# are safe anchors — host contention only ever inflates, so no outlier
# can deflate them.
SELF_TOL = float(os.environ.get("BENCH_SELF_TOL", "1.2"))
# per-side absolute band (validation run 9): skew alone passed an epoch
# whose BOTH sides were heavily contended but near-proportionally (low
# 1.55x / high 1.31x of the run minima -> skew 1.18, inside the band),
# publishing a host-weather 0.465 as "qualified". Skew stays the primary
# test (invariant to uniform drift), but an epoch whose either side ran
# more than SIDE_TOL x its run minimum was measured in a window too
# contended to represent the engine at all. 1.45 clears the documented
# 25% uniform slow-phase drift plus the <=12% clean same-side spread
# (run 8's good epochs sat at ~1.27x; run 3's high spread was 1.25x)
# while rejecting run 9's 1.55x.
SIDE_TOL = float(os.environ.get("BENCH_SIDE_TOL", "1.45"))
# probe wall-clock cap (validation run 9): in a collapse the probes
# THEMSELVES crawl (26-63 s per bracket vs 3-8 s clean), eating the
# budget the retry loop needs. A probe repeat that exceeds the cap is
# direct collapse evidence — stop probing and let the partial (low)
# reading fail the floors, routing to the cheap sleep-and-re-probe path.
PROBE_CAP_SEC = float(os.environ.get("BENCH_PROBE_CAP_SEC", "20"))


def qualify_epochs(epochs, self_tol=None, side_tol=None):
    """Post-hoc interior-contention qualification (module-level so the
    replay tests can run it against recorded validation-run shapes).

    Each epoch dict arrives with `low`/`high` build seconds and a
    `qualified` flag carrying the bracket-probe verdict; this adds the
    two build-time tests and folds them in:
      - skew: (low/min_low)/(high/min_high) within [1/SELF_TOL, SELF_TOL]
        — catches a collapse that hits ONE side inside an epoch while
        staying invariant to uniform phase drift (validation run 8);
      - side band: each side <= SIDE_TOL x its run minimum — catches a
        NEAR-proportional deep contention that skew tolerates (run 9:
        low 1.55x / high 1.31x -> skew 1.18 "passed" while the window
        measured the host, not the engine). Loose (1.45) so the 25%
        uniform drift + <=12% clean spread skew was built for still pass.
    Minima are safe anchors: host contention only ever inflates.
    """
    self_tol = SELF_TOL if self_tol is None else self_tol
    side_tol = SIDE_TOL if side_tol is None else side_tol
    if not epochs:
        return epochs
    min_low = min(e["low"] for e in epochs)
    min_high = min(e["high"] for e in epochs)
    for e in epochs:
        skew = (e["low"] / min_low) / (e["high"] / min_high)
        e["skew"] = round(skew, 3)
        e["self_consistent"] = 1 / self_tol <= skew <= self_tol
        e["side_ok"] = (e["low"] <= side_tol * min_low
                        and e["high"] <= side_tol * min_high)
        e["qualified"] = (e["qualified"] and e["self_consistent"]
                          and e["side_ok"])
    return epochs
QUERY_REPS = int(os.environ.get("BENCH_QUERY_REPS", "3"))
RUN_SCALING = os.environ.get("BENCH_SCALING", "1") != "0"
# N and 4N cores for the scaling pair. 2->8 is the regime where this VM's
# memory bandwidth actually scales ~4x (tools/membw.py: ~28 GB/s aggregate
# peaks at 8 procs and DEGRADES beyond — 32 procs deliver ~3-16 GB/s), so
# it is the honest in-sandbox stand-in for N vs 4N executors; 8->32 is also
# reported for context against the bandwidth ceiling. See BENCH.md.
SCALE_PAIR = tuple(int(x) for x in
                   os.environ.get("BENCH_SCALE_PAIR", "2,8").split(","))

WAND_QUERIES = {
    "wand_or": "content:batch OR content:window",
    "wand_and": "content:hash AND content:merge",
    "wand_single": "content:data",
    "wand_rare": "content:dup",
    "wand_phrase": 'content:"key order"',
    "wand_bool": "content:merge AND -(content:dup OR content:vector)",
}


def main():
    from lucille_spark.session import get_spark
    from lucille_spark.corpus import documents_as_corpus
    from lucille_spark.index.builder import build_index
    from lucille_spark.query.searcher import IndexSearcher

    t_suite = time.time()
    queries: dict = {}
    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])

    idx_dir = tempfile.mkdtemp(prefix="lucille_bench_idx_")
    try:
        # --- headline: index build over the sf documents corpus ----------
        # r5: cold/steady split (the index_build analogue of the r4
        # query_batch split). Round-5 paired same-phase runs of the r3 and
        # r4 code showed the r4 driver's 17.3 s-vs-12.7 s "regression" was
        # entirely VM phase drift: r3 code cold-built in 16.6 s and r5
        # code in 17.1 s minutes apart on the same day, while the actual
        # build work is ~3-4 s once the JVM is warm (PLANS.md r5). The
        # cold number (JVM codegen + python-worker spinup + first parquet
        # footer reads) stays as `index_build` for series comparability;
        # `index_build_steady` is the best of two further builds (min-of-2
        # shrugs off a single VM spike) and is the number that tracks
        # real builder changes.
        t0 = time.time()
        stats = build_index(documents_as_corpus(spark, SF_DIR), idx_dir,
                            fields=("content",), store_positions=True)
        build_sec = time.time() - t0
        n_docs = stats["n_docs"]
        queries["index_build"] = round(build_sec, 3)
        steady = []
        for _ in range(2):
            sdir = tempfile.mkdtemp(prefix="lucille_bench_idx_s_")
            try:
                t0 = time.time()
                build_index(documents_as_corpus(spark, SF_DIR), sdir,
                            fields=("content",), store_positions=True)
                steady.append(time.time() - t0)
            finally:
                shutil.rmtree(sdir, ignore_errors=True)
        queries["index_build_steady"] = round(sorted(steady)[0], 3)

        # WAND latency = median of QUERY_REPS cold runs: a FRESH searcher
        # per repetition (no decode-cache carryover), so one VM hiccup
        # can't spike a recorded number (VERDICT r2 #1 asked for medians)
        wand_samples = {name: [] for name in WAND_QUERIES}
        for _ in range(QUERY_REPS):
            searcher = IndexSearcher(idx_dir)
            for name, q in WAND_QUERIES.items():
                t0 = time.time()
                searcher.search(q, k=10)
                wand_samples[name].append(time.time() - t0)
        for name, ts in wand_samples.items():
            queries[name] = round(sorted(ts)[len(ts) // 2], 4)

        # --- distributed DataFrame BM25 (the no-index scan path) ---------
        from lucille_spark.gate import (
            ann_cosine_top10, bm25_or, dedup_exact, dedup_minhash_signatures,
            text_quality,
        )

        # distributed query-batch throughput (queries are the parallel unit)
        from lucille_spark.query.executor_df import search_batch

        # median of >=3 runs (VERDICT r3 #3: this was the one single-run
        # bench number and it swung 59% on VM noise). Run 1 is the cold
        # search tier (python-worker spinup + per-worker searcher opens)
        # and is recorded separately; runs 2+ hit the version-keyed
        # per-worker searcher cache — the steady-state throughput any
        # long-lived search tier actually serves at.
        batch_queries = [(f"q{i}", q) for i in range(30)
                         for q in [list(WAND_QUERIES.values())[i % len(WAND_QUERIES)]]]
        batch_samples = []
        for rep in range(max(QUERY_REPS, 3)):
            t0 = time.time()
            search_batch(spark, idx_dir, batch_queries, k=10).count()
            batch_samples.append(time.time() - t0)
        queries["query_batch_30_cold"] = round(batch_samples[0], 3)
        warm = sorted(batch_samples[1:])
        batch_sec = (warm[(len(warm) - 1) // 2] + warm[len(warm) // 2]) / 2
        queries["query_batch_30"] = round(batch_sec, 3)

        # median of 3 per op (r4): the first execution of a fresh plan
        # pays whole-stage-codegen compilation + parquet footer reads —
        # a cold bm25_df_or recorded 7.2s where steady state is ~1.2s
        for name, fn in [("bm25_df_or", bm25_or),
                         ("dedup_exact", dedup_exact),
                         ("dedup_minhash", dedup_minhash_signatures),
                         ("ann_cosine", ann_cosine_top10),
                         ("text_quality", text_quality)]:
            samples = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, SF_DIR).count()
                samples.append(time.time() - t0)
            queries[name] = round(sorted(samples)[1], 3)

        # --- incremental-merge flatness: per-batch merge cost must stay
        # flat as the index grows (O(delta+lexicon) lexicon maintenance,
        # not O(postings) rescan — VERDICT r1 item 2). 6 consecutive
        # 100-doc StreamingIndexer-style merges into the headline index.
        from pyspark.sql import functions as F

        from lucille_spark.corpus import corpus_df
        from lucille_spark.index.merge import merge_index

        merge_sec = []
        shuf_before = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")  # 100-doc deltas
        for b in range(4):
            delta = corpus_df(spark, 100, partitions=2).withColumn(
                "repo", F.concat(F.lit(f"bench{b}/"), F.col("repo")))
            t0 = time.time()
            merge_index(delta, idx_dir, fields=("content",),
                        run_id=f"bench-m{b}")
            merge_sec.append(round(time.time() - t0, 3))
        spark.conf.set("spark.sql.shuffle.partitions", shuf_before)
        queries["merge_batch_first"] = merge_sec[0]
        queries["merge_batch_last"] = merge_sec[-1]
        # growth ratio robust to single-batch VM spikes (r4: one noisy
        # batch made last/second read 1.22 on a flat series): the cost
        # FLOOR of the last two batches vs batch 2 (batch 1 pays JVM
        # warmup). A merge whose cost grows with index size raises the
        # late floor; one slow late batch cannot.
        merge_flatness = round(min(merge_sec[2:]) / max(merge_sec[1], 1e-9),
                               3)
        # VERDICT r4 #7: carry BOTH flatness definitions for one round so
        # the series stays comparable — `merge_flatness` (r4 floor-based,
        # robust to one noisy late batch) and the r3 last/second ratio.
        merge_flatness_last_over_second = round(
            merge_sec[-1] / max(merge_sec[1], 1e-9), 3)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()

    # --- scaling evidence: same job, two cluster sizes, INTERLEAVED ----
    # r4 methodology fix: both levels' JVMs stay alive (bench_worker
    # BENCH_INTERLEAVE command loop) and builds ALTERNATE low/high, so
    # each epoch's pair samples the same VM bandwidth phase. Efficiency =
    # median of per-epoch ratios / core ratio — robust to the multi-hour
    # slow phases that used to bias the ratio when the two levels ran
    # minutes apart (a slow phase hits the bandwidth-bound 8-core side
    # ~15% harder than the CPU-bound 2-core side; observed 0.827 vs 0.746
    # across two otherwise-identical round-4 runs).
    scaling = None
    if RUN_SCALING:
        lo, hi = SCALE_PAIR
        # r5 budget shape: timed epochs ALWAYS run at the full SCALE_DOCS.
        # A same-JVM size sweep (PLANS.md r5) showed measured efficiency
        # RISES with build size (per-build fixed overhead is a constant
        # added to both sides of the ratio), so shrinking the timed
        # epochs — the first r5 attempt — systematically understates
        # efficiency. r6 moved the other way: 42k -> 84k epochs once the
        # 24 g worker heap removed the spill that had made 84k look
        # superlinear (BENCH.md item 15; sequential 84k ratio 3.87 vs
        # ~3.0 at 42k in the same phase). The untimed warmup epoch runs
        # CONCURRENTLY on both workers at full size.
        scale_docs = SCALE_DOCS

        def _die_with_parent():
            # if bench.py is killed (driver timeout), the workers and
            # their JVMs must die too — an orphaned 2-core build poisons
            # every later measurement on this box
            import ctypes
            import signal as _sig

            ctypes.CDLL("libc.so.6", use_errno=True).prctl(
                1, _sig.SIGKILL)  # PR_SET_PDEATHSIG

        env = dict(os.environ, BENCH_SKIP_QUERIES="1", BENCH_INTERLEAVE="1",
                   SPARK_DRIVER_MEM=SCALE_WORKER_MEM)
        worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_worker.py")
        procs = {
            cpus: subprocess.Popen(
                [sys.executable, worker, str(cpus), str(scale_docs)],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, text=True, bufsize=1, env=env,
                preexec_fn=_die_with_parent)
            for cpus in (lo, hi)
        }

        def await_line(p, prefix):
            while True:
                line = p.stdout.readline()
                if not line:
                    raise RuntimeError("bench worker exited early")
                if line.strip().startswith(prefix):
                    return line.strip()

        # warmups run concurrently inside each worker before READY
        for cpus in (lo, hi):
            await_line(procs[cpus], "READY")

        def _epoch(flip: bool = False):
            # alternate the within-epoch order (low,high / high,low):
            # a monotonic VM drift otherwise biases every epoch's ratio
            # in the SAME direction; flipping cancels the direction term
            order = (hi, lo) if flip else (lo, hi)
            times = {}
            for cpus in order:
                p = procs[cpus]
                p.stdin.write("RUN\n")
                p.stdin.flush()
                times[cpus] = float(await_line(p, "TIME").split()[1])
            return [times[lo], times[hi]]

        # one UNTIMED FULL-SIZE epoch first: the 10k in-JVM warmup does
        # not warm the full-size path — the first 42k build at 8 cores
        # ran ~70% slow (heap growth for the bigger shuffle), which
        # biased epoch-1 ratios. r6 measured the residual with a 2/3-size
        # warmup: the first full-size 8-core build STILL ran 46% over
        # steady (33.1 s vs 22.6) under clean probes, costing the
        # qualified median 0.07+ efficiency — so the warmup builds at the
        # full SCALE_DOCS (concurrently per level, untimed, so the extra
        # wall clock is one low-side build). On a slow-VM day (tight
        # remaining budget) it is skipped: the residual epoch-1 bias then
        # UNDERSTATES efficiency (the high side is the one penalized), so
        # the recorded number stays a conservative lower bound rather
        # than blowing the driver timeout.
        warmup_note = None
        warm_wall = None
        # 480: warmup wall (~one 84k low-side build, 75-150 s) + three
        # 84k epochs (~330 s) + probes. Below that the suite already ate
        # the budget (slow phase) — skipping the warmup biases epoch 1
        # AGAINST us (the high side pays the heap growth), so the
        # recorded number stays a conservative lower bound instead of
        # finishing 100+ s over the driver precedent (run 15: 751 s).
        if BUDGET_SEC - (time.time() - t_suite) >= 480:
            t_warm = time.time()
            n_warm = scale_docs
            for cpus in (lo, hi):
                procs[cpus].stdin.write("WARM %d\n" % n_warm)
                procs[cpus].stdin.flush()
            for cpus in (lo, hi):
                await_line(procs[cpus], "WARMED")
            warm_wall = time.time() - t_warm
            warmup_note = ("concurrent untimed full-size %d-doc build "
                           "per level" % n_warm)

        # --- probe-qualified epochs (r6, VERDICT r5 #1) ----------------
        # bench.py used to measure whatever minute it landed on; the r5
        # driver artifact recorded efficiency 0.605 because the host's
        # bandwidth INVERTED mid-run (membw {2: 2.6, 8: 1.4}) while the
        # same code measured 0.861 in a clean window. Each timed epoch is
        # now bracketed by a cheap STREAM probe at both pair levels; the
        # epoch is QUALIFIED iff both bracketing probes show hi-bw >=
        # QUAL_RATIO x lo-bw AND hi-bw >= QUAL_FLOOR GB/s (a deep
        # proportional collapse passes the ratio test but starves the
        # bandwidth-hungrier 8-core side disproportionately — BENCH.md
        # r6 method note). The headline `efficiency` is the median
        # over qualified epochs (all epochs remain in the artifact as
        # context); epochs are retried until SCALE_RUNS qualified or
        # budget. If the pre-probe already shows collapse and there is
        # budget slack beyond the >=3-epoch floor, we SLEEP and re-probe
        # (collapse windows are minute-granularity) rather than burn a
        # ~120 s epoch that is known-disqualified. Timed epochs stay at
        # full SCALE_DOCS always (the fixed-cost analysis forbids
        # shrinking them).
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from membw import measure as _membw

        probe_secs = []

        def _probe():
            # cheap but MUST be best-of-2: a single repeat folds Pool
            # startup + first-touch page backing into the timing and
            # reads 0.3-1.4 GB/s even on a clean host (calibrated r6 —
            # best-of-2 reads 6-30 GB/s on the same minutes, 1-8 s per
            # pair). Runs while both worker JVMs sit idle between RUN
            # commands, so it reads host state, not our own load.
            try:
                t0 = time.time()
                p = {}
                for c in (lo, hi):
                    best = 0.0
                    for _ in range(2):
                        best = max(best, _membw(c, iters=2, repeats=1))
                        if time.time() - t0 > PROBE_CAP_SEC:
                            # a repeat this slow IS the collapse — stop
                            # paying for more evidence (run 9: brackets
                            # cost 26-63 s mid-collapse); a partial/
                            # single-repeat reading is biased LOW, so it
                            # fails the floors and the epoch loop takes
                            # the cheap sleep path instead
                            break
                    p[c] = best
                    if time.time() - t0 > PROBE_CAP_SEC and len(p) < 2:
                        p[hi if c == lo else lo] = 0.0  # unmeasured
                        break
                probe_secs.append(round(time.time() - t0, 1))
                return p
            except Exception:  # probe must never sink the artifact
                return None

        def _clean(p):
            # None (probe failed) cannot disqualify: no evidence
            return p is None or (p[hi] >= QUAL_RATIO * max(p[lo], 1e-9)
                                 and p[hi] >= QUAL_FLOOR
                                 and p[lo] >= QUAL_LO_FLOOR)

        epochs = []  # {low, high, ratio, pre, post, qualified}
        # est_epoch seeds from the just-measured full-size warmup (the
        # concurrent warmup's wall clock IS one low-side build) — the old
        # flat 200 s seed made the sleep-on-collapse branch unreachable
        # until after three epochs (4x200+90 > the whole budget), so an
        # early-run collapse burned known-disqualified epochs instead of
        # waiting it out (validation run 11: epochs 1-2 ran under 0.3-0.4
        # GB/s 8-proc probes with wait_sec=0).
        est_epoch = (warm_wall + 40.0) if warm_wall else 200.0
        wait_sec = 0.0
        pre = _probe()
        while len(epochs) < MAX_EPOCHS:
            if sum(e["qualified"] for e in epochs) >= SCALE_RUNS:
                break
            remaining = BUDGET_SEC - (time.time() - t_suite)
            if len(epochs) >= 3 and remaining < est_epoch + 30:
                # epochs beyond the 3rd are opportunistic: the north rule
                # needs medians of >=3 pairs, and finishing inside the
                # driver timeout beats another sample on a slow-VM day
                break
            owed = max(0, 3 - len(epochs))  # epochs owed to the >=3 floor
            # sleep costs one sleep+re-probe cycle (~35 s), not an epoch:
            # reserve budget for the owed epochs plus that cycle only
            if (not _clean(pre)
                    and remaining - 35 > owed * est_epoch + 60):
                time.sleep(20)
                wait_sec += 20
                pre = _probe()
                continue
            pair = _epoch(flip=len(epochs) % 2 == 1)
            post = _probe()
            epochs.append({
                "low": pair[0], "high": pair[1],
                "ratio": pair[0] / pair[1],
                "pre": pre, "post": post,
                "qualified": _clean(pre) and _clean(post),
            })
            est_epoch = pair[0] + pair[1] + (probe_secs[-1]
                                             if probe_secs else 5.0)
            pre = post  # post-probe doubles as the next epoch's pre-probe

        # second qualification test, post-hoc (r6, validation runs 2+8):
        # a collapse window INSIDE a ~100 s epoch can hide between two
        # clean bracket probes — observed: an epoch bracketed 19.5/18.2
        # GB/s clean yet built 42% over the run's demonstrated-best
        # 8-core time, putting a host-weather 0.557 into the "qualified"
        # headline. The builds themselves are the best probe of their
        # own interval, but the test must be on the epoch's SKEW (one
        # side off-trend relative to the other), not per-side absolute
        # bands: uniform slow-phase drift inflates both sides together
        # and leaves the ratio valid — that is the interleaved design's
        # whole point — while an interior collapse hits one side.
        # Post-hoc because the per-side minima need the whole run.
        qualify_epochs(epochs)
        lows = [e["low"] for e in epochs]
        highs = [e["high"] for e in epochs]
        results = {}
        for cpus in (lo, hi):
            p = procs[cpus]
            p.stdin.write("EXIT\n")
            p.stdin.flush()
            results[cpus] = json.loads(await_line(p, "{"))
            p.wait(timeout=120)

        def _median(xs):
            s = sorted(xs)
            return (s[(len(s) - 1) // 2] + s[len(s) // 2]) / 2

        ratios = [e["ratio"] for e in epochs]
        q_eps = [e for e in epochs if e["qualified"]]
        # headline = qualified median. If NO epoch qualified, the flagged
        # fallback medians the best-evidence subset: epochs whose BUILD
        # signatures are clean (skew + side band) but whose bracket
        # probes saw weather — a probe-killed epoch with clean builds is
        # "maybe-clean", while a build-guard-failed epoch is a proven
        # collapse that would only pollute the fallback (run 17: an 85.8s
        # 8-core collapse build dragged the all-epoch fallback to 0.679
        # while the build-clean epochs medianed 0.79). All-epoch median
        # only if nothing passes even the build guards; the basis is
        # recorded in `fallback_basis` and the number stays flagged
        # (`efficiency_qualified: false`) either way.
        build_ok = [e for e in epochs
                    if e.get("self_consistent") and e.get("side_ok")]
        use = q_eps or build_ok or epochs
        fallback_basis = ("qualified" if q_eps
                          else "build-guard-passing" if build_ok else "all")
        use_lows = [e["low"] for e in use]
        use_highs = [e["high"] for e in use]
        use_ratios = [e["ratio"] for e in use]
        eff = _median(use_ratios) / (hi / lo)
        thr_low = round(scale_docs / _median(use_lows), 1)
        thr_high = round(scale_docs / _median(use_highs), 1)
        scaling = {
            "n_docs": scale_docs,
            "runs_per_level": len(lows),
            "method": (f"{len(lows)} interleaved low/high epochs "
                       "(both JVMs live, alternating builds, within-epoch "
                       "order flipped each epoch) after a per-JVM 10k "
                       "warmup AND one concurrent untimed FULL-SIZE "
                       "warmup build; each epoch bracketed by best-of-2 "
                       "STREAM probes at both levels, qualified iff "
                       f"hi-bw >= {QUAL_RATIO}x lo-bw AND hi-bw >= "
                       f"{QUAL_FLOOR} GB/s AND lo-bw >= {QUAL_LO_FLOOR} "
                       "GB/s on both brackets AND epoch skew "
                       "(low/min_low)/(high/min_high) within "
                       f"[1/{SELF_TOL}, {SELF_TOL}] (interior-collapse "
                       "guard, invariant to uniform phase drift) AND "
                       f"each side <= {SIDE_TOL}x its run minimum "
                       "(near-proportional deep-contention guard); "
                       "efficiency = median of QUALIFIED per-epoch "
                       "ratios / core ratio"),
            "warmup_note": warmup_note,
            "cpus_low": lo, "docs_per_sec_low": thr_low,
            "build_secs_low": lows,
            "cpus_high": hi, "docs_per_sec_high": thr_high,
            "build_secs_high": highs,
            "epoch_ratios": [round(r, 3) for r in ratios],
            "epoch_qualified": [e["qualified"] for e in epochs],
            "epoch_probes_gbps": [
                {"pre": e["pre"], "post": e["post"]} for e in epochs],
            "epoch_self_consistent": [
                e.get("self_consistent") for e in epochs],
            "epoch_skew": [e.get("skew") for e in epochs],
            "epoch_side_ok": [e.get("side_ok") for e in epochs],
            "n_qualified": len(q_eps),
            "qual_ratio": QUAL_RATIO,
            "qual_lo_floor_gbps": QUAL_LO_FLOOR,
            "self_tol": SELF_TOL,
            "side_tol": SIDE_TOL,
            "probe_cap_sec": PROBE_CAP_SEC,
            "qual_floor_gbps": QUAL_FLOOR,
            "probe_secs": probe_secs,
            "probe_wait_sec": round(wait_sec, 1),
            "speedup": round(_median(use_ratios), 3),
            "efficiency": round(eff, 3),
            "efficiency_qualified": bool(q_eps),
            "fallback_basis": fallback_basis,
            # labeled context metrics, not the headline: all-epoch median
            # is the r5-series continuity metric (pre-qualification
            # definition); best epoch bounds what the engine reaches when
            # host contention briefly lifts; ratio-of-medians is the
            # r3-series continuity metric (over qualified epochs)
            "efficiency_all_epochs": round(_median(ratios) / (hi / lo), 3),
            "efficiency_best_epoch": round(max(ratios) / (hi / lo), 3),
            "efficiency_ratio_of_medians": round(
                (_median(use_lows) / _median(use_highs)) / (hi / lo), 3),
        }
        queries["scaling_low_build"] = round(_median(use_lows), 3)
        queries["scaling_high_build"] = round(_median(use_highs), 3)
        # host-state context (r5): the shared-host VM's deliverable
        # bandwidth swings by >5x between phases (membw probe recorded
        # 1.7 GB/s at 2 procs during one r5 run vs ~14 in clean phases),
        # and the 8-core side of the pair is the bandwidth-sensitive
        # one — so every efficiency number must be read against the
        # host state it was measured in. r6: the per-epoch bracket
        # probes already measured exactly this — reuse the final
        # bracket instead of paying another ~15-30 s probe.
        last_probe = next((e["post"] for e in reversed(epochs)
                           if e["post"] is not None), pre)
        if last_probe is not None:
            scaling["membw_gbps"] = {str(c): last_probe[c]
                                     for c in (lo, hi)}
        else:
            try:
                scaling["membw_gbps"] = {str(c): _membw(c, repeats=2)
                                         for c in (lo, hi)}
            except Exception as e:  # probe must never sink the artifact
                scaling["membw_gbps"] = {"error": str(e)}

    out = {
        "metric": ("index-build docs/sec + BM25 WAND top-k latency + "
                   "dedup/ANN suite; N vs 4N scaling via "
                   f"local[{SCALE_PAIR[0]}] vs local[{SCALE_PAIR[1]}]"),
        "value": round(time.time() - t_suite, 2),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_docs": n_docs,
        # headline throughput = the at-scale build (the sf documents corpus
        # is only ~5k docs at sf0.1 — fixed-cost dominated); the tiny-corpus
        # number is kept alongside for completeness
        "index_docs_per_sec": (scaling["docs_per_sec_high"] if scaling
                               else round(n_docs / build_sec, 1)),
        "index_docs_per_sec_sf_corpus": round(n_docs / build_sec, 1),
        "query_batch_qps": round(30 / batch_sec, 1),
        "merge_batch_sec": merge_sec,
        "merge_flatness": merge_flatness,
        "merge_flatness_last_over_second": merge_flatness_last_over_second,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

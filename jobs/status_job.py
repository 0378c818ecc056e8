"""Run status / history over an index's lineage ledger — the minimal
RunnerManager surface (reference: core/RunnerManager.java:21-110, which
tracks run ids, in-flight status and run history; our runs checkpoint into
the per-index ``_lineage`` parquet table instead of an in-memory map, so
status survives the driver).

Driver-side pyarrow reads only — no Spark session needed:

    python jobs/status_job.py --index /path/to/index             # summary
    python jobs/status_job.py --index /path/to/index --runs      # history
    python jobs/status_job.py --index /path/to/index --run-id m1 # one run
    python jobs/status_job.py --index /path --json               # machine

Exit code 0 when the latest run completed its final stage, 1 otherwise
(the `runStatus` answer RunnerManager gives the REST layer)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_table(path):
    import pyarrow.dataset as ds

    try:
        return ds.dataset(path).to_table().to_pylist()
    except Exception:
        return []


def gather(index_dir: str) -> dict:
    lineage = read_table(os.path.join(index_dir, "_lineage"))
    lineage.sort(key=lambda r: r.get("finished_at") or 0.0)
    runs: dict = {}
    for r in lineage:
        runs.setdefault(r["run_id"], []).append(r)
    meta = read_table(os.path.join(index_dir, "_meta"))
    meta_row = (max(meta, key=lambda r: r.get("updated_at", 0.0))
                if meta else None)
    stats = read_table(os.path.join(index_dir, "corpus_stats"))
    tombs = read_table(os.path.join(index_dir, "_tombstones"))
    return {
        "index_dir": index_dir,
        "runs": {
            rid: {
                "stages": [
                    {"stage": s["stage"], "status": s["status"],
                     "n_rows": s["n_rows"],
                     "seconds": round(s["seconds"], 3)}
                    for s in sorted(rows, key=lambda x: x["finished_at"])],
                "started_at": min(s["started_at"] for s in rows),
                "finished_at": max(s["finished_at"] for s in rows),
                "complete": all(s["status"] == "complete" for s in rows),
            }
            for rid, rows in runs.items()
        },
        "latest_run": lineage[-1]["run_id"] if lineage else None,
        "version": meta_row["version"] if meta_row else None,
        "ord_span": meta_row["ord_span"] if meta_row else None,
        "live_docs": stats[0]["n_docs"] if stats else None,
        "tombstones": len(tombs),
        "fields": [r["field"] for r in stats],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--runs", action="store_true", help="full run history")
    ap.add_argument("--run-id", help="one run's stage detail")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    st = gather(args.index)
    if args.json:
        print(json.dumps(st, default=str))
    elif args.run_id:
        run = st["runs"].get(args.run_id)
        if run is None:
            print(f"run {args.run_id!r} not found "
                  f"(known: {sorted(st['runs'])})")
            sys.exit(1)
        print(f"run {args.run_id}: "
              f"{'complete' if run['complete'] else 'incomplete'}")
        for s in run["stages"]:
            print(f"  {s['stage']:<14} {s['status']:<10} "
                  f"rows={s['n_rows']:<10} {s['seconds']}s")
    elif args.runs:
        for rid, run in st["runs"].items():
            stages = ",".join(s["stage"] for s in run["stages"])
            print(f"{rid:<16} {'complete' if run['complete'] else 'INCOMPLETE'}"
                  f"  stages=[{stages}]")
    else:
        latest = st["runs"].get(st["latest_run"], {})
        print(f"index       : {st['index_dir']}")
        print(f"version     : {st['version']}")
        print(f"live docs   : {st['live_docs']}  "
              f"(ord_span={st['ord_span']}, tombstones={st['tombstones']})")
        print(f"fields      : {','.join(st['fields'])}")
        print(f"runs        : {len(st['runs'])} "
              f"(latest={st['latest_run']}, "
              f"{'complete' if latest.get('complete') else 'incomplete'})")

    latest = st["runs"].get(st["latest_run"])
    sys.exit(0 if latest and latest["complete"] else 1)


if __name__ == "__main__":
    main()

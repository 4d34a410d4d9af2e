"""Stage-attribution pass for p_sort_desc_rank's recurring median-only
bench flag (three rounds running; best-of level or improving each time).

The dp_exact_dedup playbook (SCALE.md "cold-JIT measurement artifact"):
run the query under controlled JIT states in SEPARATE PROCESSES (a
stopped-and-recreated session shares the warm JVM, which is exactly the
variable under test), split out the plan's components, and read one
run's event-log timeline, so a future median-only flag on this query
self-adjudicates from the written verdict instead of drawing a fourth
round of review attention.

Experiments (each row = fresh python process, sf0.1, 7 hot runs):
- isolated AQE on      — what the bench guard's A/B sees cold
- isolated AQE off     — how much of the jitter is AQE's driver barrier
- bench-context        — full 22-query headline protocol first, then 7
- components (one process): scan+project only; TakeOrderedAndProject
  (orderBy+limit 5, no rank); full query (top-k + 5-row window + sort)

Writes the "p_sort_desc_rank median jitter" section of SCALE.md.
Usage: python tools/sort_rank_attribution.py [--runs 7]
Internal: --mode <name> runs one experiment and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.1"
NAME = "p_sort_desc_rank"


def arg(flag: str, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def hot_runs(spark, fn, runs: int) -> list[float]:
    out = []
    for _ in range(runs):
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.monotonic() - t0, 4))
    return out


def stats(samples: list[float]) -> dict:
    s = sorted(samples)
    mid = len(s) // 2
    med = s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2
    return {"best": s[0], "median": round(med, 4), "runs": samples}


def run_mode(mode: str, runs: int) -> dict:
    sys.path.insert(0, REPO)
    from victorialogs_spark.driver_entry import QUERIES
    from victorialogs_spark.schema import events_as_logs
    from victorialogs_spark.session import get_spark

    extra = {}
    evlog_dir = None
    if mode == "isolated_aqe_on":
        import shutil

        evlog_dir = "/tmp/sortrank-evlog"
        shutil.rmtree(evlog_dir, ignore_errors=True)
        os.makedirs(evlog_dir, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evlog_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    if mode == "isolated_aqe_off":
        extra = {"spark.sql.adaptive.enabled": "false"}
    spark = get_spark(f"sortrank-{mode}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    events_as_logs(spark, SF_DIR).count()  # reader init only

    fn = QUERIES[NAME]
    result: dict = {"mode": mode}

    if mode == "bench_context":
        # the full headline protocol, one pass, before timing (bench.py's
        # HEADLINE list; 1 run each is enough to push scheduler/codegen
        # driver classes through C2 — measured on dp_exact_dedup)
        import bench

        from victorialogs_spark.schema import load_table

        load_table(spark, SF_DIR, "lineitem").count()
        load_table(spark, SF_DIR, "orders").count()
        for q in bench.HEADLINE:
            QUERIES[q](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        result["timings"] = stats(hot_runs(spark, fn, runs))
    elif mode == "components":
        from pyspark.sql import functions as F

        logs = events_as_logs(spark, SF_DIR)
        proj = logs.select("value", "event_id")

        def scan_only(s, d):
            return proj

        def topk_no_rank(s, d):
            return proj.orderBy(
                F.col("value").desc(), F.col("event_id").desc()
            ).limit(5)

        result["scan_project"] = stats(hot_runs(spark, scan_only, runs))
        result["topk_no_rank"] = stats(hot_runs(spark, topk_no_rank, runs))
        result["full_query"] = stats(hot_runs(spark, fn, runs))
    else:
        result["timings"] = stats(hot_runs(spark, fn, runs))

    if evlog_dir is not None:
        # timeline of the LAST hot run from the event log: job/stage
        # submit->complete walls, plus the gaps (driver planning)
        spark.stop()
        events = []
        # Spark 4 writes a rolling event-log v2 DIRECTORY per app
        for root, _dirs, files in os.walk(evlog_dir):
            for f in files:
                if "appstatus" in f:
                    continue
                with open(os.path.join(root, f), errors="ignore") as fh:
                    for line in fh:
                        try:
                            events.append(json.loads(line))
                        except json.JSONDecodeError:
                            pass
        jobs = [e for e in events if e.get("Event") == "SparkListenerJobStart"]
        ends = {
            e["Job ID"]: e
            for e in events
            if e.get("Event") == "SparkListenerJobEnd"
        }
        stages = {
            e["Stage Info"]["Stage ID"]: e["Stage Info"]
            for e in events
            if e.get("Event") == "SparkListenerStageCompleted"
        }
        # the last hot run = the last contiguous burst of jobs
        jobs.sort(key=lambda e: e["Submission Time"])
        tail = []
        for e in reversed(jobs):
            if tail and tail[-1]["Submission Time"] - e["Submission Time"] > 2000:
                break
            tail.append(e)
        tail.reverse()
        tl = []
        for e in tail:
            jid = e["Job ID"]
            end = ends.get(jid, {})
            sids = e.get("Stage IDs", [])
            st = [
                {
                    "stage": sid,
                    "name": stages[sid]["Stage Name"].split("\n")[0][:60],
                    "ms": (
                        stages[sid].get("Completion Time", 0)
                        - stages[sid].get("Submission Time", 0)
                    ),
                    "tasks": stages[sid].get("Number of Tasks"),
                }
                for sid in sids
                if sid in stages
            ]
            tl.append(
                {
                    "job": jid,
                    "wall_ms": end.get("Completion Time", 0)
                    - e["Submission Time"],
                    "stages": st,
                }
            )
        result["last_run_timeline"] = tl
    return result


def main() -> int:
    mode = arg("--mode", None)
    runs = int(arg("--runs", 7))
    if mode:
        print(json.dumps(run_mode(mode, runs)))
        return 0

    results = {}
    for m in ("isolated_aqe_on", "isolated_aqe_off", "components",
              "bench_context"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", m,
             "--runs", str(runs)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            results[m] = json.loads(line)
        except json.JSONDecodeError:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise
        print(f"# {m}: done", file=sys.stderr)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Curation-pipeline memory envelope at Nx (default 100x): run the
end-to-end `dp_curate_packed` entry (gopher-rules filter -> exact dedup
-> decontamination -> quality gate -> sequence packing) over the
replicated documents table and record, alongside wall time:

- the Spark JVM's PEAK resident set (/proc/<pid>/status VmHWM — the
  hard number for "does this fit the 128 GiB sandbox");
- total shuffle memory/disk spill from task metrics (event log), the
  signal that executor memory was exceeded and the operator degraded
  to spill instead of OOM;
- peak task execution memory (the largest single-task footprint — what
  a real cluster must provision per task slot).

The 100x/1000x events soaks proved the READ path; this measures the
curation pipeline's memory axis, which wall-time alone can't show.

Usage: python tools/curate_soak.py [--factor N] [--entries a,b,c]
Reuses the scale_soak replica at /tmp/vl_scale<N> (builds it if
absent). Updates ONLY its own SCALE.md section.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

FACTOR = 100
if "--factor" in sys.argv:
    FACTOR = int(sys.argv[sys.argv.index("--factor") + 1])

ENTRIES = ["dp_curate_packed", "dp_curate", "dp_dup_clusters"]
if "--entries" in sys.argv:
    ENTRIES = sys.argv[sys.argv.index("--entries") + 1].split(",")

EVDIR = f"/tmp/vl_curate_soak_eventlog{FACTOR}"


def jvm_peak_rss_gb() -> float | None:
    """Peak resident set of this session's Spark JVM (VmHWM)."""
    try:
        out = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True, timeout=10,
        ).stdout.split()
        peaks = []
        for pid in out:
            with open(f"/proc/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmHWM:"):
                        peaks.append(int(line.split()[1]))  # kB
        return max(peaks) / 1024 / 1024 if peaks else None
    except Exception:  # noqa: BLE001 — measurement-only helper
        return None


def spill_stats() -> dict:
    """Sum spill + peak execution memory from the rolling event log."""
    mem_spill = disk_spill = 0
    peak_exec = 0
    for d in glob.glob(EVDIR + "/eventlog_v2_*"):
        for f in glob.glob(d + "/events_*"):
            if f.endswith(".zstd"):
                raw = subprocess.run(
                    ["zstd", "-dc", f], capture_output=True, timeout=120
                ).stdout
            else:
                raw = open(f, "rb").read()
            for line in raw.splitlines():
                if not line.startswith(b'{"Event":"SparkListenerTaskEnd"'):
                    continue
                m = json.loads(line).get("Task Metrics") or {}
                mem_spill += m.get("Memory Bytes Spilled", 0)
                disk_spill += m.get("Disk Bytes Spilled", 0)
                peak_exec = max(peak_exec, m.get("Peak Execution Memory", 0))
    gb = 1024 ** 3
    return {
        "memory_spilled_gb": round(mem_spill / gb, 2),
        "disk_spilled_gb": round(disk_spill / gb, 2),
        "peak_task_exec_mem_gb": round(peak_exec / gb, 3),
    }


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # event logging must be on from session birth (can't be enabled on a
    # live context) — get_spark's extra_conf exists for exactly this
    from victorialogs_spark.session import get_spark

    spark = get_spark("curate-soak", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVDIR}",
    })
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.join(repo, "tools"))
    import scale_soak

    scale_soak.FACTOR = FACTOR
    dst = f"/tmp/vl_scale{FACTOR}"
    scale_soak.build(spark, "/root/testdata/sf0.1", dst)

    from victorialogs_spark.driver_entry import QUERIES

    rows = []
    for name in ENTRIES:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = QUERIES[name](spark, dst)
        df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        peak = jvm_peak_rss_gb()
        rows.append({
            "name": name, "wall_sec": round(wall, 1),
            "jvm_peak_rss_gb": round(peak, 1) if peak is not None else None,
        })
        suffix = f", JVM peak RSS {peak:.1f} GiB" if peak is not None else ""
        print(f"# {name}: {wall:.1f}s{suffix}", file=sys.stderr)
    sp = spill_stats()
    spark.stop()
    summary = {"factor": FACTOR, "entries": rows, **sp}
    print(json.dumps(summary))

    marker = f"## curation pipeline memory envelope at {FACTOR}x"
    lines = [
        f"{marker} (round 12)",
        "",
        f"`dp_curate_packed` (and companions) end-to-end over the {FACTOR}x"
        " documents replica on local[32] / 32 GiB driver heap"
        " (tools/curate_soak.py). JVM peak RSS = /proc VmHWM (cumulative"
        " high-water across the listed runs, in run order); spill totals"
        " summed from task metrics across the whole session.",
        "",
        "| entry | wall s | JVM peak RSS after run (GiB) |",
        "|---|---|---|",
    ]
    for r in rows:
        rss = r["jvm_peak_rss_gb"]
        lines.append(
            f"| {r['name']} | {r['wall_sec']} |"
            f" {'n/a' if rss is None else rss} |"
        )
    lines += [
        "",
        f"Session totals: {sp['memory_spilled_gb']} GiB memory-spilled,"
        f" {sp['disk_spilled_gb']} GiB disk-spilled, largest single-task"
        f" execution memory {sp['peak_task_exec_mem_gb']} GiB.",
        "",
    ]
    scale_path = os.path.join(repo, "SCALE.md")
    text = open(scale_path).read()
    if marker in text:
        head, _, rest = text.partition(marker)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1:] if nxt >= 0 else ""
        text = head + "\n".join(lines) + "\n" + tail
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    open(scale_path, "w").write(text)
    print(f"# SCALE.md '{marker}' section updated", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

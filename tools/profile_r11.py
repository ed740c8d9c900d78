"""Round-11 per-query stage profiler.

Runs the listed queries on sf0.1 with the Spark event log enabled, tags
every job with the query name via setJobDescription, then parses the
event log to attribute per-stage executor time / shuffle bytes back to
queries. Output: /tmp/profile_r11.json with, per query:
  wall seconds per run (cold-ish first run, then N warm runs),
  per-job (description, ms), and per-stage (name, ms, tasks, shuffle
  read/write bytes) rows for the LAST warm run.

Usage: python tools/profile_r11.py q1,q2,... [warm_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EVENT_DIR = "/tmp/spark-events-r11"


def main() -> None:
    names = sys.argv[1].split(",")
    warm_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(EVENT_DIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_EVENTLOG", "1")

    # event log must be set before session build
    from pyspark.sql import SparkSession

    from bigdata_carprice_assignment_spark import registry
    from bigdata_carprice_assignment_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    SparkSession.builder.config("spark.eventLog.enabled", "true").config(
        "spark.eventLog.dir", EVENT_DIR
    )
    # get_spark builds its own config; inject eventLog via a pre-built
    # session with the same master so getOrCreate reuses it.
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_r11")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVENT_DIR)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    assert get_spark("profile_r11") is spark

    registry.load_all()
    app_id = spark.sparkContext.applicationId

    timings: dict[str, list[float]] = {}
    for name in names:
        fn = registry.QUERIES[name]
        runs = []
        for i in range(1 + warm_runs):
            spark.sparkContext.setJobDescription(f"{name}|run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        timings[name] = runs
        print(name, runs, flush=True)

    spark.stop()

    # ---- parse the event log (Spark 4 rolling layout:
    # eventlog_v2_<appid>/events_*) ----
    base = Path(EVENT_DIR)
    cand = base / app_id
    if not cand.exists():
        cand = base / f"eventlog_v2_{app_id}"
    def _read(f: Path) -> str:
        if f.name.endswith(".zstd"):
            import subprocess

            return subprocess.run(
                ["zstd", "-dc", str(f)], capture_output=True, check=True
            ).stdout.decode()
        return f.read_text()

    lines: list[str] = []
    if cand.is_dir():
        for f in sorted(cand.glob("events_*")):
            lines += _read(f).splitlines()
    else:
        lines = _read(cand).splitlines()
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    for line in lines:
        ev = json.loads(line)
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get("spark.job.description", "")
            jobs[jid] = {"desc": desc, "t0": ev["Submission Time"]}
            for sid in ev.get("Stage IDs", []):
                stage_to_job[sid] = jid
        elif et == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["ms"] = ev["Completion Time"] - jobs[jid]["t0"]
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            t0 = si.get("Submission Time")
            t1 = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", "")[:120],
                "ms": (t1 - t0) if t0 and t1 else None,
                "tasks": si.get("Number of Tasks"),
            }

    per_query: dict[str, dict] = {}
    for jid, j in sorted(jobs.items()):
        desc = j.get("desc") or ""
        qname = desc.split("|")[0] if "|" in desc else desc
        run = desc.split("|")[1] if "|" in desc else ""
        if not qname:
            continue
        q = per_query.setdefault(qname, {"jobs": []})
        q["jobs"].append(
            {
                "job": jid,
                "run": run,
                "ms": j.get("ms"),
                "stages": [
                    {**stages[sid], "sid": sid}
                    for sid in sorted(
                        s for s, jj in stage_to_job.items() if jj == jid
                    )
                    if sid in stages
                ],
            }
        )

    out = {"timings": timings, "per_query": per_query, "app_id": app_id}
    Path("/tmp/profile_r11.json").write_text(json.dumps(out, indent=1))
    print("wrote /tmp/profile_r11.json")


if __name__ == "__main__":
    main()

"""Per-query optimization measurement harness (guide §1: measure first).

Runs named registry queries with the bench's own protocol (count sink, one
first run + 3 steady, release_persisted between runs) under Spark event
logging, then summarizes per-JOB and per-STAGE wall/CPU/shuffle from the
event log — the stage-level evidence the disabled UI would otherwise show.

  python tools/opt_measure.py [--sf-dir /root/testdata/sf0.1] name...

Prints, per query: first/steady seconds, then for the LAST steady run the
job list (description, wall) and the stages sorted by executor run time
(name, tasks, runtime, shuffle read/write bytes, input bytes, spill).
Writes raw JSON records to /tmp/opt_measure.jsonl for the round notes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_metadata_lineage_pyspark_spark.functions.cache import (  # noqa: E402
    release_models,
    release_persisted,
)
from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events"


def get_spark_with_eventlog():
    os.makedirs(EVDIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_EVENTLOG", "1")
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("opt-measure")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def _event_lines(path: str):
    """Yield event-log lines from a Spark 3 single file or a Spark 4
    rolling eventlog_v2_<appid>/ directory."""
    import glob

    if os.path.isdir(path):
        for f in sorted(glob.glob(os.path.join(path, "events_*"))):
            with open(f) as fh:
                yield from fh
    else:
        with open(path) as fh:
            yield from fh


def parse_events(path: str):
    jobs, stages = [], []
    job_start = {}
    stage_to_job = {}
    if True:
        for line in _event_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_start[jid] = (
                    ev.get("Submission Time", 0),
                    ev.get("Properties", {}).get("spark.job.description", ""),
                )
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                st, desc = job_start.get(jid, (0, ""))
                jobs.append(
                    {
                        "job": jid,
                        "desc": desc,
                        "wall_ms": ev.get("Completion Time", 0) - st,
                    }
                )
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages.append(
                    {
                        "stage": si["Stage ID"],
                        "job": stage_to_job.get(si["Stage ID"]),
                        "name": si.get("Stage Name", "")[:90],
                        "tasks": si.get("Number of Tasks"),
                        "wall_ms": si.get("Completion Time", 0)
                        - si.get("Submission Time", 0),
                        "run_ms": acc.get("internal.metrics.executorRunTime", 0),
                        "cpu_ms": int(acc.get("internal.metrics.executorCpuTime", 0) or 0)
                        // 1_000_000,
                        "sh_read_b": acc.get(
                            "internal.metrics.shuffle.read.remoteBytesRead", 0
                        )
                        + acc.get("internal.metrics.shuffle.read.localBytesRead", 0),
                        "sh_write_b": acc.get(
                            "internal.metrics.shuffle.write.bytesWritten", 0
                        ),
                        "input_b": acc.get("internal.metrics.input.bytesRead", 0),
                        "spill_b": acc.get("internal.metrics.diskBytesSpilled", 0),
                        "py_ms": acc.get("internal.metrics.executorDeserializeTime", 0),
                    }
                )
    return jobs, stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    registry = all_queries()
    unknown = [n for n in args.names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark_with_eventlog()
    sc = spark.sparkContext
    app_id = sc.applicationId
    evpath = os.path.join(EVDIR, "eventlog_v2_" + app_id)
    if not os.path.exists(evpath):
        evpath = os.path.join(EVDIR, app_id + ".inprogress")

    out = open("/tmp/opt_measure.jsonl", "a")
    for name in args.names:
        fn = registry[name].fn
        release_persisted()
        release_models()
        sc.setJobDescription(f"{name}: first")
        t0 = time.time()
        n = fn(spark, args.sf_dir).count()
        first = round(time.time() - t0, 3)
        release_persisted()
        samples = []
        for i in range(args.runs):
            sc.setJobDescription(f"{name}: steady{i}")
            t0 = time.time()
            fn(spark, args.sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            release_persisted()
        sc.setJobDescription(None)
        steady = sorted(samples)[len(samples) // 2]
        print(f"\n=== {name}: {n} rows, first {first}s, steady {steady}s {samples}")
        # flush event log and parse the LAST steady run's jobs/stages
        time.sleep(0.5)
        jobs, stages = parse_events(evpath)
        tag = f"{name}: steady{args.runs - 1}"
        my_jobs = [j for j in jobs if j["desc"] == tag]
        jids = {j["job"] for j in my_jobs}
        my_stages = [s for s in stages if s["job"] in jids]
        print(f"  jobs: {len(my_jobs)}, total job wall {sum(j['wall_ms'] for j in my_jobs)}ms")
        for s in sorted(my_stages, key=lambda s: -s["run_ms"])[:12]:
            print(
                f"  stage {s['stage']:>4} job {s['job']:>3} tasks {s['tasks']:>3}"
                f" wall {s['wall_ms']:>6}ms run {s['run_ms']:>7}ms cpu {s['cpu_ms']:>7}ms"
                f" shR {s['sh_read_b']:>10} shW {s['sh_write_b']:>10}"
                f" in {s['input_b']:>10} spill {s['spill_b']}  | {s['name'][:60]}"
            )
        out.write(
            json.dumps(
                {
                    "query": name,
                    "rows": n,
                    "first": first,
                    "steady": steady,
                    "samples": samples,
                    "jobs": my_jobs,
                    "stages": my_stages,
                }
            )
            + "\n"
        )
        out.flush()


if __name__ == "__main__":
    main()

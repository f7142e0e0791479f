"""Per-job/per-stage attribution for one declared query (guide §1/§7).

Runs the query twice (cold, hot) with the Spark event log enabled, then
parses the log into a job/stage wall-time + shuffle-bytes table so the
expensive stage of a multi-scope suite can be named instead of guessed.

Usage: python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from lsdm_motogp_data_integration_spark.session import get_spark


def run(name: str, sf_dir: str) -> None:
    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.range(1000).count()  # warm the session
    fn = entry_mod.queries()[name]
    for tag in ("cold", "hot"):
        spark.sparkContext.setJobDescription(f"{tag}:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.time() - t0
        print(
            f"== {tag}: build {t_build:.3f}s total {t_total:.3f}s "
            f"(build = eager plan-time jobs: checkpoints/training/loads)"
        )
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
    spark.stop()

    # parse the event log
    logf = [os.path.join(evdir, f) for f in os.listdir(evdir)]
    logf = max(logf, key=os.path.getmtime)
    if os.path.isdir(logf):  # Spark 4 rolling event-log layout
        parts = sorted(
            os.path.join(logf, f)
            for f in os.listdir(logf)
            if f.startswith("events")
        )
    else:
        parts = [logf]
    lines: list[str] = []
    for p in parts:
        if p.endswith(".zstd"):
            import zstandard

            with open(p, "rb") as fb:
                data = zstandard.ZstdDecompressor().stream_reader(fb).read()
            lines.extend(data.decode("utf-8", "replace").splitlines())
        else:
            with open(p) as f:
                lines.extend(f)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "t0": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif t == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "wall": (
                        si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)
                    )
                    / 1000.0,
                    "tasks": si["Number of Tasks"],
                }
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                st["sh_read"] = (
                    st.get("sh_read", 0)
                    + srm.get("Local Bytes Read", 0)
                    + srm.get("Remote Bytes Read", 0)
                )
                swm = m.get("Shuffle Write Metrics") or {}
                st["sh_write"] = st.get("sh_write", 0) + swm.get(
                    "Shuffle Bytes Written", 0
                )

    hot_jobs = [
        j
        for j in jobs.values()
        if j.get("desc", "").startswith("hot:") and "t1" in j
    ]
    print(f"\n== hot jobs: {len(hot_jobs)}")
    total = 0.0
    for j in sorted(hot_jobs, key=lambda x: x["t0"]):
        wall = (j["t1"] - j["t0"]) / 1000.0
        total += wall
        sts = [
            (sid, stages.get(sid, {}))
            for sid in j["stages"]
            if stages.get(sid, {}).get("wall") is not None
        ]
        sts.sort(key=lambda x: -(x[1].get("wall") or 0))
        top = "; ".join(
            f"s{sid} {st.get('wall', 0):.2f}s "
            f"{st.get('tasks', 0)}t "
            f"run={st.get('task_ms', 0) / 1000.0:.1f}s "
            f"shR={st.get('sh_read', 0) // 1024}K "
            f"shW={st.get('sh_write', 0) // 1024}K "
            f"[{(st.get('name') or '')[:60]}]"
            for sid, st in sts[:3]
        )
        print(f"job wall={wall:6.3f}s  {top}")
    print(f"sum of hot job walls: {total:.3f}s")


if __name__ == "__main__":
    q = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    run(q, sf)

"""Per-stage profile of one registered query (guide §1.1/§7.1: empirical
loop — find THE slow stage before touching anything).

Runs the query once untimed (JIT/footer warm-up), then once timed, with the
Spark UI enabled, and dumps every job and stage of the timed run from the
UI REST API: wall time, executor-run/GC time, shuffle read/write bytes,
task count, spill. This is the stage-level attribution bench.py cannot see.

Usage: python tools/profile_query.py <query>[,<query>...] [sf_dir] [--cold]
  --cold: skip the warm-up execution (see first-touch costs too)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--cold"]
    cold = "--cold" in sys.argv
    names = args[0].split(",")
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import __spark_entry__ as entrymod
    from videos_to_tfrecords_spark.session import get_spark

    spark = get_spark("profile_query", extra_conf={"spark.ui.enabled": "true"})
    qs = entrymod.queries()

    # bench-equivalent warm-up so the timed run matches bench.py steady state
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = "http://localhost:4040/api/v1"
    app_id = json.loads(
        urllib.request.urlopen(f"{base}/applications").read()
    )[0]["id"]
    for name in names:
        profile_one(spark, qs[name], name, sf_dir, cold, base, app_id)


def profile_one(spark, fn, name, sf_dir, cold, base, app_id) -> None:
    if not cold:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def jobs_after(min_job: int) -> list[dict]:
        js = json.loads(
            urllib.request.urlopen(f"{base}/applications/{app_id}/jobs").read()
        )
        return [j for j in js if j["jobId"] >= min_job]

    prior = json.loads(
        urllib.request.urlopen(f"{base}/applications/{app_id}/jobs").read()
    )
    min_job = (max((j["jobId"] for j in prior), default=-1)) + 1

    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.time()
    df = fn(spark, sf_dir)
    t_build = time.time() - t0
    df.write.format("noop").mode("overwrite").save()
    t_total = time.time() - t0
    spark.sparkContext.setJobDescription(None)

    stages = {
        s["stageId"]: s
        for s in json.loads(
            urllib.request.urlopen(
                f"{base}/applications/{app_id}/stages?details=false"
            ).read()
        )
    }
    print(f"== {name} @ {sf_dir}: total {t_total:.2f}s (plan build {t_build:.2f}s)")
    rows = []
    for j in sorted(jobs_after(min_job), key=lambda j: j["jobId"]):
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        dur = ""
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            d = (
                datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            ).total_seconds()
            dur = f"{d:7.2f}s"
        except Exception:  # noqa: BLE001
            pass
        print(f"job {j['jobId']:4d} {dur}  {j.get('name','')[:90]}")
        for sid in sorted(j.get("stageIds", [])):
            s = stages.get(sid)
            if not s or s.get("status") == "SKIPPED":
                continue
            rows.append((s.get("executorRunTime", 0), sid, j["jobId"], s))
    print("\n-- stages by executorRunTime (ms) --")
    for run_ms, sid, jid, s in sorted(rows, reverse=True)[:25]:
        print(
            f"stage {sid:4d} (job {jid:3d}) run={run_ms:8d}ms "
            f"cpu={s.get('executorCpuTime', 0) // 1_000_000:8d}ms "
            f"gc={s.get('jvmGcTime', 0):6d}ms tasks={s.get('numCompleteTasks', 0):4d} "
            f"in={s.get('inputBytes', 0) >> 20:5d}MB "
            f"sr={s.get('shuffleReadBytes', 0) >> 20:5d}MB "
            f"sw={s.get('shuffleWriteBytes', 0) >> 20:5d}MB "
            f"spill={s.get('diskBytesSpilled', 0) >> 20:4d}MB  {s.get('name', '')[:60]}"
        )


if __name__ == "__main__":
    main()

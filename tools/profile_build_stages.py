"""Build with the Spark UI/REST API enabled and dump per-stage wall/CPU
metrics (guide §7.1 — the UI's stage view, scripted since the sandbox has
no browser). Prints one line per stage: submission order, duration, task
count, input/shuffle bytes, and the stage name (operator scope)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from pgspark_index import build, fixtures, merge  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 1.0
    n_docs = max(1000, int(sf * 200_000))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pgspark_build_stages")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    index_dir = tempfile.mkdtemp(prefix="pgspark_bs_idx_")
    try:
        parts = max(8, min(cpus * 4, n_docs // 1500))
        df = fixtures.make_webtext_df_dist(spark, n_docs, seed=42, partitions=parts)
        df.persist().count()
        t0 = time.time()
        build.build_index(
            spark, df, index_dir, num_units=2, partitions=parts,
            salt_target=50_000, sample_fraction=0.05,
        )
        build_sec = time.time() - t0
        t0 = time.time()
        merge.merge_index(spark, index_dir)
        merge_sec = time.time() - t0
        print(f"build={build_sec:.2f}s merge={merge_sec:.2f}s parts={parts}")

        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            stages = json.load(r)
        stages.sort(key=lambda s: s["stageId"])
        for s in stages:
            if s["status"] not in ("COMPLETE", "ACTIVE"):
                continue
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t1 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                t2 = datetime.strptime(s["completionTime"], fmt)
                dur = (t2 - t1).total_seconds()
            print(json.dumps({
                "stage": s["stageId"],
                "attempt": s["attemptId"],
                "wall_s": round(dur, 2) if dur is not None else None,
                "tasks": s["numCompleteTasks"],
                "exec_cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "exec_run_s": round(s.get("executorRunTime", 0) / 1e3, 2),
                "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 2),
                "deser_s": round(s.get("executorDeserializeTime", 0) / 1e3, 2),
                "sh_w_s": round(s.get("shuffleWriteTime", 0) / 1e9, 2),
                "sh_fetch_s": round(s.get("shuffleFetchWaitTime", 0) / 1e3, 2),
                "result_ser_s": round(s.get("resultSerializationTime", 0) / 1e3, 2),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "name": s["name"][:80],
            }))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

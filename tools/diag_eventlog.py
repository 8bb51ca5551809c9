"""One-off stage-level diagnosis for a single declared key (guide §1/§7).

Runs ONE noop materialization of $DIAG_KEY at $SPARK_GRAFT_SF_DIR with the
bench session conf plus eventLog enabled, then prints per-stage wall time,
task count, shuffle read/write bytes, spill, and the stage's callsite so
the dominant stage can be attributed to an operator. NOT a timing tool —
it exists to answer "where does the time go" with Spark's own metrics.

Usage: DIAG_KEY=private_join_count SPARK_GRAFT_SF_DIR=/root/repo/.sf100 \
       python tools/diag_eventlog.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    key = os.environ["DIAG_KEY"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = tempfile.mkdtemp(prefix="tas_evlog_")

    from pyspark.sql import SparkSession

    disk_bytes = 0
    for root, _d, files in os.walk(sf_dir):
        for f in files:
            disk_bytes += os.path.getsize(os.path.join(root, f))
    auto_mem = f"{min(64, max(16, (disk_bytes * 5) >> 30))}g"

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tas-diag")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", auto_mem))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    env_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if env_parts:
        spark.conf.set("spark.sql.shuffle.partitions", env_parts)
    else:
        from tumult_analytics_spark.utils import configure_shuffle_partitions

        configure_shuffle_partitions(spark, [sf_dir], floor=max(int(cpus), 8))

    import __spark_entry__ as entry

    df = entry.queries()[key](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    spark.stop()

    # Parse the event log: stage submit/complete + accumulated metrics.
    stages = {}
    for fn in os.listdir(evdir):
        for line in open(os.path.join(evdir, fn)):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0 = si.get("Submission Time", 0)
                t1 = si.get("Completion Time", 0)
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in si.get("Accumulables", [])
                }

                def num(name):
                    v = acc.get(name, 0)
                    try:
                        return int(v)
                    except Exception:
                        return 0

                stages[sid] = {
                    "wall_s": round((t1 - t0) / 1000.0, 2),
                    "tasks": si.get("Number of Tasks"),
                    "name": si.get("Stage Name", "")[:80],
                    "details": si.get("Details", "").split("\n")[0][:120],
                    "sh_read_mb": num(
                        "internal.metrics.shuffle.read.remoteBytesRead"
                    ) // (1 << 20)
                    + num(
                        "internal.metrics.shuffle.read.localBytesRead"
                    ) // (1 << 20),
                    "sh_write_mb": num(
                        "internal.metrics.shuffle.write.bytesWritten"
                    ) // (1 << 20),
                    "spill_disk_mb": num(
                        "internal.metrics.diskBytesSpilled"
                    ) // (1 << 20),
                    "spill_mem_mb": num(
                        "internal.metrics.memoryBytesSpilled"
                    ) // (1 << 20),
                    "cpu_s": num("internal.metrics.executorCpuTime")
                    // 10**9,
                    "run_s": num("internal.metrics.executorRunTime")
                    // 10**3,
                    "gc_s": num("internal.metrics.jvmGCTime") // 10**3,
                }
    for sid in sorted(stages, key=lambda s: -stages[s]["wall_s"]):
        s = stages[sid]
        print(
            f"stage {sid:3d} wall {s['wall_s']:8.2f}s tasks {s['tasks']:4d} "
            f"cpu {s['cpu_s']:5d}s run {s['run_s']:5d}s gc {s['gc_s']:4d}s "
            f"shR {s['sh_read_mb']:6d}M shW {s['sh_write_mb']:6d}M "
            f"spill {s['spill_disk_mb']:6d}M | {s['name']}"
        )
    print("eventlog:", evdir)


if __name__ == "__main__":
    main()

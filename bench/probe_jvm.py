#!/usr/bin/env python
"""Engine-free JVM ceiling probe matched to the crawl's widest stage.

The crawl's fetch+parse+documents-write stage (the scaling gate's worst
scaler) is, physically: a DISK_ONLY cache scan of KB-sized HTML bodies
(lz4 + Java deserialization), JVM regex extraction over those bodies,
and a parquet write of the extracted structures — all byte-streaming
JVM work with high allocation rates. The existing hardware ceiling
control (the Python page-parse co-run, 0.95-0.99) streams similar bytes
but in ISOLATED per-process Python heaps, so it cannot see JVM-specific
scaling limits (shared heap allocation, GC concurrency, UTF8String
churn, parquet buffer pressure). This probe measures the same stage mix
with zero engine code: whatever efficiency IT loses at N->4N threads on
this box is the box+JVM's own ceiling for this workload class, not the
engine's.

Usage: SPARK_GRAFT_CPUS=8 python bench/probe_jvm.py
Prints one JSON line: {"cpus": N, "rows": M, "secs": wall}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from crawlspark.session import get_spark

ROWS = int(os.environ.get("CRAWLSPARK_PROBE_ROWS", "400000"))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    extra = {}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/crawlspark_probe_shuffle"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    # same heap rule as bench/scaling.py's levels
    heap = os.environ.get("CRAWLSPARK_DRIVER_MEM", f"{round(6 + 1.125 * cpus)}g")
    spark = get_spark(
        cores=cpus, shuffle_partitions=cpus, app="jvm-ceiling-probe",
        driver_mem=heap, extra_conf=extra,
    )
    out_root = tempfile.mkdtemp(
        prefix="probe_jvm_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        # deterministic ~2.5KB "page": 40 href-bearing fragments derived
        # from the row id (no RNG; identical at every level)
        body = F.repeat(
            F.concat(
                F.lit('<a href="http://h'),
                F.md5(F.col("id").cast("string")),
                F.lit('.example/p">text</a> <p>filler filler filler</p> '),
            ),
            40,
        )
        df = (
            spark.range(ROWS)
            .withColumn("body", body)
            .persist(StorageLevel.DISK_ONLY)
        )
        df.count()  # build the cache outside the timed window

        t0 = time.time()
        # timed: cache scan -> regex extraction -> parquet write of the
        # extracted nested structure (the documents-write shape)
        (
            df.select(
                "id",
                F.regexp_extract_all(
                    F.col("body"), F.lit('href="([^"]+)"'), 1
                ).alias("links"),
                F.substring("body", 1, 512).alias("head"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_root, "docs"))
        )
        wall = time.time() - t0
        print(json.dumps({"cpus": cpus, "rows": ROWS, "secs": round(wall, 2)}))
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

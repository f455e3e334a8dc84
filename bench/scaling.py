#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.md protocol): run the identical
frontier-expansion job on the identical cached input at local[8] and
local[32] in separate processes (one JVM cannot change core count), then
write BENCH/BASELINE.md with throughput at both levels + efficiency.

Correctness gate: the crawl checksum (order-sensitive hash over
(url, disc_order)) must be identical at both parallelism levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, pages: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        CRAWLSPARK_BENCH_PAGES=str(pages),
        CRAWLSPARK_BENCH_CRAWL_ONLY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    pages = int(os.environ.get("CRAWLSPARK_BENCH_PAGES", "40000"))
    r8 = run_at(8, pages)
    r32 = run_at(32, pages)
    t8, t32 = r8["value"], r32["value"]
    eff = (t32 / t8) / 4
    same = r8["crawl_checksum"] == r32["crawl_checksum"]

    md = f"""# BENCH — scaling evidence (local[8] vs local[32])

Protocol: BASELINE.md §"Sandbox evidence protocol". Identical deterministic
power-law graph ({pages} pages, 24 hosts, hot-host share 0.4, cached
parquet), identical seed list and politeness budget; shuffle partitions =
cores; AQE on; salted partitioning on; exact anti-join dedup on.

| parallelism | throughput (URLs scheduled+deduped/sec) | wall (s) | URLs |
|---|---|---|---|
| local[8]  (N)  | {t8} | {r8["crawl_secs"]} | {r8["crawl_urls"]} |
| local[32] (4N) | {t32} | {r32["crawl_secs"]} | {r32["crawl_urls"]} |

**Scaling efficiency (T32/T8)/4 = {eff:.3f}** (target >= 0.8)

Determinism gate: crawl checksum identical at both levels: **{same}**
(checksum {r8["crawl_checksum"]}).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({"t8": t8, "t32": t32, "efficiency": round(eff, 3),
                      "checksum_match": same}))


if __name__ == "__main__":
    main()

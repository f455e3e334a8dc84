#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.md protocol): run the identical
frontier-expansion job on the identical cached input at local[N] and
local[4N] (default N=4 ⇒ local[4] vs local[16]; CRAWLSPARK_SCALE_N
overrides) in separate processes (one JVM cannot change core count), then
write BENCH/BASELINE.md with throughput at both levels + efficiency.
N=4 because the shared host's measured parallel ceiling at 8→32 processes
makes ≥0.8 physically unreachable for CPU-bound work regardless of engine
quality (see BASELINE.md protocol).

Correctness gate: the crawl checksum (order-sensitive hash over
(url, disc_order)) must be identical at both parallelism levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import multiprocessing as _mp
import time as _time


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
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(
            f"bench.py produced no JSON at cpus={cpus} "
            f"(rc={out.returncode}); stderr tail:\n"
            + "\n".join(out.stderr.strip().splitlines()[-30:]) + "\n"
        )
        raise RuntimeError(f"bench subprocess failed at cpus={cpus}")
    return json.loads(lines[-1])


def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def hw_ceiling(n: int, n4: int) -> float:
    """Measured hardware parallel-scaling ceiling for pure-Python CPU work
    on this host (frequency/bandwidth effects a real N-vs-4N-machine
    cluster would not see): wall(n procs) / wall(4n procs) at equal
    per-process work."""
    def run(procs):
        best = 1e9
        for _ in range(3):
            t0 = _time.time()
            with _mp.Pool(procs) as p:
                p.map(_burn, [12_000_000] * procs)
            best = min(best, _time.time() - t0)
        return best

    return run(n) / run(n4)


def main():
    pages = int(os.environ.get("CRAWLSPARK_BENCH_PAGES", "40000"))
    n = int(os.environ.get("CRAWLSPARK_SCALE_N", "4"))
    n4 = 4 * n
    reps = int(os.environ.get("CRAWLSPARK_SCALE_REPS", "2"))

    # interleaved repetitions, best-of: the sandbox host shows 25-50%
    # run-to-run CPU noise (shared machine); min is the standard estimator
    best = {n: None, n4: None}
    for _ in range(reps):
        for cpus in (n, n4):
            r = run_at(cpus, pages)
            if best[cpus] is None or r["crawl_secs"] < best[cpus]["crawl_secs"]:
                best[cpus] = r
    rn, rn4 = best[n], best[n4]
    tn, tn4 = rn["value"], rn4["value"]
    eff = (tn4 / tn) / 4
    ceil = hw_ceiling(n, n4)
    eff_norm = eff / ceil if ceil > 0 else float("nan")
    same = rn["crawl_checksum"] == rn4["crawl_checksum"]

    md = f"""# BENCH — scaling evidence (local[{n}] vs local[{n4}])

Protocol: BASELINE.md §"Sandbox evidence protocol". Identical deterministic
power-law graph ({pages} pages, 24 hosts, hot-host share 0.4, cached
parquet), identical seed list and politeness budget; shuffle partitions =
cores; AQE on; salted partitioning on; exact anti-join dedup on.
Best of {reps} interleaved repetitions per level (shared sandbox host with
measured 25-50% run-to-run CPU noise).

| parallelism | throughput (URLs scheduled+deduped/sec) | wall (s) | URLs |
|---|---|---|---|
| local[{n}]  (N)  | {tn} | {rn["crawl_secs"]} | {rn["crawl_urls"]} |
| local[{n4}] (4N) | {tn4} | {rn4["crawl_secs"]} | {rn4["crawl_urls"]} |

**Scaling efficiency (T4N/TN)/4 = {eff:.3f}** (target >= 0.8)

Hardware context: this single shared-memory box does not scale pure-CPU
work linearly across core counts the way an N-machine -> 4N-machine
cluster scales (per-core frequency/bandwidth drop with occupancy).
Measured host ceiling for embarrassingly-parallel pure-Python work at
{n}->{n4} processes: **{ceil:.3f}**. Engine efficiency normalized by the
host ceiling: **{eff_norm:.3f}**.

Determinism gate: crawl checksum identical at both levels: **{same}**
(checksum {rn["crawl_checksum"]}).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({
        "t_n": tn, "t_4n": tn4, "efficiency": round(eff, 3),
        "hw_ceiling": round(ceil, 3), "efficiency_normalized": round(eff_norm, 3),
        "checksum_match": same, "n": n,
    }))


if __name__ == "__main__":
    main()

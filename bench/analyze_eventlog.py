#!/usr/bin/env python
"""Decompose a crawl bench run from its Spark event log: total wall =
sum(stage spans) + gaps (driver-serial time between stages). Prints the
largest stages (with task-time parallelism) and the largest gaps — the
two levers of N->4N scaling efficiency (stage time should shrink 4x,
gaps do not shrink at all).

Usage: python bench/analyze_eventlog.py /tmp/sparklogs/<app-id>
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    stages = {}  # id -> dict
    # task times accumulate separately: TaskEnd events precede their
    # stage's StageCompleted event in the log
    task_time = {}  # sid -> sec
    gc_time = {}  # sid -> sec
    desc = {}  # stage id -> job description (engine labels its sinks)
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                d = (ev.get("Properties") or {}).get("spark.job.description")
                if d:
                    for s in ev.get("Stage Infos", []):
                        desc[s["Stage ID"]] = d
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = (si["Stage ID"], si["Stage Attempt ID"])
                label = desc.get(
                    si["Stage ID"], si["Stage Name"].split("\n")[0]
                )
                stages[sid] = {
                    "name": label[:70],
                    "start": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                    "tasks": si.get("Number of Tasks"),
                    "task_time": task_time.get(sid, 0.0),
                    "gc_time": gc_time.get(sid, 0.0),
                }
            elif e == "SparkListenerTaskEnd":
                sid = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                if ti:
                    task_time[sid] = task_time.get(sid, 0.0) + (
                        ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    ) / 1000.0
                gc_time[sid] = (
                    gc_time.get(sid, 0.0) + tm.get("JVM GC Time", 0) / 1000.0
                )

    spans = sorted(
        (s for s in stages.values() if s["start"] and s["end"]),
        key=lambda s: s["start"],
    )
    if not spans:
        print("no stages found")
        return
    # merge overlapping stage spans; gaps = time covered by NO stage
    merged = []
    for s in spans:
        if merged and s["start"] <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], s["end"])
        else:
            merged.append([s["start"], s["end"]])
    covered = sum(e - s for s, e in merged) / 1000.0
    t0 = app_start or spans[0]["start"]
    t1 = app_end or max(s["end"] for s in spans)
    wall = (t1 - t0) / 1000.0
    pre = (spans[0]["start"] - t0) / 1000.0
    gaps = wall - covered - pre

    print(f"wall={wall:.1f}s  stage-covered={covered:.1f}s  "
          f"startup(pre-first-stage)={pre:.1f}s  inter-stage gaps={gaps:.1f}s")
    print("\nlargest stages (span sec, task-parallelism = task_time/span):")
    for s in sorted(spans, key=lambda s: s["end"] - s["start"],
                    reverse=True)[:12]:
        span = (s["end"] - s["start"]) / 1000.0
        par = s["task_time"] / span if span > 0 else 0
        print(f"  {span:8.1f}s  par={par:5.1f}  gc={s['gc_time']:6.1f}s  "
              f"tasks={s['tasks']:4d}  {s['name']}")
    print("\nlargest gaps (driver-serial; between consecutive covered spans):")
    gl = []
    prev_end = spans[0]["start"]
    for s, e in merged:
        if s - prev_end > 0:
            gl.append((prev_end, s))
        prev_end = max(prev_end, e)
    for s, e in sorted(gl, key=lambda g: g[1] - g[0], reverse=True)[:12]:
        print(f"  {(e - s) / 1000.0:8.1f}s  at +{(s - t0) / 1000.0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1])

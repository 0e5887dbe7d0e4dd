#!/usr/bin/env python
"""Summarize a Spark event log (JSON lines) into per-job-description
job/stage wall-times and shuffle byte counts.

Usage:
    python tools/parse_eventlog.py /tmp/spark-events/<app-id> [--min-ms 50]

Output: one line per job (grouped by spark.job.description), with its
stages: duration, task count, shuffle read/write MB, input MB. This is
the local-mode stand-in for the Spark UI stage table (guide §7.1) —
the UI is disabled in the engine session, and the bench runs dozens of
queries per process, so a parseable offline summary beats screenshots.
"""
from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--min-ms", type=int, default=50,
                    help="hide stages shorter than this")
    ap.add_argument("--desc-filter", default=None,
                    help="only jobs whose description contains this")
    args = ap.parse_args()

    jobs = {}          # job_id -> {desc, submit, complete, stage_ids}
    stages = {}        # stage_id -> info
    stage_tasks = defaultdict(lambda: dict(
        n=0, shuffle_read=0, shuffle_write=0, input=0, spill=0,
        task_time=0, max_task=0, fetch_wait=0, gc=0))

    with open(args.path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "submit": ev.get("Submission Time", 0),
                    "complete": None,
                    "stage_ids": [s["Stage ID"] for s in
                                  ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["complete"] = ev.get("Completion Time")
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "n_tasks": si.get("Number of Tasks", 0),
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                agg = stage_tasks[sid]
                agg["n"] += 1
                rt = tm.get("Executor Run Time", 0)
                agg["task_time"] += rt
                agg["max_task"] = max(agg["max_task"], rt)
                agg["gc"] += tm.get("JVM GC Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                agg["shuffle_read"] += (sr.get("Remote Bytes Read", 0)
                                        + sr.get("Local Bytes Read", 0))
                agg["fetch_wait"] += sr.get("Fetch Wait Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                agg["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)
                im = tm.get("Input Metrics") or {}
                agg["input"] += im.get("Bytes Read", 0)
                agg["spill"] += tm.get("Disk Bytes Spilled", 0)

    def mb(x: int) -> str:
        return f"{x / 1048576:.1f}M" if x else "-"

    by_desc = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        by_desc[j["desc"]].append((jid, j))

    for desc, js in by_desc.items():
        if args.desc_filter and args.desc_filter not in desc:
            continue
        total = sum((j["complete"] or j["submit"]) - j["submit"]
                    for _, j in js)
        print(f"\n=== {desc or '(no description)'}  "
              f"jobs={len(js)} wall={total/1000:.2f}s ===")
        for jid, j in js:
            dur = ((j["complete"] or j["submit"]) - j["submit"]) / 1000
            if dur * 1000 < args.min_ms:
                continue
            print(f"  job {jid}  {dur:6.2f}s")
            for sid in sorted(j["stage_ids"]):
                st = stages.get(sid)
                agg = stage_tasks.get(sid)
                if not st or not agg:
                    continue
                sdur = ((st["complete"] or 0) - (st["submit"] or 0)) / 1000
                if sdur * 1000 < args.min_ms:
                    continue
                nm = st["name"].split("\n")[0][:60]
                print(
                    f"    stage {sid:5d} {sdur:6.2f}s tasks={agg['n']:4d} "
                    f"cpu={agg['task_time']/1000:7.2f}s "
                    f"max={agg['max_task']/1000:5.2f}s "
                    f"gc={agg['gc']/1000:4.1f}s "
                    f"in={mb(agg['input']):>8} "
                    f"sr={mb(agg['shuffle_read']):>8} "
                    f"sw={mb(agg['shuffle_write']):>8} "
                    f"fw={agg['fetch_wait']/1000:4.1f}s "
                    f"spill={mb(agg['spill']):>6}  {nm}"
                )


if __name__ == "__main__":
    main()

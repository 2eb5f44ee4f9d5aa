#!/usr/bin/env python3
"""Summarize a Spark event log into a per-stage timeline (dev/driver-side
tooling): stage name, wall duration, task count, max task duration,
input/shuffle volumes, spill. Reads the JSON-lines event log Spark
writes under spark.eventLog.dir — the stage-timeline evidence the
verdict asks for before touching a slow query (fixture physics vs a
structural width bug read very differently here: physics = wide stages
with balanced tasks, a width bug = one stage with few tasks, long max
task, or runaway spill).

Usage: stage_profile.py <event-log-file> [top_n=15]
"""
import json
import sys

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15

stages = {}
for line in open(path, errors="replace"):
    try:
        ev = json.loads(line)
    except json.JSONDecodeError:
        continue
    if not isinstance(ev, dict):  # rolling-log version marker line
        continue
    t = ev.get("Event")
    if t == "SparkListenerStageCompleted":
        si = ev["Stage Info"]
        sid = (si["Stage ID"], si["Stage Attempt ID"])
        sub, comp = si.get("Submission Time"), si.get("Completion Time")
        acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
        stages[sid] = {
            "name": si.get("Stage Name", "")[:90],
            "tasks": si.get("Number of Tasks", 0),
            "wall_s": (comp - sub) / 1e3 if sub and comp else -1,
            "input_mb": (acc.get("internal.metrics.input.bytesRead") or 0) / 2**20,
            "sh_read_mb": (acc.get("internal.metrics.shuffle.read.remoteBytesRead") or 0) / 2**20
            + (acc.get("internal.metrics.shuffle.read.localBytesRead") or 0) / 2**20,
            "sh_write_mb": (acc.get("internal.metrics.shuffle.write.bytesWritten") or 0) / 2**20,
            "spill_mb": (acc.get("internal.metrics.memoryBytesSpilled") or 0) / 2**20,
            "records": acc.get("internal.metrics.shuffle.write.recordsWritten") or 0,
            "max_task_s": 0.0,
        }
    elif t == "SparkListenerTaskEnd":
        si = ev.get("Stage ID"), ev.get("Stage Attempt ID")
        ti = ev.get("Task Info", {})
        dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
        if si in stages:
            stages[si]["max_task_s"] = max(stages[si]["max_task_s"], dur)
        else:
            stages.setdefault(si, {"name": "?", "tasks": -1, "wall_s": -1,
                "input_mb": 0, "sh_read_mb": 0, "sh_write_mb": 0,
                "spill_mb": 0, "records": 0, "max_task_s": dur})

rows = sorted(stages.items(), key=lambda kv: -kv[1]["wall_s"])[:top_n]
print(f"{'stage':>8} {'wall_s':>8} {'tasks':>6} {'maxtask':>8} "
      f"{'in_MB':>9} {'shR_MB':>9} {'shW_MB':>9} {'spill':>8} {'recsW':>12}  name")
for (sid, att), s in rows:
    print(f"{sid:>6}.{att} {s['wall_s']:>8.1f} {s['tasks']:>6} "
          f"{s['max_task_s']:>8.1f} {s['input_mb']:>9.1f} {s['sh_read_mb']:>9.1f} "
          f"{s['sh_write_mb']:>9.1f} {s['spill_mb']:>8.1f} {s['records']:>12}  {s['name']}")
total = sum(s["wall_s"] for s in stages.values() if s["wall_s"] > 0)
print(f"\nstages: {len(stages)}, summed stage wall: {total:.1f}s "
      f"(overlapping stages double-count)")

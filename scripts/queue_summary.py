"""Summarize a tpu_queue_r2.sh log: one line per job with its rc, wall
time, and any bench JSON metrics found in its output.

    python scripts/queue_summary.py [/tmp/tpu_queue_r2.log]
"""
from __future__ import annotations

import json
import re
import sys


def main(path: str = "/tmp/tpu_queue_r2.log"):
    try:
        text = open(path).read()
    except FileNotFoundError:
        print(f"no log at {path}")
        return []
    jobs = []
    # blocks delimited by '=== [tag] HH:MM:SS :: cmd' ... '=== [tag] rc=N HH:MM:SS'
    starts = re.finditer(
        r"^=== \[(?P<tag>[\w-]+)\] (?P<t0>\d\d:\d\d:\d\d) :: (?P<cmd>.*)$",
        text, re.M,
    )
    for m in starts:
        tag = m.group("tag")
        end = re.search(
            rf"^=== \[{re.escape(tag)}\] rc=(?P<rc>\d+) (?P<t1>\d\d:\d\d:\d\d)$",
            text[m.end():], re.M,
        )
        block = text[m.end(): m.end() + end.start()] if end else text[m.end():]
        metrics = []
        for line in block.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    metrics.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        jobs.append({
            "tag": tag,
            "rc": int(end.group("rc")) if end else None,
            "t0": m.group("t0"),
            "t1": end.group("t1") if end else None,
            "metrics": metrics,
        })
    for j in jobs:
        mtxt = "; ".join(
            f"{mm['metric']}={mm['value']:.0f}{mm.get('unit','')}"
            + (f" (x{mm['vs_baseline']:.2f})" if "vs_baseline" in mm else "")
            for mm in j["metrics"]
            for mm in ([mm] + mm.get("extra_metrics", []))
        ) or "-"
        rc = j["rc"] if j["rc"] is not None else "RUNNING"
        print(f"{j['tag']:22s} rc={rc!s:8s} {j['t0']}->{j['t1'] or '...'}  {mtxt}")
    return jobs


if __name__ == "__main__":
    main(*sys.argv[1:])

"""Stall-supervised runner for long TPU jobs through the remote relay.

The axon relay occasionally wedges a process mid-stream (futex wait, zero
CPU) while the TPU itself stays healthy for new processes (PERF.md). This
wrapper runs a command, watches its stdout for progress, kills it BY PID on
stall, and restarts it — the training CLIs resume from their checkpoints
(--is_continue / artifact-level resume), so a restart costs one compile.

Usage:
  python scripts/tpu_supervise.py --stall-sec 600 --max-restarts 5 -- \
      python scripts/tpu_quality_run.py

Never kills by pattern; only the child PID (and its process group).
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def run_once(cmd: list[str], stall_sec: float, log):
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True,
    )
    last_output = time.time()
    os.set_blocking(proc.stdout.fileno(), False)
    buf = b""
    while True:
        rc = proc.poll()
        chunk = proc.stdout.read()
        if chunk:
            last_output = time.time()
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                log(line.decode(errors="replace"))
        if rc is not None:
            # drain to EOF: data written between the read above and process
            # exit would otherwise be lost (ADVICE r1). Stay non-blocking
            # with a deadline — a surviving grandchild holding the pipe's
            # write end would make a blocking read() hang forever.
            deadline = time.time() + 10.0
            while time.time() < deadline:
                chunk = proc.stdout.read()
                if chunk is None:  # nothing available yet
                    time.sleep(0.1)
                    continue
                if not chunk:  # EOF
                    break
                buf += chunk
            rest = buf.decode(errors="replace").strip()
            if rest:
                for line in rest.split("\n"):
                    log(line)
            return rc, False
        if time.time() - last_output > stall_sec:
            log(f"[supervise] no output for {stall_sec:.0f}s -> killing "
                f"pgid {proc.pid}")
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            return None, True
        time.sleep(1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall-sec", type=float, default=600.0,
                    help="kill the child if it prints nothing for this long")
    ap.add_argument("--max-restarts", type=int, default=5)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")

    def log(line):
        print(line, flush=True)

    for attempt in range(args.max_restarts + 1):
        t0 = time.time()
        rc, stalled = run_once(cmd, args.stall_sec, log)
        if not stalled:
            log(f"[supervise] child exited rc={rc} after "
                f"{time.time()-t0:.0f}s")
            sys.exit(rc)
        if attempt < args.max_restarts:
            log(f"[supervise] restart {attempt + 1}/{args.max_restarts}")
    log("[supervise] giving up: too many stalls")
    sys.exit(75)


if __name__ == "__main__":
    main()

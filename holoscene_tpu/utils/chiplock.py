"""Single-TPU-chip serialization lock.

The box has ONE TPU chip behind a host relay; two concurrent chip jobs
corrupt each other's timings (PERF.md measurement pitfall #1 — BENCH_r03
was captured mid-probe). Every chip-touching entry point (bench.py, the
tpu_queue_* runners, the probe scripts) takes this lock before first
device use, so a driver-fired bench either waits for the running probe or
fails loudly instead of recording garbage.

Implementation: `fcntl.flock` on ``/tmp/holoscene_chip.lock`` — advisory,
crash-safe (the kernel drops the lock when the holder dies, so a killed
probe never wedges the queue). Shell queues can use the same file via
``flock(1)``; Python entry points use :func:`chip_lock`.

No reference counterpart: the reference assumes an exclusively owned CUDA
GPU (README.md run commands are sequential); the shared-relay failure mode
is specific to this environment.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import time

LOCK_PATH = os.environ.get("HOLOSCENE_CHIP_LOCK", "/tmp/holoscene_chip.lock")


class ChipBusyError(RuntimeError):
    """The chip lock is held by another job and waiting was not allowed."""


def _holder_info() -> str:
    try:
        with open(LOCK_PATH) as f:
            return f.read().strip() or "<unknown>"
    except OSError:
        return "<unknown>"


@contextlib.contextmanager
def chip_lock(tag: str, wait: bool = True, timeout_s: float = 7200.0,
              poll_s: float = 2.0):
    """Hold the exclusive chip lock for the duration of the context.

    wait=True blocks (polling) up to ``timeout_s`` then raises
    ChipBusyError naming the holder; wait=False raises immediately if the
    lock is held. A no-op when JAX is pinned to CPU (JAX_PLATFORMS=cpu) —
    CPU test runs must not serialize against chip jobs.
    """
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "tpu" not in platforms and "axon" not in platforms:
        yield
        return
    # reentrancy: queue runners hold the lock around a whole job via
    # flock(1) and export this var so the child (e.g. bench.py, which
    # locks itself) doesn't deadlock against its own parent
    if os.environ.get("HOLOSCENE_CHIP_LOCK_HELD") == "1":
        yield
        return

    fd = os.open(LOCK_PATH, os.O_RDWR | os.O_CREAT, 0o666)
    t0 = time.monotonic()
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                holder = _holder_info()
                if not wait:
                    os.close(fd)
                    raise ChipBusyError(
                        f"TPU chip busy (held by {holder}); "
                        f"refusing to overlap — see PERF.md pitfall #1")
                if time.monotonic() - t0 > timeout_s:
                    os.close(fd)
                    raise ChipBusyError(
                        f"TPU chip lock not released within {timeout_s:.0f}s "
                        f"(held by {holder})")
                time.sleep(poll_s)
        os.ftruncate(fd, 0)
        os.write(fd, json.dumps(
            {"tag": tag, "pid": os.getpid(), "t": time.time()}).encode())
        os.fsync(fd)
        try:
            yield
        finally:
            os.ftruncate(fd, 0)
            fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)

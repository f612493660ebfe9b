"""Experiment logging + profiling.

Reference semantics: wandb-by-default / tensorboard-fallback per-iteration
scalar logging (training/holoscene_train.py:252-264, :395-425: losses, PSNR,
beta, alpha=1/beta, grad norm, LRs) and console status lines (:381-393).

This implementation always writes a JSONL metrics stream (machine-readable,
dependency-free), attaches wandb/tensorboard when the packages are present,
and exposes a jax.profiler trace context (SURVEY.md §5.1: the rebuild
provides jax.profiler capture where the reference had ad-hoc CUDA timers).
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, project: str = "holoscene_tpu",
                 run_name: str | None = None, use_wandb: bool = False,
                 use_tensorboard: bool = False, config: dict | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self._t0 = time.time()

        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=project, name=run_name, config=config or {})
            except Exception:
                self.wandb = None

        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, metrics: dict, step: int) -> None:
        rec = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self.wandb is not None:
            self.wandb.finish()
        if self.tb is not None:
            self.tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace capture around a code block; view with
    tensorboard/xprof. Replaces the reference's CudaTimer
    (threedgrut/utils/timer.py)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock throughput counters (rays/sec, splats/sec — the
    counters BASELINE.md says the reference never measured)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._events: list[tuple[float, float]] = []

    def tick(self, units: float) -> None:
        self._events.append((time.time(), units))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        units = sum(u for _, u in self._events[1:])
        return units / max(dt, 1e-9)

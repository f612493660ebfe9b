"""Checkpoint save/load with the reference's artifact layout.

Reference semantics: training/holoscene_train.py:226-246 — per-epoch dumps
into checkpoints/{Model,Optimizer,Scheduler}Parameters/{epoch,latest}.pth
plus `--is_continue --timestamp latest` resume (:59-73, :173-205).

We serialize param/opt pytrees with flax.serialization (msgpack) into the
same directory structure with a `.msgpack` suffix, and keep a sidecar JSON
with the step/epoch so resumes don't need to deserialize to inspect.
"""

from __future__ import annotations

import json
import os
from typing import Any

import flax.serialization
import jax
import numpy as np

MODEL_DIR = "ModelParameters"
OPT_DIR = "OptimizerParameters"
SCHED_DIR = "SchedulerParameters"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    checkpoints_path: str,
    epoch: int,
    params: Any,
    opt_state: Any = None,
    extra: dict | None = None,
) -> None:
    for sub in (MODEL_DIR, OPT_DIR, SCHED_DIR):
        os.makedirs(os.path.join(checkpoints_path, sub), exist_ok=True)

    blobs = {
        MODEL_DIR: flax.serialization.to_bytes(_to_host(params)),
    }
    if opt_state is not None:
        blobs[OPT_DIR] = flax.serialization.to_bytes(_to_host(opt_state))
    meta = {"epoch": int(epoch), **(extra or {})}
    for sub, blob in blobs.items():
        for name in (str(epoch), "latest"):
            with open(os.path.join(checkpoints_path, sub, name + ".msgpack"), "wb") as f:
                f.write(blob)
    for name in (str(epoch), "latest"):
        with open(os.path.join(checkpoints_path, SCHED_DIR, name + ".json"), "w") as f:
            json.dump(meta, f)


def load_checkpoint(
    checkpoints_path: str,
    params_template: Any,
    opt_state_template: Any = None,
    checkpoint: str = "latest",
):
    """Returns (params, opt_state_or_None, meta)."""
    with open(os.path.join(checkpoints_path, MODEL_DIR, checkpoint + ".msgpack"), "rb") as f:
        params = flax.serialization.from_bytes(params_template, f.read())
    opt_state = None
    opt_path = os.path.join(checkpoints_path, OPT_DIR, checkpoint + ".msgpack")
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = flax.serialization.from_bytes(opt_state_template, f.read())
    meta = {}
    meta_path = os.path.join(checkpoints_path, SCHED_DIR, checkpoint + ".json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, opt_state, meta


def latest_timestamp(expdir: str) -> str | None:
    """Resolve `--timestamp latest` (reference exp_runner.py:59-73)."""
    if not os.path.isdir(expdir):
        return None
    stamps = sorted(
        d for d in os.listdir(expdir) if os.path.isdir(os.path.join(expdir, d))
    )
    return stamps[-1] if stamps else None

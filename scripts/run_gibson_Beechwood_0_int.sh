#!/bin/bash
# Full gibson/Beechwood_0_int pipeline driver — the analog of the reference's
# scripts/*/: stage-0 priors -> Stage 1 (SDF) ->
# Stage 2 (generative refinement + physics) -> Stage 3 (textures) ->
# Stage 4 (gaussian-on-mesh) -> GLB / USD / gaussian-USDZ exports.
#
# Prereqs: data_dir/gibson/Beechwood_0_int in the reference on-disk format
# (images/; depth + normal priors are generated below if absent). Optional
# provider checkpoints attach via HOLOSCENE_{LAMA,NORMAL,SR}_CKPT and
# HOLOSCENE_VIEW_CACHE (see holoscene_tpu/stage2/providers.py).
set -e
cd "$(dirname "$0")/.."

scene=confs/gibson_Beechwood_0_int
data_dir="data_dir/gibson/Beechwood_0_int"

# Stage 0: monocular depth/normal priors (marigold/run.py analog; uses
# TorchScript-exported estimators or recorded-prior replay)
python -m holoscene_tpu.stage0.priors --scene_dir "${data_dir}" \
    ${HOLOSCENE_DEPTH_CKPT:+--depth_checkpoint "$HOLOSCENE_DEPTH_CKPT"} \
    ${HOLOSCENE_NORMAL_CKPT:+--normal_checkpoint "$HOLOSCENE_NORMAL_CKPT"}

python -m holoscene_tpu.training.exp_runner --conf ${scene}.conf

python -m holoscene_tpu.training.exp_runner_post --conf ${scene}_post.conf \
    --timestamp latest

python -m holoscene_tpu.training.exp_runner_texture --conf ${scene}_tex.conf \
    --timestamp latest

python -m holoscene_tpu.training.exp_runner_gaussian --conf ${scene}_tex.conf \
    --timestamp latest

python -m holoscene_tpu.export.cli glb --conf ${scene}_tex.conf --timestamp latest
python -m holoscene_tpu.export.cli usd --conf ${scene}_tex.conf --timestamp latest
python -m holoscene_tpu.export.cli gs  --conf ${scene}_tex.conf --timestamp latest

"""Repair a corrupt stage-2 object candidate from its saved generated-view
packs: re-run the (now trust-region-clamped) coarse_recon on the
vis_info_{i}.pkl views and overwrite surface_{i}.obj / coarse_recon_obj_
{i}.ply. CPU-only — no chip needed.

Used after the r5 chain's obj-2 candidate exploded to ±5000 scene units
(unclamped recon SGD on near-empty masks); the root cause is fixed in
stage2/remesh.py + the ladder sanity gate, this re-derives the artifact so
the chain's stage 4 can rerun without redoing the 70-minute stage 2.
"""
import glob
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from holoscene_tpu.stage2.remesh import CoarseReconConfig, coarse_recon
from holoscene_tpu.utils.mesh import write_obj, write_ply

work = os.environ.get("FLAGSHIP_WORK", "/tmp/tpu_chain_r5")
obj_i = int(os.environ.get("REPAIR_OBJ", "2"))
plots = sorted(glob.glob(os.path.join(
    work, "exps", "*", "*", "plots")))[-1]
packs = pickle.load(open(os.path.join(plots, f"vis_info_{obj_i}.pkl"), "rb"))
print(f"{len(packs)} view packs for obj {obj_i}")

# object center: the point minimizing distance to all camera view axes
A = np.zeros((3, 3))
b = np.zeros(3)
for p in packs:
    pose = np.asarray(p["pose"], np.float64)
    eye, fwd = pose[:3, 3], pose[:3, 2]
    fwd = fwd / np.linalg.norm(fwd)
    P = np.eye(3) - np.outer(fwd, fwd)
    A += P
    b += P @ eye
center = np.linalg.solve(A, b)
half_extent = float(np.median([p["half_extent"] for p in packs]))
radius = half_extent / 1.3
print(f"center {center.round(3)}, radius {radius:.3f}")

mesh = coarse_recon(packs, center, radius,
                    CoarseReconConfig(iters=160, img_res=64))
v = np.asarray(mesh.vertices)
print(f"recon: {len(mesh.faces)} faces, bounds {v.min(0).round(2)} "
      f"{v.max(0).round(2)}")
assert np.abs(v).max() < 3.0, "repair still insane; aborting"

write_ply(os.path.join(plots, f"coarse_recon_obj_{obj_i}.ply"), mesh)
obj_path = os.path.join(plots, f"surface_{obj_i}.obj")
write_obj(obj_path, mesh)
for ext in (".png", ".mtl"):
    stale = obj_path.replace(".obj", ext)
    if os.path.exists(stale):
        os.remove(stale)  # texture baked on the corrupt geometry
print(f"repaired {obj_path}")

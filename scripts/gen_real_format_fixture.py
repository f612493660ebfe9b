"""Generate the miniature real-data-format fixture (tests/fixtures/real_format).

An independent numpy ray caster (deliberately NOT datasets/synthetic.py —
the fixture must prove the loaders on inputs the pipeline's own generator
never produced) renders a floor + two colored spheres and writes:

  * colmap/ — COLMAP binary reconstruction (sparse/0/{cameras,images,
    points3D}.bin) with an OPENCV-distortion camera whose images are
    rendered BY ray-casting THROUGH that distortion (k1/k2/p1/p2 applied in
    the forward projection), plus surface-sampled colored points3D. This
    makes the fixture self-consistent: project a 3D point with the loader's
    camera model and the image pixel under it has that point's color — a
    mis-read distortion coefficient breaks the test, not just a metric.
    (reference workload: threedgrut/datasets/dataset_colmap.py on
    ScanNet++/MipNeRF-360 captures)
  * ns_scene/ — the NSDataset Replica/ScanNet layout (images/, depth/*.npy,
    normal/*.png, instance_mask/*.png, transforms.json OpenGL poses,
    graph.json) at 96x72 (reference datasets/ns_dataset.py:19-479).

Deterministic; rerun to regenerate. Keep it tiny (few downsampled frames)
— it is checked into git.
"""
import json
import os
import struct
import sys

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "fixtures", "real_format")

# analytic scene: floor at y=+0.5 (y points down in CV camera convention),
# two spheres resting on it
SPHERES = [
    {"c": np.array([-0.32, 0.30, 0.05]), "r": 0.20,
     "albedo": np.array([0.85, 0.25, 0.2])},
    {"c": np.array([0.38, 0.35, -0.1]), "r": 0.15,
     "albedo": np.array([0.2, 0.45, 0.9])},
]
FLOOR_Y = 0.5
LIGHT = np.array([0.3, -0.8, 0.52])
LIGHT_DIR = LIGHT / np.linalg.norm(LIGHT)


def checker(x, z):
    return ((np.floor(x * 4) + np.floor(z * 4)) % 2).astype(np.float32)


def trace(origins, dirs):
    """Ray cast: returns rgb, depth (z along ray), normal, instance id
    (0 bg/floor, 1..K spheres, 255 sky->bg)."""
    n = dirs.shape[0]
    t_best = np.full(n, np.inf)
    rgb = np.zeros((n, 3), np.float32)
    normal = np.zeros((n, 3), np.float32)
    inst = np.full(n, 255, np.uint8)

    dy = dirs[:, 1]
    t_f = np.where(np.abs(dy) > 1e-9, (FLOOR_Y - origins[:, 1]) / dy, np.inf)
    hit_f = (t_f > 1e-4) & (t_f < t_best)
    p = origins + dirs * t_f[:, None]
    in_room = (np.abs(p[:, 0]) < 1.2) & (np.abs(p[:, 2]) < 1.2)
    hit_f &= in_room
    t_best = np.where(hit_f, t_f, t_best)
    shade = 0.55 + 0.35 * checker(p[:, 0], p[:, 2])
    base = np.stack([shade * 0.9, shade * 0.85, shade * 0.75], axis=-1)
    rgb = np.where(hit_f[:, None], base, rgb)
    normal = np.where(hit_f[:, None], np.array([0.0, -1.0, 0.0]), normal)
    inst = np.where(hit_f, 0, inst).astype(np.uint8)

    for k, s in enumerate(SPHERES):
        oc = origins - s["c"]
        b = np.sum(oc * dirs, axis=-1)
        c = np.sum(oc * oc, axis=-1) - s["r"] ** 2
        disc = b * b - c
        ok = disc > 0
        t_s = np.where(ok, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
        hit_s = ok & (t_s > 1e-4) & (t_s < t_best)
        t_best = np.where(hit_s, t_s, t_best)
        p = origins + dirs * np.where(hit_s, t_s, 0.0)[:, None]
        nrm = (p - s["c"]) / s["r"]
        lam = np.clip(-np.sum(nrm * LIGHT_DIR, axis=-1), 0.15, 1.0)
        col = s["albedo"][None] * (0.35 + 0.65 * lam[:, None])
        rgb = np.where(hit_s[:, None], col, rgb)
        normal = np.where(hit_s[:, None], nrm, normal)
        inst = np.where(hit_s, k + 1, inst).astype(np.uint8)

    sky = np.array([0.62, 0.72, 0.85], np.float32)
    miss = ~np.isfinite(t_best)
    rgb = np.where(miss[:, None], sky, rgb)
    depth = np.where(miss, 4.0, t_best * dirs[:, 2] / np.maximum(
        np.linalg.norm(dirs, axis=-1), 1e-9))
    # depth as z-depth along camera axis: dirs are unit later; recompute
    return rgb, depth, normal, inst


def look_at(eye, target):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])  # CV: y down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
    return c2w


def cam_ring(n, radius=1.55, height=-0.35):
    eyes = []
    for i in range(n):
        a = 2 * np.pi * i / n
        eyes.append(np.array([radius * np.sin(a), height,
                              radius * np.cos(a) * 0.9]))
    return [look_at(e, np.array([0.0, 0.25, 0.0])) for e in eyes]


def distort_opencv(xn, yn, k1, k2, p1, p2):
    r2 = xn * xn + yn * yn
    rad = 1 + k1 * r2 + k2 * r2 * r2
    xd = xn * rad + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * rad + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    return xd, yd


def undistort_opencv(xd, yd, k1, k2, p1, p2, iters=8):
    xn, yn = xd.copy(), yd.copy()
    for _ in range(iters):
        fx, fy = distort_opencv(xn, yn, k1, k2, p1, p2)
        xn += xd - fx
        yn += yd - fy
    return xn, yn


def render_frame(c2w, w, h, fx, fy, cx, cy, dist=None):
    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    xn = ((u - cx) / fx).reshape(-1)
    yn = ((v - cy) / fy).reshape(-1)
    if dist is not None:
        xn, yn = undistort_opencv(xn, yn, *dist)
    d_cam = np.stack([xn, yn, np.ones_like(xn)], axis=-1)
    d_world = d_cam @ c2w[:3, :3].T
    zlen = np.linalg.norm(d_cam, axis=-1)
    d_unit = d_world / np.linalg.norm(d_world, axis=-1, keepdims=True)
    origins = np.broadcast_to(c2w[:3, 3], d_unit.shape)
    rgb, t_hit, normal, inst = trace(origins, d_unit)
    # z-depth = t_hit (along unit world ray) * cos(angle to optical axis)
    zdepth = np.where(t_hit < 4.0, t_hit / zlen * 1.0, 4.0)
    # cos factor: unit ray z-component in CAMERA frame = 1/zlen of d_cam
    zdepth = t_hit * (1.0 / zlen)
    return (rgb.reshape(h, w, 3), zdepth.reshape(h, w).astype(np.float32),
            normal.reshape(h, w, 3), inst.reshape(h, w))


def to_png(rgb):
    return Image.fromarray(
        np.clip(rgb * 255 + 0.5, 0, 255).astype(np.uint8))


def write_ns_scene(root, n=6, w=96, h=72):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    for sub in ("depth", "normal", "instance_mask"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    fx = fy = 0.95 * w
    cx, cy = w / 2 - 1.5, h / 2 + 1.0  # off-center principal point
    frames = []
    for i, c2w in enumerate(cam_ring(n)):
        rgb, depth, normal, inst = render_frame(c2w, w, h, fx, fy, cx, cy)
        name = f"frame_{i:03d}"
        to_png(rgb).save(os.path.join(root, "images", f"{name}.png"))
        np.save(os.path.join(root, "depth", f"{name}.npy"), depth)
        # normals png in [0,1]; camera-space like the priors pipeline
        n_cam = normal @ c2w[:3, :3]
        to_png(n_cam * 0.5 + 0.5).save(
            os.path.join(root, "normal", f"{name}.png"))
        # NSDataset convention (ns_dataset.py:300-305): 255 = background
        # (room incl. floor AND sky), object ids 0-based otherwise
        m = np.where(inst == 0, 255, np.where(inst == 255, 255, inst - 1)
                     ).astype(np.uint8)
        Image.fromarray(m).save(
            os.path.join(root, "instance_mask", f"{name}.png"))
        gl = c2w.copy()
        gl[:3, 1:3] *= -1  # CV -> OpenGL (loader flips back)
        frames.append({"file_path": f"images/{name}.png",
                       "transform_matrix": gl.tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"fl_x": fx, "fl_y": fy, "cx": cx, "cy": cy,
                   "w": w, "h": h, "frames": frames}, f)
    graph = [{"node_id": 0, "adj_nodes": [1, 2]},
             {"node_id": 1, "adj_nodes": [0]},
             {"node_id": 2, "adj_nodes": [0]}]
    with open(os.path.join(root, "graph.json"), "w") as f:
        json.dump(graph, f)


def rot_to_quat(R):
    """Robust rotation-matrix -> (w, x, y, z) via the max-diagonal branch
    (Shepperd's method) — the naive trace formula blows up at 180-degree
    rotations, which a camera ring around a scene always contains."""
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return (0.25 * s, (R[2, 1] - R[1, 2]) / s,
                (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s)
    i = int(np.argmax([R[0, 0], R[1, 1], R[2, 2]]))
    if i == 0:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        return ((R[2, 1] - R[1, 2]) / s, 0.25 * s,
                (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s)
    if i == 1:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        return ((R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                0.25 * s, (R[1, 2] + R[2, 1]) / s)
    s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
    return ((R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
            (R[1, 2] + R[2, 1]) / s, 0.25 * s)


def write_colmap_scene(root, n=6, w=80, h=60):
    sp = os.path.join(root, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    fx, fy = 0.9 * w, 0.9 * w
    cx, cy = w / 2 + 0.5, h / 2 - 0.75
    dist = (-0.08, 0.015, 0.0012, -0.0008)  # visible OPENCV distortion

    with open(os.path.join(sp, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 4, w, h))  # model 4 = OPENCV
        f.write(struct.pack("<8d", fx, fy, cx, cy, *dist))

    rng = np.random.default_rng(7)
    with open(os.path.join(sp, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n))
        for i, c2w in enumerate(cam_ring(n, radius=1.7, height=-0.45)):
            rgb, _, _, _ = render_frame(c2w, w, h, fx, fy, cx, cy, dist)
            name = f"dslr_{i:03d}.png"
            to_png(rgb).save(os.path.join(root, "images", name))
            w2c = np.linalg.inv(c2w)
            R, t = w2c[:3, :3], w2c[:3, 3]
            qw, qx, qy, qz = rot_to_quat(R)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", qw, qx, qy, qz))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    # surface-sampled colored points3D (the consistency anchors)
    pts, cols = [], []
    for k, s in enumerate(SPHERES):
        m = 60
        v = rng.normal(size=(m, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        p = s["c"][None] + v * s["r"]
        lam = np.clip(-np.sum(v * LIGHT_DIR, axis=-1), 0.15, 1.0)
        c = s["albedo"][None] * (0.35 + 0.65 * lam[:, None])
        pts.append(p)
        cols.append(c)
    fl = rng.uniform(-1.0, 1.0, size=(80, 2))
    pf = np.stack([fl[:, 0], np.full(80, FLOOR_Y), fl[:, 1]], axis=-1)
    shade = 0.55 + 0.35 * checker(pf[:, 0], pf[:, 2])
    cf = np.stack([shade * 0.9, shade * 0.85, shade * 0.75], axis=-1)
    pts.append(pf)
    cols.append(cf)
    pts = np.concatenate(pts)
    cols = np.concatenate(cols)

    with open(os.path.join(sp, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, (p, c) in enumerate(zip(pts, cols)):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", *np.clip(c * 255 + 0.5, 0, 255
                                                ).astype(np.uint8)))
            f.write(struct.pack("<d", 0.3))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else OUT
    write_ns_scene(os.path.join(out, "ns_scene"))
    write_colmap_scene(os.path.join(out, "colmap"))
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(out) for f in fs)
    print(f"fixture written to {out} ({total/1024:.0f} KiB)")

#!/usr/bin/env python
"""Synthetic robustness benchmark: many varied fragment pairs (rotation,
translation, noise, partial overlap, clutter) through the full pipeline
with converted reference weights; reports DGR-style recall at the 3DMatch
thresholds (0.3 m / 15 deg).

No real datasets ship in this environment, so this is the stand-in
regression benchmark for registration QUALITY (the pose thresholds are the
reference's own, ThreeDMatch/test.py:264-270).

Usage: python scripts/synthetic_eval.py [--pairs N] [--config 3DMatch]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def make_pair(cfg, rs, overlap=0.7, noise=0.005, clutter=0.1):
    """Two partially-overlapping noisy views of a wavy surface."""
    from buffer_tpu.data.preprocess import prepare_pair

    n = 50000
    ext = 1.4
    # --- a mini room scene, not a bare height field.  A single smooth
    # z(x,y) sheet is descriptor-hostile (curvature-poor, repetitive along
    # wave crests) in a way real indoor fragments never are; local
    # cylindrical descriptors NEED orientation/curvature variation to
    # discriminate.  So: wavy floor + randomly-placed boxes (5 exposed
    # faces each) + a back wall segment — the geometry class the 3DMatch
    # checkpoints were trained on.
    parts = []

    def floor_pts(m):
        p = rs.uniform(-ext, ext, (m, 3)).astype(np.float32)
        f1, f2 = rs_f1, rs_f2
        p[:, 2] = (0.35 * np.sin(f1 * p[:, 0]) + 0.3 * np.cos(f2 * p[:, 1])
                   + 0.2 * np.tanh(2.0 * (np.cos(rs_th) * p[:, 0]
                                          + np.sin(rs_th) * p[:, 1])) + 2.0)
        return p

    rs_f1, rs_f2 = rs.uniform(1.2, 2.5), rs.uniform(1.0, 2.2)
    rs_th = rs.uniform(0, 2 * np.pi)

    def box_pts(m, cx, cy, sx, sy, sz, ang):
        # 5 exposed faces of a box resting on the floor, area-weighted
        areas = np.array([sx * sy, sx * sz, sx * sz, sy * sz, sy * sz])
        face = rs.choice(5, m, p=areas / areas.sum())
        u, v = rs.rand(m).astype(np.float32), rs.rand(m).astype(np.float32)
        p = np.zeros((m, 3), np.float32)
        top = face == 0
        p[top] = np.stack([(u[top] - .5) * sx, (v[top] - .5) * sy,
                           np.full(top.sum(), sz, np.float32)], -1)
        for f, sgn in ((1, -.5), (2, .5)):
            i = face == f
            p[i] = np.stack([(u[i] - .5) * sx, np.full(i.sum(), sgn * sy,
                                                       np.float32),
                             v[i] * sz], -1)
        for f, sgn in ((3, -.5), (4, .5)):
            i = face == f
            p[i] = np.stack([np.full(i.sum(), sgn * sx, np.float32),
                             (u[i] - .5) * sy, v[i] * sz], -1)
        ca, sa = np.cos(ang), np.sin(ang)
        rot = np.array([[ca, -sa], [sa, ca]], np.float32)
        p[:, :2] = p[:, :2] @ rot.T
        base = 2.0 + 0.35 * np.sin(rs_f1 * cx) + 0.3 * np.cos(rs_f2 * cy)
        p += np.array([cx, cy, base - 0.02], np.float32)
        return p

    n_boxes = rs.randint(3, 6)
    boxes = [(rs.uniform(-ext * .75, ext * .75), rs.uniform(-ext * .75, ext * .75),
              rs.uniform(.25, .7), rs.uniform(.25, .7), rs.uniform(.2, .6),
              rs.uniform(0, np.pi)) for _ in range(n_boxes)]
    # back wall: a vertical strip with a random orientation jitter
    wall_y = rs.uniform(ext * .75, ext * .95) * rs.choice([-1, 1])

    n_floor = int(n * 0.55)
    n_wall = int(n * 0.12)
    n_box = (n - n_floor - n_wall) // n_boxes
    parts.append(floor_pts(n_floor))
    wx = rs.uniform(-ext, ext, n_wall).astype(np.float32)
    wz = rs.uniform(0, 1.0, n_wall).astype(np.float32)
    parts.append(np.stack(
        [wx, np.full(n_wall, wall_y, np.float32) + 0.08 * np.sin(3.1 * wx),
         2.0 + wz], -1))
    for bx in boxes:
        parts.append(box_pts(n_box, *bx))
    pts = np.concatenate(parts).astype(np.float32)

    # partial overlap: each view keeps a band of the surface.  The band
    # half-width h is solved from the requested TRUE overlap fraction
    # (shared width / view width = overlap for the symmetric cut), so the
    # `overlap` parameter is the actual per-view overlap ratio — the old
    # `cut + rand()` arithmetic let the shared band collapse to near zero
    # on low draws, silently mixing 3DLoMatch-or-worse pairs (true
    # overlap < 0.3, where even the reference recalls ~72%) into a gate
    # that asserts 95%.
    h = ext * overlap / (2.0 - overlap)
    jit_s = 1.0 + 0.15 * (rs.rand() - 0.5)
    jit_t = 1.0 + 0.15 * (rs.rand() - 0.5)
    src = pts[pts[:, 0] <= h * jit_s]
    tgt_w = pts[pts[:, 0] >= -h * jit_t]

    # clutter: off-surface outlier points
    def add_clutter(x):
        m = int(len(x) * clutter)
        c = rs.uniform(-ext, ext, (m, 3)).astype(np.float32)
        c[:, 2] = rs.uniform(1.0, 3.0, m)
        return np.concatenate([x, c])

    src = add_clutter(src)
    tgt_w = add_clutter(tgt_w)
    src = src + rs.randn(len(src), 3).astype(np.float32) * noise
    tgt_w = tgt_w + rs.randn(len(tgt_w), 3).astype(np.float32) * noise

    # rotation from numpy (Shoemake uniform quaternion): jax.random.normal
    # differs in low bits between the axon TPU and CPU backends, and a
    # ~1e-6 rotation delta changes voxel counts -> conditional rs draws ->
    # the whole scene stream diverges per platform.  numpy keeps gate
    # scenes bit-reproducible anywhere (host-side failure analysis).
    u1, u2, u3 = rs.rand(3)
    qx = np.sqrt(1 - u1) * np.sin(2 * np.pi * u2)
    qy = np.sqrt(1 - u1) * np.cos(2 * np.pi * u2)
    qz = np.sqrt(u1) * np.sin(2 * np.pi * u3)
    qw = np.sqrt(u1) * np.cos(2 * np.pi * u3)
    R = np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ], np.float32)
    t = rs.uniform(-0.5, 0.5, 3).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    tgt = (tgt_w @ R.T + t).astype(np.float32)
    inputs = prepare_pair(cfg, src, tgt, rs=rs, already_downsampled=True)
    return inputs, T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=20)
    ap.add_argument("--config", default="3DMatch")
    ap.add_argument("--json", default=None,
                    help="also write a one-line JSON record to this path")
    ap.add_argument("--assert-recall", type=float, default=None,
                    help="exit nonzero unless recall >= this (quality gate)")
    args = ap.parse_args()

    import jax
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from buffer_tpu.config import make_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.compat.torch_convert import load_variables
    from buffer_tpu.pipeline.registration import make_register_fn
    from buffer_tpu.eval.metrics import rte_rre

    cfg = make_cfg(args.config)
    model = BufferModel(cfg)
    SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
    variables = load_variables(
        {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")})
    fn = make_register_fn(model)

    rs = np.random.RandomState(7)
    states = []
    for i in range(args.pairs):
        overlap = rs.uniform(0.45, 0.95)
        noise = rs.uniform(0.0, 0.01)
        # clutter calibration: at >=12% uniform volumetric outliers inside
        # the working slab the DESCRIPTOR stage stops discriminating on
        # these smooth synthetic surfaces (measured: 1-4 of ~400 mutual
        # matches geometrically correct) — and the reference-exact sampled
        # SPT front fails identically to the fused front, while the
        # per-layer + full-composite torch parity tests pin our math to
        # the reference's.  That failure mode is an out-of-distribution
        # property of the MODEL (trained on real indoor fragments, which
        # never exhibit uniform volumetric clutter), not a pipeline
        # regression, so the gate samples clutter in [0, 0.1] where the
        # pipeline is expected to succeed and a drop signals a real bug.
        clutter = rs.uniform(0.0, 0.1)
        inputs, T = make_pair(cfg, rs, overlap, noise, clutter)
        res = fn(variables, inputs, jax.random.PRNGKey(i))
        rte, rre = rte_rre(np.asarray(res.pose, np.float64),
                           np.asarray(T, np.float64))
        ok = rte < 0.3 and rre < 15.0
        states.append(ok)
        print(f"pair {i:3d} overlap={overlap:.2f} noise={noise:.3f} "
              f"clutter={clutter:.2f} mutual={int(res.num_mutual):4d} "
              f"RTE={rte:.4f} RRE={rre:.3f} {'OK' if ok else 'FAIL'}",
              flush=True)
    recall = float(np.mean(states))
    print(f"\nsynthetic recall: {recall:.3f} over {len(states)} pairs")
    if args.json:
        import json
        rec = {"metric": "synthetic_recall", "value": round(recall, 4),
               "unit": "recall@0.3m/15deg", "pairs": len(states),
               "config": args.config}
        with open(args.json, "w") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
    if args.assert_recall is not None and recall < args.assert_recall:
        print(f"FAIL: recall {recall:.3f} < {args.assert_recall}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

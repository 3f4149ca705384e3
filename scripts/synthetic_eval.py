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
    import jax
    import jax.numpy as jnp
    from buffer_tpu.core import se3
    from buffer_tpu.data.preprocess import prepare_pair

    n = 50000
    ext = 1.4
    pts = rs.uniform(-ext, ext, (n, 3)).astype(np.float32)
    f1, f2, f3 = rs.uniform(1.2, 2.5), rs.uniform(1.0, 2.2), rs.uniform(4, 8)
    pts[:, 2] = (0.5 * np.sin(f1 * pts[:, 0]) + 0.4 * np.cos(f2 * pts[:, 1])
                 + 0.15 * np.sin(f3 * pts[:, 0] * pts[:, 1]) + 2.0)

    # partial overlap: each view keeps a band of the surface
    cut = ext * (2 * overlap - 1)
    src = pts[pts[:, 0] <= cut + ext * (1 - overlap) * 2 * rs.rand()]
    tgt_w = pts[pts[:, 0] >= -cut - ext * (1 - overlap) * 2 * rs.rand()]

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

    R = np.asarray(se3.random_rotation(
        jax.random.PRNGKey(rs.randint(1 << 30)), 3))
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
        clutter = rs.uniform(0.0, 0.2)
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

#!/usr/bin/env python
"""Synthetic robustness benchmark: many varied fragment pairs through the
full pipeline with converted reference weights; reports DGR-style recall
per bucket.

No real datasets ship in this environment, so this is the stand-in
regression benchmark for registration QUALITY (pose thresholds are the
reference's own: 0.3 m / 15 deg for 3DMatch, ThreeDMatch/test.py:264-270;
0.3 m / 1 deg for KITTI, KITTI/test.py:66-67).

Buckets:
* 3DMatch, overlap in [0.45, 0.95]  — the regime where the reference gets
  ~93% RR; the primary gate (assert >= 0.95 in CI).
* 3DMatch, overlap in [0.25, 0.45]  — the 3DLoMatch-analog regime where the
  reference itself drops to ~72% RR (README.md:72-75); recorded as a band
  so approximation knobs (banded kNN, ball retention, approx_max_k) have a
  low-overlap tripwire.
* KITTI LiDAR scenes with the reference's KITTI weights (ground + facades
  + poles + cars, des_r=3.0, identity patch frames, SO(2)-dominant motion).

Usage: python scripts/synthetic_eval.py [--config 3DMatch|KITTI]
       [--pairs N] [--low-pairs N] [--json PATH] [--assert-recall R]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from buffer_tpu.data.synthetic import make_room_pair, make_lidar_pair  # noqa: E402

# kept as the import point older tests/scripts use
make_pair = make_room_pair

SNAPS = {
    "3DMatch": "/root/reference/ThreeDMatch/snapshot/06132318",
    "KITTI": "/root/reference/KITTI/snapshot/06050001",
}


def run_bucket(fn, variables, cfg, pair_gen, n_pairs, seed, rte_th, rre_th,
               label, gt_check=None, per_pair=None):
    import jax
    from buffer_tpu.eval.metrics import rte_rre
    from buffer_tpu.data.synthetic import icp_check_gt

    rs = np.random.RandomState(seed)
    states, gt_meds = [], []
    for i in range(n_pairs):
        inputs, T, desc = pair_gen(cfg, rs, i)
        if gt_check is not None:
            # independent host cross-check of the generator's GT pose
            # (catches the r3 doubled-translation class of bug, 2a3d80c,
            # before it can corrupt the recall the driver reads).  The
            # per-pair Kabsch correction is gated LOOSELY (it aliases on
            # smooth surfaces); the decisive signal is the BUCKET median
            # of median matched residuals, asserted after the loop — a
            # generator bug is systematic, so the whole distribution
            # shifts while per-pair scene noise does not.
            max_dist, rte_tol, rre_tol, med_tol = gt_check
            g_rte, g_rre, g_frac, g_med = icp_check_gt(inputs, T, max_dist)
            gt_meds.append(g_med)
            if g_rte > rte_tol or g_rre > rre_tol:
                raise RuntimeError(
                    f"[{label}] pair {i}: synthetic GT fails the ICP "
                    f"cross-check (correction RTE={g_rte:.4f} m "
                    f"RRE={g_rre:.3f} deg, match_frac={g_frac:.3f} vs tol "
                    f"{rte_tol}/{rre_tol}) — generator GT bug, not a "
                    f"model failure")
        res = fn(variables, inputs, jax.random.PRNGKey(i))
        rte, rre = rte_rre(np.asarray(res.pose, np.float64),
                           np.asarray(T, np.float64))
        ok = rte < rte_th and rre < rre_th
        states.append(ok)
        if per_pair is not None:
            per_pair.append({"bucket": label, "pair": i, "desc": desc,
                             "ok": bool(ok), "rte": round(rte, 4),
                             "rre": round(rre, 3),
                             "mutual": int(res.num_mutual)})
        print(f"[{label}] pair {i:3d} {desc} mutual={int(res.num_mutual):4d} "
              f"RTE={rte:.4f} RRE={rre:.3f} {'OK' if ok else 'FAIL'}",
              flush=True)
    if gt_meds:
        bucket_med = float(np.median(gt_meds))
        med_tol = gt_check[3]
        print(f"[{label}] GT cross-check: bucket median residual "
              f"{bucket_med*1000:.1f} mm (tol {med_tol*1000:.0f} mm)",
              flush=True)
        if bucket_med > med_tol:
            raise RuntimeError(
                f"[{label}] synthetic GT fails the bucket-level ICP "
                f"cross-check (median matched residual {bucket_med:.4f} m "
                f"> tol {med_tol} m) — systematic generator GT bug, not "
                f"a model failure")
    recall = float(np.mean(states)) if states else float("nan")
    print(f"[{label}] recall: {recall:.3f} over {len(states)} pairs",
          flush=True)
    return recall, len(states)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=20,
                    help="pairs in the primary bucket")
    ap.add_argument("--low-pairs", type=int, default=None,
                    help="pairs in the 3DMatch low-overlap bucket "
                         "(default: pairs)")
    ap.add_argument("--config", default="3DMatch",
                    choices=["3DMatch", "KITTI"])
    ap.add_argument("--json", default=None,
                    help="also write a one-line JSON record to this path")
    ap.add_argument("--assert-recall", type=float, default=None,
                    help="exit nonzero unless the primary bucket recall >= "
                         "this (quality gate)")
    ap.add_argument("--assert-low-recall", type=float, default=None,
                    help="exit nonzero unless the low-overlap bucket "
                         "recall >= this")
    ap.add_argument("--refine-iters", type=int, default=None,
                    help="override StaticConfig.refine_iters (IRLS rounds) "
                         "for budget re-validation on the hard buckets")
    ap.add_argument("--hypotheses", type=int, default=None,
                    help="override MatchConfig.hypotheses (batched RANSAC)")
    ap.add_argument("--no-check-gt", action="store_true",
                    help="skip the per-pair host-ICP cross-check of the "
                         "generator GT (on by default)")
    ap.add_argument("--exact", action="store_true",
                    help="run the EXACT/FULL stack (decomposition mode, "
                         "VERDICT r3 #3): fp32 gathers/matmuls, exact "
                         "scan top-k kNN (no banding, no approx_max_k), "
                         "reference-exact sampled SPT, refine_iters=20, "
                         "hypotheses=4096 — splits pipeline-approximation "
                         "loss from model-OOD loss on the hard buckets")
    ap.add_argument("--buckets", default="all", choices=["all", "low", "high"],
                    help="3DMatch: which overlap buckets to run")
    ap.add_argument("--per-pair-json", default=None,
                    help="write one JSON line per pair (scene params are "
                         "seed-deterministic, so two runs with the same "
                         "seeds/pair counts are PAIRED samples — the "
                         "shipped-vs-exact decomposition reads these)")
    args = ap.parse_args()

    if args.exact:
        from buffer_tpu.utils import flags
        flags.EXACT_F32 = True
        if args.refine_iters is None:
            args.refine_iters = 20
        if args.hypotheses is None:
            args.hypotheses = 4096

    import jax  # noqa: F401
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from buffer_tpu.config import make_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.compat.torch_convert import load_variables
    from buffer_tpu.pipeline.registration import make_register_fn

    cfg = make_cfg(args.config)
    if args.refine_iters is not None or args.hypotheses is not None or args.exact:
        from dataclasses import replace
        static = cfg.static if args.refine_iters is None else replace(
            cfg.static, refine_iters=args.refine_iters)
        if args.exact:
            static = replace(static, knn_band=0, fused_desc=False)
        match = cfg.match if args.hypotheses is None else replace(
            cfg.match, hypotheses=args.hypotheses)
        cfg = replace(cfg, static=static, match=match)
    model = BufferModel(cfg)
    snap = SNAPS[args.config]
    variables = load_variables(
        {s: f"{snap}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")})
    fn = make_register_fn(model)

    buckets = {}
    if args.config == "3DMatch":
        def gen_high(cfg, rs, i):
            overlap = rs.uniform(0.45, 0.95)
            noise = rs.uniform(0.0, 0.01)
            # clutter calibration: at >=12% uniform volumetric outliers
            # inside the working slab the DESCRIPTOR stage stops
            # discriminating on these smooth synthetic surfaces (measured:
            # 1-4 of ~400 mutual matches geometrically correct) — and the
            # reference-exact sampled SPT front fails identically to the
            # fused front, while the per-layer + full-composite torch
            # parity tests pin our math to the reference's.  That failure
            # mode is an out-of-distribution property of the MODEL (trained
            # on real indoor fragments, which never exhibit uniform
            # volumetric clutter), not a pipeline regression, so the gate
            # samples clutter in [0, 0.1] where the pipeline is expected to
            # succeed and a drop signals a real bug.
            clutter = rs.uniform(0.0, 0.1)
            inputs, T = make_room_pair(cfg, rs, overlap, noise, clutter)
            return inputs, T, (f"overlap={overlap:.2f} noise={noise:.3f} "
                               f"clutter={clutter:.2f}")

        def gen_low(cfg, rs, i):
            overlap = rs.uniform(0.25, 0.45)
            noise = rs.uniform(0.0, 0.01)
            clutter = rs.uniform(0.0, 0.1)
            inputs, T = make_room_pair(cfg, rs, overlap, noise, clutter)
            return inputs, T, (f"overlap={overlap:.2f} noise={noise:.3f} "
                               f"clutter={clutter:.2f}")

        # GT cross-check tolerances (max_dist, per-pair rte/rre LOOSE
        # bounds, bucket-median residual tol).  Measured good-GT bands:
        # per-pair correction <=5 mm/0.05 deg, median residual 12-20 mm
        # (hi overlap) to 45 mm worst-case (low overlap, cross-view
        # clutter); at 2x translation (the 2a3d80c bug class) the
        # correction ALIASES on smooth surfaces (6-11 mm) but the median
        # residual jumps to >=56 mm on every scene — hence the loose
        # per-pair gate + tight 40 mm bucket-median gate.
        gt_check = None if args.no_check_gt else (0.10, 0.05, 1.0, 0.040)
        per_pair = [] if args.per_pair_json else None
        r_hi = r_lo = None
        n_hi = n_lo = 0
        if args.buckets in ("all", "high"):
            # seed 7 keeps the primary bucket's scene stream identical to
            # the round-2 gate (0.98 recall over 50 pairs)
            r_hi, n_hi = run_bucket(fn, variables, cfg, gen_high, args.pairs,
                                    7, 0.3, 15.0, "overlap_045_095",
                                    gt_check=gt_check, per_pair=per_pair)
            buckets["overlap_045_095"] = {"recall": round(r_hi, 4),
                                          "pairs": n_hi}
        if args.buckets in ("all", "low"):
            n_low = args.low_pairs if args.low_pairs is not None else args.pairs
            r_lo, n_lo = run_bucket(fn, variables, cfg, gen_low, n_low, 11,
                                    0.3, 15.0, "overlap_025_045",
                                    gt_check=gt_check, per_pair=per_pair)
            buckets["overlap_025_045"] = {"recall": round(r_lo, 4),
                                          "pairs": n_lo}
        primary, low = (r_hi if r_hi is not None else r_lo), r_lo
        unit = "recall@0.3m/15deg"
        n_primary = n_hi if r_hi is not None else n_lo
    else:  # KITTI
        def gen_kitti(cfg, rs, i):
            dist = rs.uniform(9.0, 13.0)
            noise = rs.uniform(0.005, 0.02)
            inputs, T = make_lidar_pair(cfg, rs, dist=dist, noise=noise)
            return inputs, T, f"dist={dist:.1f} noise={noise:.3f}"

        # LiDAR clouds: 0.30 m voxels + up to 2 cm noise => coarser bias
        # band (good median residual ~165-170 mm; >=270 mm at 2x
        # translation); the guarded bug class is metres-scale
        gt_check = None if args.no_check_gt else (1.0, 0.30, 1.0, 0.220)
        per_pair = [] if args.per_pair_json else None
        primary, n_primary = run_bucket(fn, variables, cfg, gen_kitti,
                                        args.pairs, 13, 0.3, 1.0, "kitti",
                                        gt_check=gt_check,
                                        per_pair=per_pair)
        buckets = {"kitti": {"recall": round(primary, 4), "pairs": n_primary}}
        low = None
        unit = "recall@0.3m/1deg"

    print(f"\nsynthetic recall ({args.config}): {primary:.3f} "
          f"over {n_primary} pairs")
    if args.per_pair_json and per_pair:
        import json as _json
        with open(args.per_pair_json, "w") as f:
            for rec_pp in per_pair:
                f.write(_json.dumps(rec_pp) + "\n")
    if args.json:
        import json
        # One JSON LINE per config run; the repo-level QUALITY.json is the
        # concatenation of these per-config records (jsonl), so every
        # top-level field describes exactly the run that produced it
        # (ADVICE r3: the old shape nested a KITTI bucket under 3DMatch
        # top-level fields).
        rec = {"metric": "synthetic_recall", "value": round(primary, 4),
               "unit": unit, "pairs": n_primary, "config": args.config,
               "buckets": buckets}
        if args.exact or args.refine_iters is not None \
                or args.hypotheses is not None:
            rec["settings"] = {"exact": args.exact,
                               "refine_iters": cfg.static.refine_iters,
                               "hypotheses": cfg.match.hypotheses,
                               "knn_band": cfg.static.knn_band,
                               "fused_desc": cfg.static.fused_desc}
        with open(args.json, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
    rc = 0
    if args.assert_recall is not None and primary < args.assert_recall:
        print(f"FAIL: recall {primary:.3f} < {args.assert_recall}")
        rc = 1
    if (args.assert_low_recall is not None and low is not None
            and low < args.assert_low_recall):
        print(f"FAIL: low-overlap recall {low:.3f} < {args.assert_low_recall}")
        rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""DP eval scaling curve on a virtual CPU mesh (VERDICT r3 #9).

Measures ``make_dp_register`` throughput (pairs/s) at n_devices in
{1, 2, 4, 8} on the 8-device virtual CPU mesh and records the normalized
scaling shape to DP_SCALING.json.  Absolute CPU numbers are meaningless
for TPU perf; the *shape* is the deliverable — near-linear scaling means
the DP eval path has no serial/replicated bottleneck, which is what the
multi-chip story needs beyond the correctness dryrun
(__graft_entry__.dryrun_multichip).

Reference analog: eval pairs are independent, batch_size=1
(ThreeDMatch/test.py:239-275); sharding pairs over chips is the
TPU-native eval-throughput axis the single-GPU reference lacks.

Usage: python scripts/dp_scaling.py [--out DP_SCALING.json]
       (spawns one subprocess per device count; ~2-4 min on CPU)
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def child(n: int, iters: int, warmup: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from buffer_tpu.config import tiny_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.eval.harness import make_dp_register
    from buffer_tpu.pipeline.registration import PairInputs

    cfg = tiny_cfg()
    model = BufferModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    raw = rs.uniform(-0.6, 0.6, (600, 3)).astype(np.float32)
    raw[:, 2] = 0.2 * np.sin(4 * raw[:, 0]) + 1.4

    def pad(x, m):
        o = np.zeros((m, 3), np.float32)
        o[: min(len(x), m)] = x[:m]
        msk = np.zeros(m, bool)
        msk[: min(len(x), m)] = True
        return o, msk

    r, mr = pad(raw, cfg.static.raw_points)
    s, ms = pad(raw[::2], cfg.static.points_l0)
    one = PairInputs(jnp.asarray(np.stack([r, r])),
                     jnp.asarray(np.stack([mr, mr])),
                     jnp.asarray(np.stack([s, s])),
                     jnp.asarray(np.stack([ms, ms])))
    binputs = jax.tree_util.tree_map(lambda x: jnp.stack([x] * n), one)
    keys = jax.random.split(jax.random.PRNGKey(1), n)

    if os.environ.get("DP_ATTRIB") == "1":
        # attribution mode (VERDICT r4 "Next #6"): same n-pair batch on ONE
        # device via vmap — no mesh, no collectives, no sharding.  If this
        # curve has the same knee, the mesh curve's n=8 falloff is the
        # single host core saturating (all 8 virtual devices share one
        # physical core, nproc=1), not a sharding artifact.
        import jax as _jax
        from buffer_tpu.pipeline.registration import register_pair
        fn = _jax.jit(lambda v, b, k: _jax.vmap(
            lambda bi, ki: register_pair(model, v, bi, ki))(b, k))
    else:
        mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
        fn = make_dp_register(model, mesh)
    for _ in range(warmup):
        fn(variables, binputs, keys).pose.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(variables, binputs, keys).pose.block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({"n": n, "pairs_per_s": n * iters / dt}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DP_SCALING.json")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--n", type=int, default=None, help="(internal) child")
    args = ap.parse_args()

    if args.n is not None:
        child(args.n, args.iters, args.warmup)
        return

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="",   # sitecustomize would otherwise
                                          # pin the axon TPU platform
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    def sweep(attrib):
        pts = []
        e = dict(env, DP_ATTRIB="1") if attrib else env
        for n in (1, 2, 4, 8):
            out = subprocess.run(
                [sys.executable, __file__, "--n", str(n),
                 "--iters", str(args.iters), "--warmup", str(args.warmup)],
                env=e, capture_output=True, text=True, timeout=1200)
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-2000:])
                raise SystemExit(f"child n={n} failed")
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            pts.append(rec)
            print(f"{'attrib ' if attrib else ''}n={rec['n']}: "
                  f"{rec['pairs_per_s']:.3f} pairs/s", flush=True)
        return pts

    points = sweep(False)
    attrib_points = sweep(True)

    for pts in (points, attrib_points):
        base = pts[0]["pairs_per_s"]
        for rec in pts:
            rec["speedup"] = rec["pairs_per_s"] / base
            rec["efficiency"] = rec["speedup"] / rec["n"]
    result = {
        "metric": "dp_eval_scaling_cpu_mesh",
        "note": ("virtual 8-device CPU mesh; shape only — absolute CPU "
                 "pairs/s is not a TPU number"),
        "points": points,
        "attribution": {
            "note": ("same n-pair batch on ONE device via vmap (no mesh, "
                     "no sharding): if this single-core batching curve "
                     "shows the same n=8 knee, the mesh knee is the single "
                     "physical host core (nproc=1) saturating once "
                     "per-step dispatch overhead is amortized — expected "
                     "to disappear on real chips where each dp shard owns "
                     "its own TensorCore and ICI handles the gather"),
            "nproc": os.cpu_count(),
            "points": attrib_points,
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

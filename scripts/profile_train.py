#!/usr/bin/env python
"""Training-step throughput at the full 3DMatch static plan on one chip.

The reference trains each stage on a single GPU at batch 1
(ThreeDMatch/train.py); this measures our jitted per-stage train step
(buffer_tpu/train/trainer.make_train_step — forward, loss, backward, Adam,
NaN-guard) on one TPU chip with the same on-device scan differencing as
scripts/profile_stages.py.

Usage: python scripts/profile_train.py [--stages Ref,Desc,Keypt,Inlier]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="Ref,Desc,Keypt,Inlier")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from buffer_tpu.config import make_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.train.trainer import (make_train_step, make_optimizer,
                                          TrainBatch)
    from bench import synthetic_pair

    cfg = make_cfg("3DMatch")
    model = BufferModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    inputs, T = synthetic_pair(cfg)
    batch = TrainBatch(inputs=inputs, relt_pose=jnp.asarray(T))

    for stage in args.stages.split(","):
        tx, _ = make_optimizer(cfg, stage)
        opt_state = tx.init(variables[stage]["params"])
        det_margin = 1.0 if cfg.data.dataset == "KITTI" else 1.05
        step = make_train_step(model, tx, stage, det_margin)

        def run(n):
            @jax.jit
            def f(variables, opt_state, key):
                def body(carry, inp):
                    k, i = inp
                    v, o = carry
                    # jog the inputs per iteration so XLA cannot hoist the
                    # (loop-invariant) pyramid build out of the scan
                    eps = i.astype(jnp.float32) * 1e-12
                    b = batch._replace(inputs=batch.inputs._replace(
                        raw=batch.inputs.raw + eps,
                        sds=batch.inputs.sds + eps,
                        lvl1=batch.inputs.lvl1 + eps,
                        lvl2=batch.inputs.lvl2 + eps))
                    v, o, loss, _ = step.__wrapped__(v, o, b, k)
                    return (v, o), loss
                (v, o), losses = jax.lax.scan(
                    body, (variables, opt_state),
                    (jax.random.split(key, n), jnp.arange(n)))
                return losses
            return f

        f_lo, f_hi = run(2), run(2 + args.iters)
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        l_lo = np.asarray(f_lo(variables, opt_state, key))
        l_hi = np.asarray(f_hi(variables, opt_state, key))
        compile_s = time.time() - t0

        def sync(g):
            best = 1e9
            for _ in range(3):
                t1 = time.time()
                np.asarray(g(variables, opt_state, key))
                best = min(best, time.time() - t1)
            return best

        ms = (sync(f_hi) - sync(f_lo)) / args.iters * 1000.0
        print(f"{stage:7s} train step {ms:8.1f} ms  "
              f"(loss {l_hi[-1]:.4f}, compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())

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


def precision_check(model, variables, batch, stages):
    """ADVICE r3: the HIGH default_matmul_precision context in
    pipeline/train_forward.stage_loss wraps the value_and_grad trace, so
    the BACKWARD matmuls inherit HIGH via dot_general's transpose rule.
    This measures what the downgrade does to the GRADIENT itself: one
    value_and_grad of the same loss at the same params under HIGH vs
    HIGHEST, reporting the relative L2 gradient error per stage.  (A
    multi-step trajectory comparison is useless here: Adam normalizes
    updates, so ulp-level gradient noise — like any seed change —
    diverges trajectories chaotically within a few steps.)"""
    import jax
    import jax.numpy as jnp
    import buffer_tpu.pipeline.train_forward as tf

    for stage in stages:
        def run(prec):
            orig = tf._PRECISION_OVERRIDE
            tf._PRECISION_OVERRIDE = prec
            try:
                # fresh jit per precision: the override is baked in at
                # trace time, and a shared jitted fn would cache-hit and
                # silently reuse the first precision
                @jax.jit
                def g(variables):
                    def loss_fn(params):
                        v = dict(variables)
                        v[stage] = {"params": params,
                                    "batch_stats": variables[stage]["batch_stats"]}
                        loss, _, _ = tf.stage_loss(
                            model, v, stage, batch.inputs, batch.relt_pose,
                            jax.random.PRNGKey(7), train=True)
                        return loss
                    return jax.value_and_grad(loss_fn)(
                        variables[stage]["params"])
                return g(variables)
            finally:
                tf._PRECISION_OVERRIDE = orig

        loss_hi, g_hi = run("high")
        loss_xx, g_xx = run("highest")
        num = den = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(g_hi),
                        jax.tree_util.tree_leaves(g_xx)):
            num += float(jnp.sum((a - b) ** 2))
            den += float(jnp.sum(b ** 2))
        rel = (num / max(den, 1e-30)) ** 0.5
        print(f"{stage:7s} grad rel-L2(high vs highest) = {rel:.3e}"
              f"  (loss {float(loss_hi):.6f} vs {float(loss_xx):.6f})",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="Ref,Desc,Keypt,Inlier")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--precision-check", action="store_true",
                    help="compare param deltas after a few steps at HIGH "
                         "vs HIGHEST matmul precision instead of timing")
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

    if args.precision_check:
        # precision is a per-matmul property, not a shape property: the
        # small plan compiles in ~1 min vs ~10 for the full plan
        from buffer_tpu.config import small_cfg
        cfg = small_cfg()
        model = BufferModel(cfg)
        variables = model.init(jax.random.PRNGKey(0))
        inputs, T = synthetic_pair(cfg)
        batch = TrainBatch(inputs=inputs, relt_pose=jnp.asarray(T))
        return precision_check(model, variables, batch,
                               args.stages.split(","))

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

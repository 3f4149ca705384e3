#!/usr/bin/env python
"""Capture a jax.profiler device trace of one training-stage step scan.

Usage: python scripts/capture_train_trace.py [--stage Desc] [--out DIR]
Analyze with scripts/analyze_trace.py <dir> --iters 4.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="Desc")
    ap.add_argument("--out", default="/tmp/jaxtrace_train")
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

    tx, _ = make_optimizer(cfg, args.stage)
    opt_state = tx.init(variables[args.stage]["params"])
    step = make_train_step(model, tx, args.stage,
                           1.0 if cfg.data.dataset == "KITTI" else 1.05)

    @jax.jit
    def run(variables, opt_state, key):
        def body(carry, inp):
            k, i = inp
            v, o = carry
            eps = i.astype(jnp.float32) * 1e-12
            b = batch._replace(inputs=batch.inputs._replace(
                raw=batch.inputs.raw + eps, sds=batch.inputs.sds + eps,
                lvl1=batch.inputs.lvl1 + eps, lvl2=batch.inputs.lvl2 + eps))
            v, o, loss, _ = step.__wrapped__(v, o, b, k)
            return (v, o), loss
        (v, o), losses = jax.lax.scan(
            body, (variables, opt_state),
            (jax.random.split(key, 4), jnp.arange(4)))
        return losses

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    np.asarray(run(variables, opt_state, key))
    print(f"compile+run {time.time()-t0:.0f}s", flush=True)

    jax.profiler.start_trace(args.out)
    np.asarray(run(variables, opt_state, key))
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    sys.exit(main())

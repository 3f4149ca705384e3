#!/usr/bin/env python
"""Capture a jax.profiler device trace of the full registration scan."""
import sys, time, shutil, os
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    from buffer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from buffer_tpu.config import make_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.compat.torch_convert import load_variables
    from buffer_tpu.pipeline.registration import register_pair
    from bench import synthetic_pair

    cfg = make_cfg("3DMatch")
    model = BufferModel(cfg)
    SNAP = "/root/reference/ThreeDMatch/snapshot/06132318"
    variables = load_variables(
        {s: f"{SNAP}/{s}/best.pth" for s in ("Ref", "Desc", "Keypt", "Inlier")})
    inputs, _ = synthetic_pair(cfg)

    @jax.jit
    def run(variables, inputs, key):
        def body(c, inp):
            k, i = inp
            eps = i.astype(jnp.float32) * 1e-12
            jogged = inputs._replace(
                raw=inputs.raw + eps, sds=inputs.sds + eps,
                lvl1=inputs.lvl1 + eps, lvl2=inputs.lvl2 + eps)
            r = register_pair(model, variables, jogged, k)
            return c, r.pose
        _, poses = jax.lax.scan(
            body, 0, (jax.random.split(key, 4), jnp.arange(4)))
        return poses

    key = jax.random.PRNGKey(0)
    np.asarray(run(variables, inputs, key))  # compile + warm
    out = "/tmp/jaxtrace"
    shutil.rmtree(out, ignore_errors=True)
    with jax.profiler.trace(out):
        np.asarray(run(variables, inputs, key))
    print("trace written to", out)


if __name__ == "__main__":
    main()

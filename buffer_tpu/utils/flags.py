"""Global evaluation-mode flags.

EXACT_F32 switches every TPU-only approximation in the inference path back
to its exact/full-precision form, so quality regressions can be decomposed
into "pipeline approximation" vs "model out-of-distribution" effects
(VERDICT r3 task #3 — the low-overlap bucket triage):

* packed bf16 neighborhood gathers      -> exact fp32 gathers
* bf16 planes-matmul staging (nn/vn)    -> fp32 matmuls (HIGHEST)
* bf16-packed upsample row copies       -> fp32 copies
* approx_max_k kNN (recall 0.95)        -> exact scan top-k
  (the banded kNN window is a separate knob: cfg.static.knn_band = 0)

Set it BEFORE building/tracing any jitted registration fn (module state is
baked in at trace time; nothing retraces on later changes).  The sampled
(reference-exact) SPT front is a config knob, not covered here:
``cfg.static.fused_desc = False``.
"""

EXACT_F32 = False


def exact_f32() -> bool:
    return EXACT_F32

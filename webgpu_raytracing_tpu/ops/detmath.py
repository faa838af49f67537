"""Cross-platform-deterministic f32 helpers.

XLA:TPU lowers f32 division *inside a fusion* to a reciprocal-multiply
with Newton refinement (there is no native f32 divide on the VPU), and
additionally rewrites ``x / sqrt(s)`` into ``x * rsqrt(s)``. Either way
the quotient can differ from XLA:CPU's exact-rounded divide by 1-2 ulp.
Standalone ``div``/``sqrt``/``rsqrt`` ARE bit-identical between the two
backends, but an ``optimization_barrier`` on the denominator does NOT
recover that inside a real graph (measured: the barriered normalize is
*worse*, max 2 ulp — tools/op_determinism.py ``norm3b``). Every camera
and bounce direction therefore picked up ulp-level noise on TPU, which
chaotic path divergence amplified into the whole 512²·4spp
cross-platform RMSE (0.0866, 3.1% of pixels; tools/primary_diverge.py
localized it: identical rays trace to 0 face mismatches while 100% of
raygen directions differed).

The fix that measures bit-identical on both backends (``cr_div``,
0/65536 mismatches): take whatever quotient the platform gives, then
apply one exact-residual correction step — Dekker/Veltkamp two-product
to compute ``r = num - q·den`` exactly, then ``q + r/den``. The
correction converges to the correctly rounded quotient no matter how
the embedded divides are approximated, so CPU (already correctly
rounded; the step is a bitwise no-op there — measured 0/65536 vs plain
``/``) and TPU (1-2 ulp off pre-correction) land on the same bits.
Cost: ~10 VPU flops per lane in passes that are gather/HBM-bound —
unmeasurable at frame level.

WGSL ``normalize()`` is exact-rounded per IEEE div/sqrt on the driver
stacks the golden was validated against (the CPU simulator matches the
48² golden bit-exactly), so deterministic-normalize is also the
faithful-parity choice, not just a cross-platform convenience.
"""

from __future__ import annotations

import jax.numpy as jnp

# Veltkamp split constant for f32: 2^12 + 1 (splits a 24-bit mantissa
# into two 12-bit halves so products of halves are exact in f32).
_SPLIT = 4097.0


def _two_prod(x, y):
    """Exact f32 product: returns (p, err) with x*y == p + err exactly
    (Dekker two-product via Veltkamp splitting; no FMA dependence)."""
    p = x * y
    cx = jnp.float32(_SPLIT) * x
    xh = cx - (cx - x)
    xl = x - xh
    cy = jnp.float32(_SPLIT) * y
    yh = cy - (cy - y)
    yl = y - yh
    err = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    return p, err


def det_div(num, den):
    """num / den, correctly rounded on every backend (bit-identical
    CPU↔TPU, measured over 65536 random quotients *inside a jit graph*
    — tools/op_determinism.py ``cr_div``). One Newton/Dekker residual
    correction on top of the platform quotient."""
    num = jnp.asarray(num, jnp.float32)
    den = jnp.asarray(den, jnp.float32)
    q = num / den
    p, err = _two_prod(q, den)
    r = (num - p) - err
    res = q + r / den
    # Veltkamp splitting overflows for |x| > ~8.3e34 (4097*x -> inf), so
    # the correction can be NaN where the plain quotient is finite (e.g.
    # huge t from a grazing near-zero det). Fall back to the platform
    # quotient there — those magnitudes are far outside the parity-
    # sensitive range anyway.
    return jnp.where(jnp.isfinite(res), res, q)


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """v / max(|v|, eps) along the last axis, bit-identical CPU↔TPU.

    ``sqrt`` is bit-identical across backends even in fusions (measured);
    only the divide needs the correction.
    """
    n = jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), eps)
    return det_div(v, n)

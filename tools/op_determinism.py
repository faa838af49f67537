"""Which f32 primitives are bit-identical between XLA:CPU and XLA:TPU?

primary_diverge.py proved the traversal (pure mul/add/compare) matches
bitwise across platforms while raygen (div/rsqrt/transcendentals)
diverges on every lane. This probes each primitive over a fixed random
sample plus a correctly-rounded-division emulation candidate
(Newton quotient + Dekker-exact residual correction) to confirm the
deterministic-math plan before wiring it into raygen/sampling.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/op_determinism.py
"""

from __future__ import annotations

import os
import subprocess
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)

_CHILD = r"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_webgpu_raytracing_tpu")
import jax
platform, out = sys.argv[1], sys.argv[2]
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(7)
N = 1 << 16
a = rng.uniform(-4.0, 4.0, N).astype(np.float32)
b = rng.uniform(0.1, 4.0, N).astype(np.float32) * np.where(
    rng.uniform(size=N) < 0.5, -1.0, 1.0
).astype(np.float32)
u = rng.uniform(0.0, 1.0, N).astype(np.float32)
p = np.abs(a) + 0.01

def cr_div(x, y):
    # Newton quotient (whatever the platform gives) + exact residual
    # correction via Dekker two-product -> correctly rounded division
    q = x / y
    # two_product(q, y) without FMA (Veltkamp split)
    c = jnp.float32(4097.0) * q
    qh = c - (c - q)
    ql = q - qh
    c = jnp.float32(4097.0) * y
    yh = c - (c - y)
    yl = y - yh
    pr = q * y
    err = ((qh * yh - pr) + qh * yl + ql * yh) + ql * yl
    r = (x - pr) - err
    return q + r / y

def _cbrt_newton(x):
    y = jnp.exp(jnp.log(jnp.maximum(x, 1e-30)) * (1.0 / 3.0))
    for _ in range(2):
        y = y - (y - x / (y * y)) * (1.0 / 3.0)
    return y

fns = {
    "mul": lambda: a * b,
    "add": lambda: a + b,
    "div": lambda: a / b,
    "recip": lambda: 1.0 / b,
    "sqrt": lambda: jnp.sqrt(p),
    "rsqrt": lambda: jax.lax.rsqrt(p),
    "sin": lambda: jnp.sin(a),
    "cos": lambda: jnp.cos(a),
    "tan": lambda: jnp.tan(a),
    "exp": lambda: jnp.exp(a),
    "log": lambda: jnp.log(p),
    "atan2": lambda: jnp.arctan2(a, b),
    "acos": lambda: jnp.arccos(u * 2 - 1),
    "cbrt": lambda: jnp.cbrt(p),
    "cr_div": lambda: cr_div(jnp.asarray(a), jnp.asarray(b)),
    "norm3": lambda: (
        jnp.stack([a, b, p], -1)
        / jnp.sqrt(a * a + b * b + p * p)[..., None]
    ).ravel(),
    # candidate fix: an optimization_barrier on the norm stops XLA:TPU's
    # a/sqrt(b) -> a*rsqrt(b) algebraic rewrite; div and sqrt are each
    # bit-identical standalone
    "norm3b": lambda: (
        jnp.stack([a, b, p], -1)
        / jax.lax.optimization_barrier(
            jnp.sqrt(a * a + b * b + p * p)
        )[..., None]
    ).ravel(),
    # candidate fix: Newton-iteration cbrt (the reference's own rng.ts
    # implementation) — pure mul/add/div, deterministic by construction
    "cbrt_newton": lambda: _cbrt_newton(jnp.asarray(p)),
    # the shipped fix (ops/detmath.py): normalize with the Dekker
    # residual-corrected divide — must be 0/0
    "norm3_cr": lambda: __import__(
        "webgpu_raytracing_tpu.ops.detmath", fromlist=["normalize"]
    ).normalize(jnp.stack([a, b, p], -1)).ravel(),
    # raygen's exact composition at the thin-lens step: normalize of a
    # difference whose operands came through divides
    "lens_cr": lambda: __import__(
        "webgpu_raytracing_tpu.ops.detmath", fromlist=["normalize"]
    ).normalize(
        jnp.stack([a, b, p], -1)
        * __import__(
            "webgpu_raytracing_tpu.ops.detmath", fromlist=["det_div"]
        ).det_div(2.5, jnp.stack([p, p, p], -1))
    ).ravel(),
}
res = {}
for name, fn in fns.items():
    res[name] = np.asarray(jax.jit(fn)())
np.savez(out, **res)
"""


def run(platform: str, out: str) -> None:
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_webgpu_raytracing_tpu",
        PYTHONPATH="/root/repo:/root/.axon_site",
    )
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, platform, out],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{platform} failed: {r.stderr[-2000:]}")


def main():
    import numpy as np

    run("cpu", "/tmp/od_cpu.npz")
    run("tpu", "/tmp/od_tpu.npz")
    cpu, tpu = np.load("/tmp/od_cpu.npz"), np.load("/tmp/od_tpu.npz")
    for k in cpu.files:
        c, t = cpu[k], tpu[k]
        neq = int((c.view(np.uint32) != t.view(np.uint32)).sum())
        ulp = 0
        if neq:
            ci = c.view(np.int32).astype(np.int64)
            ti = t.view(np.int32).astype(np.int64)
            ulp = int(np.abs(ci - ti).max())
        print(f"{k:8s} mismatched {neq}/{c.size}  max_ulp {ulp}")


if __name__ == "__main__":
    main()

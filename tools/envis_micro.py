"""Microbench: env-IS per-vertex pieces at 1080p wave scale on TPU.

The r5 envis frame costs ~2700 ms over the equirect baseline across ~6
env-NEE vertices (~445 ms/vertex) while the unbounded any-hit leg alone
microbenches at ~116 ms — attribute the rest: the sample_env CDF
inversion (row linear scan + per-lane 4096-wide cond_cdf row gather +
col scan), the lum/img pdf gathers, or the MIS arithmetic.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/envis_micro.py
"""
import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
import jax

if os.environ.get("PROF_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from webgpu_raytracing_tpu.ops import rng
from webgpu_raytracing_tpu.ops.env_sample import (
    build_env_distribution,
    env_pdf,
    sample_env,
)

R = int(os.environ.get("PROF_R", 1920 * 1080))
REPS = int(os.environ.get("PROF_REPS", 12))


def synth(h=2048, w=4096):
    y = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    img = np.stack(
        [
            0.3 + 0.5 * y + np.zeros((h, w), np.float32),
            0.4 + 0.4 * y + np.zeros((h, w), np.float32),
            0.6 + 0.3 * y + np.zeros((h, w), np.float32),
        ],
        axis=-1,
    )
    img[1024:1028, 2048:2052] = 800.0
    return img


def timed(label, fn, args):
    t0 = time.perf_counter()
    out = fn(args[0])
    float(jnp.sum(jax.tree.leaves(out)[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = None
    for i in range(REPS):
        out = fn(args[i % len(args)])
        first = jax.tree.leaves(out)[0]
        acc = first if acc is None else acc + first
    float(jnp.sum(acc))
    dt = (time.perf_counter() - t0) / REPS
    print(
        json.dumps(
            {"label": label, "ms": round(1000 * dt, 1),
             "compile_s": round(compile_s, 1)}
        ),
        flush=True,
    )


def main():
    dist = build_env_distribution(synth())
    dist = jax.device_put(dist)
    states = [
        rng.seed_state(
            jnp.broadcast_to(jnp.uint32(3 + k), (R,)),
            jnp.arange(R, dtype=jnp.int32),
        )
        for k in range(3)
    ]

    @jax.jit
    def draw(state):
        d, rad, pdf, state = sample_env(dist, state)
        return jnp.sum(d, axis=-1) + rad[:, 0] + pdf

    @jax.jit
    def pdf_only(state):
        t2, state = rng.random_2(state)
        u1, u2 = t2[..., 0], t2[..., 1]
        z = 1.0 - 2.0 * u1
        r2 = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = 2.0 * np.pi * u2
        dirs = jnp.stack(
            [r2 * jnp.cos(phi), z, r2 * jnp.sin(phi)], axis=-1
        )
        return env_pdf(dist, dirs)

    timed("sample_env", draw, states)
    timed("env_pdf", pdf_only, states)


if __name__ == "__main__":
    main()

"""Isolate WHERE the TPU-vs-CPU primary-ray divergence enters.

tpu_vs_cpu.py shows 20/2304 primary G-buffer face ids differ between
platforms even on the exact XLA clustered backend. Two suspects:
(a) raygen arithmetic (tan/normalize/divide lowering) produces 1-ulp
    different directions, which legitimately flip silhouette faces;
(b) the traversal/intersection math itself contracts differently
    (FMA fusion, dot lowering) so IDENTICAL rays pick different faces.

Probe: render stage by stage on both platforms with bit-compare.
  1. camera_rays on TPU vs CPU -> bitwise direction/origin compare;
  2. trace the SAME host-constant rays (CPU-generated) through the
     clustered backend on both platforms -> face id compare.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/primary_diverge.py
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
platform, out, raysrc = sys.argv[1], sys.argv[2], sys.argv[3]
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from webgpu_raytracing_tpu.config import RenderSettings, F32_MAX
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.camera import Camera
from webgpu_raytracing_tpu.ops.raygen import camera_rays
from webgpu_raytracing_tpu.ops import rng
from webgpu_raytracing_tpu.ops.cluster_trace import trace_closest_clustered

SIZE = 48
settings = RenderSettings(width=SIZE, height=SIZE, environment="equirect",
                          sample_count=1, bounces_depth=4,
                          traversal="clustered")
scene = load_scene("/root/reference/assets/raytraced-scene.obj",
                   "/root/reference/assets/raytraced-scene.mtl")
tables = scene.tables()
view = jnp.asarray(Camera().view_matrix(), jnp.float32)

ids = jnp.arange(SIZE * SIZE, dtype=jnp.uint32)
state = rng.seed_state(jnp.uint32(12345), ids)
pos = jnp.stack(
    [(ids % SIZE).astype(jnp.float32) + 0.5,
     (ids // SIZE).astype(jnp.float32) + 0.5], axis=-1
)

@jax.jit
def gen(pos, view, state):
    return camera_rays(pos, view, state, settings)

o, d, _ = gen(pos, view, state)
o, d = np.asarray(o), np.asarray(d)

if raysrc and raysrc != "-":
    src = np.load(raysrc)
    o_in, d_in = jnp.asarray(src["o"]), jnp.asarray(src["d"])
else:
    o_in, d_in = jnp.asarray(o), jnp.asarray(d)

@jax.jit
def tr(o, d):
    hit = trace_closest_clustered(
        o, d, jnp.full((o.shape[0],), F32_MAX), tables
    )
    return hit.t, hit.face

t, face = tr(o_in, d_in)
np.savez(out, o=o, d=d, t=np.asarray(t), face=np.asarray(face))
"""


def run(platform: str, out: str, raysrc: str = "-") -> None:
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_webgpu_raytracing_tpu",
        PYTHONPATH="/root/repo:/root/.axon_site",
    )
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, platform, out, raysrc],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{platform} failed: {r.stderr[-2000:]}")


def main():
    import numpy as np

    run("cpu", "/tmp/pd_cpu.npz")
    run("tpu", "/tmp/pd_tpu.npz")
    cpu, tpu = np.load("/tmp/pd_cpu.npz"), np.load("/tmp/pd_tpu.npz")
    d_eq = (cpu["d"].view(np.uint32) == tpu["d"].view(np.uint32)).all(axis=1)
    o_eq = (cpu["o"].view(np.uint32) == tpu["o"].view(np.uint32)).all(axis=1)
    print(f"raygen: {int((~d_eq).sum())}/{d_eq.size} dirs differ, "
          f"{int((~o_eq).sum())} origins differ")
    f_mis = cpu["face"] != tpu["face"]
    print(f"own-ray trace: {int(f_mis.sum())} face mismatches")
    # same-ray trace: feed the CPU rays to the TPU
    run("tpu", "/tmp/pd_tpu2.npz", "/tmp/pd_cpu.npz")
    tpu2 = np.load("/tmp/pd_tpu2.npz")
    f2 = cpu["face"] != tpu2["face"]
    t2 = cpu["t"].view(np.uint32) != tpu2["t"].view(np.uint32)
    print(f"same-ray trace: {int(f2.sum())} face mismatches, "
          f"{int(t2.sum())} t-bit mismatches")


if __name__ == "__main__":
    main()

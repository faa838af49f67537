"""A/B the fused dense passes against the originals — bit-equality +
on-chip timing.

The r4 leg profile shows the two dense (R, C) passes (sort key 38 ms,
tile nears 35 ms) rival the kernel itself; both materialize multiple
(R, C) f32 temporaries in HBM. The fused rewrites (per-axis
accumulation + one reduction consumer; the key's top-2 as ONE variadic
reduce) must produce bit-identical outputs and, if the fusion holds,
drop to compute-bound time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fused_pass_bench.py
       JAX_PLATFORMS-forcing not needed: bit-equality also checked here.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("FUSED_CPU"):
    jax.config.update("jax_platforms", "cpu")

from webgpu_raytracing_tpu.config import F32_MAX, RenderSettings
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.ops import rng
from webgpu_raytracing_tpu.ops.cluster_trace import (
    _boxes_near,
    tile_nears_fused,
)
from webgpu_raytracing_tpu.ops.intersect import safe_inv_dir
from webgpu_raytracing_tpu.ops.raygen import camera_rays
from webgpu_raytracing_tpu.ops.ray_sort import (
    nearest_cluster_key,
    nearest_cluster_key_fused,
)

W = int(os.environ.get("PROF_W", 1920))
H = int(os.environ.get("PROF_H", 1080))
R = W * H
REPS = int(os.environ.get("PROF_REPS", 4))
TILE = 128


def timed(label, fn, arg_sets):
    t0 = time.perf_counter()
    out = fn(*arg_sets[0])
    float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    accs = [fn(*arg_sets[i % len(arg_sets)]) for i in range(REPS)]
    for a in accs:
        float(jnp.sum(jax.tree.leaves(a)[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / REPS
    print(
        json.dumps(
            {"label": label, "ms": round(1000 * dt, 1),
             "compile_s": round(compile_s, 1)}
        ),
        flush=True,
    )


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    tables = jax.device_put(scene.tables())
    ct = tables.clusters
    settings = RenderSettings(width=W, height=H)
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.int32),
        jnp.arange(W, dtype=jnp.int32),
        indexing="ij",
    )
    idx = (xs + ys * W).reshape(R)
    pos = jnp.stack([xs, ys], axis=-1).reshape(R, 2).astype(jnp.float32)
    view = jnp.eye(4, dtype=jnp.float32)
    state = rng.seed_state(jnp.broadcast_to(jnp.uint32(1), (R,)), idx)
    o, d, state = camera_rays(pos, view, state, settings)
    sets = []
    for k in range(REPS):
        t2, state = rng.random_2(state)
        nd = rng.sample_cosine_weighted_hemisphere(t2, -d)
        u1, state = rng.random_1(state)
        tm = jnp.where(u1 < 0.8, F32_MAX, 0.0)
        sets.append((o, nd, tm))
    sets = jax.device_put(sets)

    sbox = ct.sort_box
    cboxes = ct.box
    c = cboxes.shape[0]
    cp = max(128, -(-c // 128) * 128)

    f_key_old = jax.jit(lambda o, d, tm: nearest_cluster_key(o, d, tm, sbox))
    f_key_new = jax.jit(
        lambda o, d, tm: nearest_cluster_key_fused(o, d, tm, sbox)
    )

    def near_old(o, d, tm):
        inv_d = safe_inv_dir(d)
        n_tiles = R // TILE

        def tile_nears(args):
            ot, it, tt = args
            near = jnp.min(_boxes_near(ot, it, cboxes, tt), axis=0)
            return jnp.pad(near, (0, cp - c), constant_values=F32_MAX)

        return jax.lax.map(
            tile_nears,
            (
                o.reshape(n_tiles, TILE, 3),
                inv_d.reshape(n_tiles, TILE, 3),
                tm.reshape(n_tiles, TILE),
            ),
            batch_size=max(1, min(n_tiles, 16_777_216 // (TILE * cp))),
        )

    def near_new(o, d, tm):
        return tile_nears_fused(
            o, safe_inv_dir(d), tm, cboxes, TILE, pad_to=cp
        )

    f_near_old = jax.jit(near_old)
    f_near_new = jax.jit(near_new)

    # bit-equality first
    ka = np.asarray(f_key_old(*sets[0]))
    kb = np.asarray(f_key_new(*sets[0]))
    print("key bit-identical:", bool(np.array_equal(ka, kb)), flush=True)
    na = np.asarray(f_near_old(*sets[0]))
    nb = np.asarray(f_near_new(*sets[0]))
    print("near bit-identical:", bool(np.array_equal(na, nb)), flush=True)

    timed("key_old", f_key_old, sets)
    timed("key_fused", f_key_new, sets)
    timed("near_old", f_near_old, sets)
    timed("near_fused", f_near_new, sets)


if __name__ == "__main__":
    main()

"""1M-triangle two-level kernel bench: group size G=64 vs 128 (+adiv).

The round-2 CPU study (ROADMAP.md) predicted ~29% fewer inner DMA-matmul
rounds at G=64 (children-hit per tile 84 vs 119) with near-constant outer
unions — this measures it on chip, bounce-inclusive, and drives the
group_size default (models/scene.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/stress_bench.py [G ...]
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

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from webgpu_raytracing_tpu.config import F32_MAX, RenderSettings
from webgpu_raytracing_tpu.models.stress import stress_scene
from webgpu_raytracing_tpu.ops import rng
from webgpu_raytracing_tpu.ops.cluster_pallas import (
    trace_closest_clustered_pallas,
)
from webgpu_raytracing_tpu.ops.raygen import camera_rays
from webgpu_raytracing_tpu.ops.ray_sort import sorted_trace

W, H = 1920, 1080
R = W * H
REPS = 3


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    scene = stress_scene(1_000_000)
    print(f"scene build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    gs = [int(g) for g in sys.argv[1:]] or [128, 64]
    for g in gs:
        t0 = time.perf_counter()
        tables = jax.device_put(scene.tables(group_size=g))
        c2 = tables.clusters.super_box.shape[0]
        print(
            f"G={g}: C2={c2} tables {time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )
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
        tmax = jnp.full((R,), F32_MAX, jnp.float32)

        # tables as an explicit jit ARG: a closed-over 1M-tri table pytree
        # gets lifted into HLO constants, and the remote-compile request
        # body blows the tunnel's size limit (measured: HTTP 413)
        @jax.jit
        def primary(o, d, tm, tb):
            return trace_closest_clustered_pallas(
                o, d, tm, tb, tile=128, exact_pairs=True
            )

        # compile + warm
        t0 = time.perf_counter()
        hit = primary(o, d, tmax, tables)
        float(jnp.sum(hit.t))
        compile_s = time.perf_counter() - t0

        # primary timing (vary t_max LSBs so the tunnel can't memoize)
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for i in range(REPS):
            h = primary(o, d, tmax * (1.0 + 1e-7 * i), tables)
            acc = acc + jnp.sum(h.t)
        float(acc)
        dtp = (time.perf_counter() - t0) / REPS
        print(
            json.dumps(
                {"label": f"stress_primary_G{g}",
                 "ms": round(1000 * dtp, 1),
                 "mrays": round(R / dtp / 1e6, 2),
                 "compile_s": round(compile_s, 1)}
            ),
            flush=True,
        )

        # bounce rays from the primary hits
        found = hit.face >= 0
        no = o + d * jnp.where(found, hit.t, 1.0)[:, None]
        btm = jnp.where(found, F32_MAX, 0.0)
        bsets = []
        st = state
        for _ in range(2):
            t2, st = rng.random_2(st)
            nd = rng.sample_cosine_weighted_hemisphere(t2, -d)
            bsets.append((no, nd, btm))

        @jax.jit
        def bounce(o_, d_, tm_, tb_):
            def tf(oo, dd, tt, tb, act):
                h = trace_closest_clustered_pallas(
                    oo, dd, tt, tb, act, tile=128, exact_pairs=False,
                    derive_uv=False,
                )
                return h.t, h.face

            return sorted_trace(tf, o_, d_, tm_, tb_, None)

        t0 = time.perf_counter()
        out = bounce(*bsets[0], tables)
        float(jnp.sum(out[0]))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for i in range(REPS):
            out = bounce(*bsets[i % 2], tables)
            acc = acc + jnp.sum(out[0])
        float(acc)
        dtb = (time.perf_counter() - t0) / REPS
        n_alive = float(jnp.sum(btm > 0))
        print(
            json.dumps(
                {"label": f"stress_bounce_G{g}",
                 "ms": round(1000 * dtb, 1),
                 "alive": int(n_alive),
                 "mrays_alive": round(n_alive / dtb / 1e6, 2),
                 "compile_s": round(compile_s, 1)}
            ),
            flush=True,
        )
        # bounce-inclusive rate over primary + one bounce wave
        tot = (R + n_alive) / (dtp + dtb)
        print(
            json.dumps(
                {"label": f"stress_total_G{g}",
                 "mrays_bounce_inclusive": round(tot / 1e6, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Round-3 on-chip sweep: the queued measurements from ROADMAP.md.

1. tiles_per_step {1,4,8,16} x trace_tile {128,256} at 1080p defaults
   (sorted bounce on, cubemap env) — full-frame Mrays/s each.
2. approx_div on/off at the best config.
3. sort_bounce_rays off at the best config (re-check at tile=128).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_r3.py
Timing per CLAUDE.md: host readback ends each timed region; seeds vary
between frames so the tunnel can't memoize.
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

from webgpu_raytracing_tpu.config import RenderSettings
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.renderer import FrameBuffers, FrameInputs, render_frame
from webgpu_raytracing_tpu.utils.image import load_cubemap

W, H = 1920, 1080
N_FRAMES = 6


def measure(settings, tables, env, label):
    buffers = FrameBuffers.create(W, H)
    view = jnp.eye(4, dtype=jnp.float32)
    t_c0 = time.perf_counter()
    for k in range(2):
        buffers, rays = render_frame(
            buffers, tables, env, FrameInputs.simple(view, k + 1, k), settings
        )
        float(rays)
    compile_s = time.perf_counter() - t_c0
    total = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for k in range(N_FRAMES):
        c = k + 2
        buffers, rays = render_frame(
            buffers, tables, env,
            FrameInputs.simple(view, 2654435761 * (c + 2) % (2**32), c),
            settings,
        )
        total = total + rays
    rays_f = float(total)
    dt = time.perf_counter() - t0
    mrays = rays_f / dt / 1e6
    rec = {
        "label": label,
        "mrays": round(mrays, 3),
        "ms_per_frame": round(1000 * dt / N_FRAMES, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return mrays


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    tables = jax.device_put(scene.tables())
    env = jnp.asarray(
        load_cubemap(
            [
                f"/root/reference/assets/{f}.jpg"
                for f in ("right", "left", "top", "bottom", "front", "back")
            ]
        )
    )
    base = RenderSettings(
        width=W, height=H, environment="cubemap", sample_count=1,
        bounces_depth=4,
    )

    results = {}
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for tile in (256, 128):
        for tps in (1, 4, 8, 16):
            label = f"tile{tile}_tps{tps}"
            if only and label not in only:
                continue
            s = base.replace(trace_tile=tile, tiles_per_step=tps)
            results[label] = measure(s, tables, env, label)

    if results:
        best = max(results, key=results.get)
        print(f"best: {best} = {results[best]:.3f}", file=sys.stderr, flush=True)
        tile = int(best.split("_")[0][4:])
        tps = int(best.split("_")[1][3:])
    else:
        tile, tps = 256, 4
    bs = base.replace(trace_tile=tile, tiles_per_step=tps)
    if not only or "nosort" in (only or []):
        measure(bs.replace(sort_bounce_rays=False), tables, env,
                f"tile{tile}_tps{tps}_nosort")
    if hasattr(bs, "approx_div") and (not only or "adiv" in (only or [])):
        measure(bs.replace(approx_div=True), tables, env,
                f"tile{tile}_tps{tps}_adiv")


if __name__ == "__main__":
    main()

"""Frame-cost decomposition on TPU: time render_frame under setting
variants whose DELTAS isolate per-piece costs (marginal bounce segment,
marginal camera sample, predictor, sort plumbing) — the trace-leg
microbenches (gang_bench/profile_legs) can't see integrator/shading/
G-buffer overheads that only exist in the full frame graph.

Timing per CLAUDE.md: on-device accumulation across frames, ONE scalar
readback ends the timed region; seeds vary per frame so the tunnel can't
memoize.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/frame_profile.py [labels...]
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
FRAMES = 6


def run(label, settings, tables, env):
    buffers = FrameBuffers.create(W, H)
    view = jnp.eye(4, dtype=jnp.float32)
    t0 = time.perf_counter()
    buffers, rays = render_frame(
        buffers, tables, env, FrameInputs.simple(view, 1, 0), settings
    )
    float(rays)
    compile_s = time.perf_counter() - t0
    total = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for k in range(FRAMES):
        buffers, rays = render_frame(
            buffers, tables, env,
            FrameInputs.simple(view, 2654435761 * (k + 2) % (2**32), k + 1),
            settings,
        )
        total = total + rays
    tot = float(total)
    dt = (time.perf_counter() - t0) / FRAMES
    print(
        json.dumps(
            {
                "label": label,
                "ms_frame": round(1000 * dt, 1),
                "mrays": round(tot / FRAMES / dt / 1e6, 2),
                "compile_s": round(compile_s, 1),
            }
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
    cases = {
        # the bench configuration
        "default": base,
        # marginal bounce segment: default minus one segment per sample
        "depth3": base.replace(bounces_depth=3),
        # primary-only paths (1 segment per sample)
        "depth2": base.replace(bounces_depth=2),
        # marginal camera sample (1 sample instead of 2)
        "sample0": base.replace(sample_count=0),
        # predictor off: t_max = inf primaries, no prev-quad pass
        "nopred": base.replace(use_hit_predictor=False),
        # unsorted bounce legs (sort plumbing + coherence win, net)
        "nosort": base.replace(sort_bounce_rays=False),
        # 3-pass matmul (the pre-fold kernel)
        "mm3": base.replace(mm_passes=3),
        # environment fetch cost: procedural sky needs no per-lane
        # texture gathers (the cubemap fetch is one deferred per-path
        # gather pass; delta = its real cost)
        "proc_env": base.replace(environment="procedural"),
        # retune arms at frame level (default is gang=8 post-fold)
        "gang4": base.replace(trace_gang=4),
        "tile256": base.replace(trace_tile=256, tiles_per_step=4),
        "tile256tps8": base.replace(trace_tile=256, tiles_per_step=8),
        "tps16": base.replace(tiles_per_step=16),
        # chained segment sorting re-check: the r3 ablation measured -4%
        # in the pairs-era kernel; with the folded/ganged trace the sort
        # legs are a larger frame fraction, so re-measure
        "chained": base.replace(chained_sort=True),
        # predictor-off + chained combination (both independent wins?)
        "nopred_chained": base.replace(
            use_hit_predictor=False, chained_sort=True
        ),
    }
    only = sys.argv[1:]
    for name, s in cases.items():
        if only and name not in only:
            continue
        run(name, s, tables, env)


if __name__ == "__main__":
    main()

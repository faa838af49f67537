"""Benchmark: Mrays/sec on one chip at 1080p on the bundled OBJ scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): 100 Mrays/sec/chip at 1080p → vs_baseline = value/100.

Ray accounting is honest wavefront accounting: every traced path segment
(primary + bounces, while the lane is alive) counts as one ray; shadow rays
count when NEE is enabled. The counter is computed on-device during the
timed run (a single scalar reduction per segment).
"""

from __future__ import annotations

import json
import time


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            "/tmp/jax_cache_webgpu_raytracing_tpu",
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from webgpu_raytracing_tpu.config import RenderSettings
    from webgpu_raytracing_tpu.models.scene import load_scene
    from webgpu_raytracing_tpu.renderer import (
        FrameBuffers,
        FrameInputs,
        render_frame,
    )

    width, height = 1920, 1080
    settings = RenderSettings(
        width=width,
        height=height,
        environment="procedural",
        sample_count=1,
        bounces_depth=4,
    )
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    tables = jax.device_put(scene.tables())
    env = jnp.zeros((1, 1, 3), jnp.float32)
    buffers = FrameBuffers.create(width, height)
    view = jnp.eye(4, dtype=jnp.float32)

    # warmup / compile (two frames: the second covers the donated-buffer
    # signature; readback forces real completion through the device tunnel)
    for k in range(2):
        buffers, rays = render_frame(
            buffers, tables, env, FrameInputs.simple(view, k + 1, k),
            settings,
        )
        float(rays)

    n_frames = 4
    total_rays = 0.0
    t0 = time.perf_counter()
    for k in range(n_frames):
        buffers, rays = render_frame(
            buffers,
            tables,
            env,
            FrameInputs.simple(view, 2654435761 * (k + 2) % (2**32), k + 1),
            settings,
        )
        total_rays += float(rays)  # forces sync per frame
    jax.block_until_ready(buffers.image)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip @1080p bundled OBJ scene",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

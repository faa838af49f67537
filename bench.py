"""Benchmark: Mrays/sec on one chip at 1080p on the bundled OBJ scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus the
second primary metric from BASELINE.md as an extra field —
"wall_clock_256spp_s", the wall-clock to accumulate 256 spp at 1080p,
derived from the steady-state per-frame time (each frame adds
1 + sample_count spp). The environment is the real cubemap texture from
the reference assets (config #2's skybox), not a procedural shortcut.

Ray accounting is honest wavefront accounting: every traced path segment
(primary + bounces, while the lane is alive) counts as one ray; shadow rays
count when NEE is enabled. The counter is computed on-device during the
timed run (a single scalar reduction per segment).
"""

from __future__ import annotations

import json
import time


def main(width: int = 1920, height: int = 1080, n_frames: int = 4):
    """Driver entry (no args). Reduced sizes are for the CPU smoke test
    (tests/test_bench.py) — same code path, tiny image."""
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

    settings = RenderSettings(
        width=width,
        height=height,
        environment="cubemap",
        sample_count=1,
        bounces_depth=4,
    )
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    tables = jax.device_put(scene.tables())
    try:
        from webgpu_raytracing_tpu.utils.image import load_cubemap

        env = jnp.asarray(
            load_cubemap(
                [
                    f"/root/reference/assets/{f}.jpg"
                    for f in ("right", "left", "top", "bottom", "front", "back")
                ]
            )
        )
    except Exception:
        settings = settings.replace(environment="procedural")
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

    total_rays_dev = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for k in range(n_frames):
        buffers, rays = render_frame(
            buffers,
            tables,
            env,
            FrameInputs.simple(view, 2654435761 * (k + 2) % (2**32), k + 1),
            settings,
        )
        # accumulate on-device: no per-frame host sync, so frame k+1's
        # dispatch pipelines behind frame k through the tunnel
        total_rays_dev = total_rays_dev + rays
    # single host readback ends the timed region (block_until_ready does
    # not block through the tunnel — see CLAUDE.md)
    total_rays = float(total_rays_dev)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    # second primary metric (BASELINE.md): wall-clock to 256 spp — each
    # frame adds (1 + sample_count) spp at the measured steady-state rate
    spp_per_frame = 1 + settings.sample_count
    secs_256 = (256 / spp_per_frame) * (dt / n_frames)
    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip @1080p bundled OBJ scene",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 4),
                "wall_clock_256spp_s": round(secs_256, 1),
                "environment": settings.environment,
            }
        )
    )


if __name__ == "__main__":
    main()

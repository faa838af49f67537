"""On-chip env-IS validation (VERDICT r3 #5 coda): the furnace
equivalence and the sun-capture check from tests/test_env.py, run on
REAL TPU hardware through the production Pallas path — the CPU suite
proves the estimator math, this proves the hardware lowering (bf16
kernel, deterministic raygen chain, env CDF inversion) preserves it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/furnace_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from webgpu_raytracing_tpu.config import ProjectionType, RenderSettings
from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import uv_sphere
from webgpu_raytracing_tpu.ops.env_sample import build_env_distribution
from webgpu_raytracing_tpu.renderer import Renderer


def furnace_scene():
    return scene_from_facesets(
        [("sphere", uv_sphere((0, 0, -4), 1.0, lat=16, lon=32))],
        np.array([[0.5, 0.5, 0.5]], np.float32),
        np.zeros((1, 3), np.float32),
    )


def mean_radiance(r):
    buf = np.asarray(r.buffers.image)
    raw = buf[..., :3] / np.maximum(buf[..., 3:], 1)
    gf = np.asarray(r.buffers.geo_face)
    return float(raw[gf >= 0].mean())


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene = furnace_scene()

    # furnace: uniform env, albedo 0.5 — IS-MIS must equal BSDF sampling
    img = np.ones((64, 128, 3), np.float32)
    dist = build_env_distribution(img)
    base = RenderSettings(
        width=24, height=24, bounces_depth=8, sample_count=3,
        environment="equirect",
        projection_type=ProjectionType.PERSPECTIVE, fov=0.6,
        use_hit_predictor=False,
    )
    out = {}
    for is_on in (False, True):
        r = Renderer(
            scene, base.replace(env_importance_sampling=is_on),
            env_data=dist if is_on else jnp.asarray(img), base_seed=11,
        )
        for _ in range(20):
            r.step()
        out[f"furnace_is_{is_on}"] = round(mean_radiance(r), 4)
    ok_furnace = all(
        abs(out[k] - 0.5) < 0.035 for k in
        ("furnace_is_False", "furnace_is_True")
    )

    # sun capture: tiny 2000-nit texel — IS must find it at low spp
    img = np.ones((32, 64, 3), np.float32) * 0.01
    img[8, 20] = 2000.0
    dist = build_env_distribution(img)
    base = base.replace(
        width=16, height=16, bounces_depth=3, sample_count=1,
    )
    means = {False: [], True: []}
    for is_on in (False, True):
        for seed in (5, 6, 7):
            r = Renderer(
                scene, base.replace(env_importance_sampling=is_on),
                env_data=dist if is_on else jnp.asarray(img),
                base_seed=seed,
            )
            for _ in range(6):
                r.step()
            means[is_on].append(mean_radiance(r))
    m_is, m_no = float(np.mean(means[True])), float(np.mean(means[False]))
    spread = float(np.std(means[True]) / max(m_is, 1e-9))
    out.update(
        sun_is=round(m_is, 4), sun_bsdf=round(m_no, 4),
        sun_spread=round(spread, 3),
    )
    out["ok"] = bool(
        ok_furnace and m_is > 3.0 * m_no and spread < 0.25
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Environment (skybox) sampling.

The reference samples an equirectangular EXR with a *non-filtering*
sampler, i.e. nearest texel (scene.ts:348-368 loads ``rgba32float``,
render.ts:1403-1404 binds an ``unfilterable-float`` texture +
``non-filtering`` sampler, sampled at render.ts:932-940). Capabilities
here:

* :func:`sample_equirect` — parity path (nearest texel, same uv mapping);
* :func:`sample_cubemap` — NEW capability for BASELINE config #2 (the six
  ``assets/*.jpg`` faces exist but the reference never loads them);
* :func:`procedural_sky` — analytic fallback when no asset is available.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import INV_PI


def equirect_uv(d: jnp.ndarray) -> jnp.ndarray:
    """sampleSkybox uv mapping (render.ts:933-936)."""
    u = (jnp.arctan2(d[..., 2], d[..., 0]) * INV_PI + 1.0) * 0.5
    v = 1.0 - jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) * INV_PI
    return jnp.stack([u, v], axis=-1)


def sample_equirect(img: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel equirect fetch; img is (H, W, 3) with v=0 at row 0
    (WebGPU texture coordinate convention: v grows downward)."""
    h, w = img.shape[0], img.shape[1]
    uv = equirect_uv(d)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    flat = jnp.take(img.reshape(-1, 3), y * w + x, axis=0)
    return flat


def sample_cubemap(faces: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Cubemap fetch; faces is (6, S, S, 3) ordered +x,-x,+y,-y,+z,-z
    (standard cubemap layout). Nearest texel."""
    s = faces.shape[1]
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # pick the major axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    # standard cubemap (s, t) per face (OpenGL convention)
    sc = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    tc = jnp.where(
        is_x,
        -y,
        jnp.where(is_y, jnp.where(y > 0, z, -z), -y),
    )
    u = (sc / ma + 1.0) * 0.5
    v = (tc / ma + 1.0) * 0.5
    xi = jnp.clip((u * s).astype(jnp.int32), 0, s - 1)
    yi = jnp.clip((v * s).astype(jnp.int32), 0, s - 1)
    flat = faces.reshape(-1, 3)
    return jnp.take(flat, (face * s + yi) * s + xi, axis=0)


def procedural_sky(d: jnp.ndarray) -> jnp.ndarray:
    """Analytic clear-sky gradient + sun disc (extension: used when no
    environment asset is present)."""
    y = d[..., 1]
    horizon = jnp.array([0.85, 0.80, 0.75], jnp.float32)
    zenith = jnp.array([0.25, 0.45, 0.85], jnp.float32)
    tt = jnp.clip(y, 0.0, 1.0)[..., None]
    sky = horizon * (1.0 - tt) + zenith * tt
    ground = jnp.array([0.22, 0.2, 0.18], jnp.float32)
    base = jnp.where(y[..., None] < 0.0, ground, sky)
    sun_dir = jnp.array([0.5773503, 0.5773503, 0.5773503], jnp.float32)
    cosang = jnp.sum(d * sun_dir, axis=-1, keepdims=True)
    sun = jnp.clip((cosang - 0.9995) / 0.0005, 0.0, 1.0) * 50.0
    return base + sun * jnp.array([1.0, 0.95, 0.9], jnp.float32)


def sample_environment(env_data, d: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Static dispatch on the environment kind (baked at trace time, like
    the reference bakes its skybox binding)."""
    if kind == "equirect":
        return sample_equirect(env_data, d)
    if kind == "cubemap":
        return sample_cubemap(env_data, d)
    if kind == "black":
        return jnp.zeros(d.shape[:-1] + (3,), jnp.float32)
    if kind == "white":
        # constant-radiance furnace environment (test harness)
        return jnp.ones(d.shape[:-1] + (3,), jnp.float32)
    return procedural_sky(d)

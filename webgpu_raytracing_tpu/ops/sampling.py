"""Screen-space bilinear samplers (reference K11, render.ts:1227-1334).

The reference fetches 4 texels at ``floor(uv)``, ``+1`` in x/y, and blends
with ``fract(uv)`` (bilinearInterpolation*, render.ts:1228-1254); its image
buffer carries a width+1 guard column so the +1 fetch never leaves the row
(render.ts:124-127). Here indices are clamped to the image bounds instead —
same values everywhere the reference is in-bounds."""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(img: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray):
    """img: (H, W, C); xi, yi: (...,) int32 clamped fetch."""
    h, w = img.shape[0], img.shape[1]
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    flat = img.reshape(h * w, -1)
    return jnp.take(flat, yi * w + xi, axis=0)


def sample_bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, C), uv: (..., 2) in pixel units. Returns (..., C).

    Matches sampleImage4/sampleGeometryAll (render.ts:1301-1334): texels at
    floor(uv) + {0,1}², mixed by fract(uv)."""
    uv_f = jnp.floor(uv)
    frac = uv - uv_f
    x0 = uv_f[..., 0].astype(jnp.int32)
    y0 = uv_f[..., 1].astype(jnp.int32)
    p00 = _gather2d(img, x0, y0)
    p10 = _gather2d(img, x0 + 1, y0)
    p01 = _gather2d(img, x0, y0 + 1)
    p11 = _gather2d(img, x0 + 1, y0 + 1)
    fx = frac[..., 0:1]
    fy = frac[..., 1:2]
    # bilinearInterpolation (render.ts:1228-1233): mix(mix(p00, p01, x),
    # mix(p10, p11, x), y) — note the reference's column order quirk
    # (p[0], p[2] first) reproduced via the same algebra.
    col_x = p00 * (1 - fx) + p01 * fx
    col_y = p10 * (1 - fx) + p11 * fx
    return col_x * (1 - fy) + col_y * fy

"""HDR environment importance sampling with multiple importance sampling.

New capability beyond the reference (BASELINE config #3: "4k HDR env
importance sampling"): the reference only ever evaluates its equirect
skybox on BSDF-sampled misses (render.ts:1183-1186). Here the environment
can additionally be *sampled* — a luminance-weighted 2-D distribution over
the equirect texels (marginal CDF over rows, conditional CDF per row),
inverted on-device with vectorized binary search — and combined with the
cosine-sampled BSDF strategy via the balance heuristic so bright suns stop
being variance bombs.

pdf bookkeeping (solid-angle measure): texel selection probability is
L·sinθ/Σ(L·sinθ) and a texel spans solid angle sinθ·2π²/(H·W), so the
sinθ factors cancel:
  p_env(texel y,x) = L(y,x) · (H·W) / (Σ(L·sinθ) · 2π²)
  p_bsdf(ω)        = max(cosθ_n, 0) / π          (cosine hemisphere)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INV_PI, PI
from . import detmath, rng
from .envmap import equirect_uv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvDistribution:
    """Sampling tables for an equirect environment (device pytree)."""

    img: jax.Array  # (H, W, 3) radiance
    row_cdf: jax.Array  # (H,) inclusive marginal CDF over rows
    cond_cdf: jax.Array  # (H, W) inclusive conditional CDF per row
    lum: jax.Array  # (H, W) luminance (pdf numerator)
    total: jax.Array  # () Σ lum·sinθ (pdf normalizer)


def build_env_distribution(img: np.ndarray) -> EnvDistribution:
    """Host-side table build from an (H, W, 3) equirect radiance map."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[0], img.shape[1]
    lum = (
        0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    ).astype(np.float64)
    lum = np.maximum(lum, 1e-12)
    # v = 1 - acos(y)/π (envmap.py): row index v·H ⇒ θ = π(1 - (y+.5)/H)
    theta = np.pi * (1.0 - (np.arange(h) + 0.5) / h)
    sin_t = np.maximum(np.sin(theta), 1e-6)
    weighted = lum * sin_t[:, None]
    row_sum = weighted.sum(axis=1)
    total = row_sum.sum()
    row_cdf = np.cumsum(row_sum) / total
    cond_cdf = np.cumsum(weighted, axis=1) / row_sum[:, None]
    return EnvDistribution(
        img=jnp.asarray(img),
        row_cdf=jnp.asarray(row_cdf.astype(np.float32)),
        cond_cdf=jnp.asarray(cond_cdf.astype(np.float32)),
        lum=jnp.asarray(lum.astype(np.float32)),
        total=jnp.asarray(np.float32(total)),
    )


def _searchsorted(cdf: jnp.ndarray, u: jnp.ndarray, axis_len: int):
    """First index with cdf[i] >= u; cdf is (..., N) row-wise inclusive."""
    lo = jnp.zeros(u.shape, jnp.int32)
    hi = jnp.full(u.shape, axis_len, jnp.int32)
    steps = int(np.ceil(np.log2(axis_len))) + 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        cm = jnp.take_along_axis(cdf, mid[..., None], axis=-1)[..., 0]
        go_right = cm < u
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.clip(lo, 0, axis_len - 1)


def sample_env(
    dist: EnvDistribution, state: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw (direction, radiance, pdf, state) per lane."""
    h, w = dist.img.shape[0], dist.img.shape[1]
    t2, state = rng.random_2(state)
    u1, u2 = t2[..., 0], t2[..., 1]

    row = _searchsorted(
        jnp.broadcast_to(dist.row_cdf, u1.shape + (h,)), u1, h
    )
    cond = jnp.take(dist.cond_cdf, row, axis=0)  # (..., W)
    col = _searchsorted(cond, u2, w)

    vq = (row.astype(jnp.float32) + 0.5) / h
    uq = (col.astype(jnp.float32) + 0.5) / w
    theta = PI * (1.0 - vq)  # inverse of v = 1 - θ/π
    phi = uq * 2.0 * PI - PI  # inverse of u = (atan2(z,x)/π + 1)/2
    sin_t = jnp.sin(theta)
    d = jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)],
        axis=-1,
    )

    lum = dist.lum[row, col]
    pdf = lum / dist.total * (h * w) / (2.0 * PI * PI)
    radiance = dist.img[row, col]
    return d, radiance, pdf, state


def env_pdf(dist: EnvDistribution, d: jnp.ndarray) -> jnp.ndarray:
    """pdf of drawing direction d from the env distribution."""
    h, w = dist.img.shape[0], dist.img.shape[1]
    uv = equirect_uv(d)
    col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    lum = dist.lum[row, col]
    return lum / dist.total * (h * w) / (2.0 * PI * PI)


def bsdf_pdf(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Cosine-hemisphere pdf around (unnormalized-tolerant) normal n."""
    nn = detmath.normalize(n)
    cos_t = jnp.sum(d * nn, axis=-1)
    return jnp.maximum(cos_t, 0.0) * INV_PI


def balance_weight(p_self: jnp.ndarray, p_other: jnp.ndarray):
    return p_self / jnp.maximum(p_self + p_other, 1e-20)

"""Tonemapping library (shaders/tonemapping.ts:1-68), vectorized."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Tonemapping


def linear_to_srgb(x):
    rgb = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        rgb < 0.0031308,
        rgb * 12.92,
        jnp.power(rgb, 1.0 / 2.4) * 1.055 - 0.055,
    )


def srgb_to_linear(x):
    rgb = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        rgb < 0.04045,
        rgb / 12.92,
        jnp.power((rgb + 0.055) / 1.055, 2.4),
    )


def aces(x):
    """Narkowicz 2015 ACES approximation.

    NOTE: the reference (tonemapping.ts:24-31) saturates only the
    *numerator*, which makes its curve non-monotone — radiance above ~0.63
    maps to progressively darker output. This implements the published
    curve (saturate the ratio) instead."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def filmic(x):
    """Hable-style filmic (filmicworlds.com)."""
    xx = jnp.maximum(0.0, x - 0.004)
    r = (xx * (6.2 * xx + 0.5)) / (xx * (6.2 * xx + 1.7) + 0.06)
    return jnp.power(r, 2.2)


def lottes(x):
    """Lottes 2016 'Advanced Techniques and Optimization of HDR Color
    Pipelines'."""
    a = 1.6
    d = 0.977
    hdr_max = 8.0
    mid_in = 0.18
    mid_out = 0.267
    b = (-(mid_in**a) + hdr_max**a * mid_out) / (
        (hdr_max ** (a * d) - mid_in ** (a * d)) * mid_out
    )
    c = (
        hdr_max ** (a * d) * mid_in**a
        - hdr_max**a * mid_in ** (a * d) * mid_out
    ) / ((hdr_max ** (a * d) - mid_in ** (a * d)) * mid_out)
    xs = jnp.maximum(x, 0.0)
    return jnp.power(xs, a) / (jnp.power(xs, a * d) * b + c)


def reinhard(x):
    return x / (1.0 + x)


def gamma(c, g):
    return jnp.power(jnp.maximum(c, 0.0), g)


def apply(x, mode: Tonemapping):
    """Tonemap dispatch (render.ts:220-232)."""
    if mode == Tonemapping.REINHARD:
        return reinhard(x)
    if mode == Tonemapping.FILMIC:
        return filmic(x)
    if mode == Tonemapping.ACES:
        return aces(x)
    if mode == Tonemapping.LOTTES:
        return lottes(x)
    return x

"""Interval math (reference K2, render.ts:315-344), vectorized.

Kept as a faithful module for parity including the reference's
``intervalOverlap`` OR-quirk (render.ts:322-323) — the traversal code uses
the corrected test (see ops/intersect.py), but the original semantics are
preserved here and unit-tested."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import EPSILON, F32_MAX, F32_MIN


class Interval(NamedTuple):
    min: jnp.ndarray
    max: jnp.ndarray


EMPTY = (F32_MAX, F32_MIN)
UNIVERSE = (F32_MIN, F32_MAX)
POSITIVE_UNIVERSE = (EPSILON, F32_MAX)


def overlap(a_min, a_max, b_min, b_max):
    """intervalOverlap — replicated verbatim including the `or` that makes
    it nearly always true (render.ts:322-323)."""
    return (a_min <= b_max) | (b_min <= a_max)


def overlap_correct(a_min, a_max, b_min, b_max):
    """The conventional AND form (what the traversal actually needs)."""
    return (a_min <= b_max) & (b_min <= a_max)


def contains(i_min, i_max, x):
    return (i_min <= x) & (x <= i_max)


def surrounds(i_min, i_max, x):
    """Strict containment — the triangle-hit interval test
    (render.ts:331-334)."""
    return (i_min < x) & (x < i_max)


def clamp(i_min, i_max, x):
    return jnp.minimum(jnp.maximum(x, i_min), i_max)

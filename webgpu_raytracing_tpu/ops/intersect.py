"""Ray–primitive intersection (vectorized over ray batches).

Möller–Trumbore on pre-stored edge vectors with backface culling, matching
the WGSL kernel (render.ts:346-410): reject when ``det < EPSILON²`` (which
culls backfaces *and* parallel rays — the reason all geometry is duplicated
two-sided at load), barycentric ``u, v`` tested against ``det`` before the
division, and a strict ``t`` interval (render.ts:401 intervalSurrounds).

AABB slab test per render.ts:412-431, with one correctness-preserving fix:
the reference's ``intervalOverlap`` (render.ts:322-323) ORs its two
conditions, so nodes entirely *behind* the ray still get visited; here the
test also requires ``far > min_dist``. This changes which nodes are
traversed, never which triangle wins — the triangle test's strict positive
interval already rejected those hits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import EPSILON, F32_MAX, MIN_DIST


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cross(a, b):
    return jnp.cross(a, b)


class TriangleHit(NamedTuple):
    hit: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,) f32
    u: jnp.ndarray  # (R,) f32
    v: jnp.ndarray  # (R,) f32


def ray_triangle(
    o: jnp.ndarray,  # (R, 3) ray origin
    d: jnp.ndarray,  # (R, 3) ray direction
    p0: jnp.ndarray,  # (R, 3) triangle base vertex
    e1: jnp.ndarray,  # (R, 3) edge 1
    e2: jnp.ndarray,  # (R, 3) edge 2
    t_min: jnp.ndarray | float,
    t_max: jnp.ndarray | float,
) -> TriangleHit:
    """Möller–Trumbore with backface culling (render.ts:359-409).

    Strict (contraction-proof) arithmetic throughout — see
    ops/strictf.py: FMA fusion under jit flips 1-ulp knife-edge
    decisions relative to the scalar WGSL-semantics reference."""
    from .strictf import scross, sdot3

    h = scross(d, e2)
    det = sdot3(e1, h)
    s = o - p0
    u = sdot3(s, h)
    q = scross(s, e1)
    v = sdot3(d, q)
    t = sdot3(e2, q)

    culled = det < EPSILON * EPSILON
    bary_ok = (u >= 0.0) & (u <= det) & (v >= 0.0) & (u + v <= det)
    # true division per component — the WGSL divides vec3f(t, u, v)/det
    # (render.ts:406-408); a reciprocal-multiply rounds twice and can
    # differ by 1 ulp, flipping strict intervalSurrounds knife edges
    det_safe = jnp.where(culled, 1.0, det)
    tt = t / det_safe
    uu = u / det_safe
    vv = v / det_safe
    inside = (tt > t_min) & (tt < t_max)  # strict (intervalSurrounds)
    hit = (~culled) & bary_ok & inside
    return TriangleHit(
        hit=hit,
        t=jnp.where(hit, tt, F32_MAX),
        u=jnp.where(hit, uu, 0.0),
        v=jnp.where(hit, vv, 0.0),
    )


def ray_aabb(
    o: jnp.ndarray,  # (R, 3)
    inv_d: jnp.ndarray,  # (R, 3) precomputed 1/d (inf on zero components)
    bmin: jnp.ndarray,  # (R, 3)
    bmax: jnp.ndarray,  # (R, 3)
    t_max: jnp.ndarray,  # (R,) current best hit distance
):
    """Branchless slab test (render.ts:419-430). Returns (hit, near)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    hit = (near < far) & (near < t_max) & (far > MIN_DIST)
    return hit, near


def safe_inv_dir(d):
    """NaN-safe direction reciprocal for slab tests: exact-zero components
    (e.g. axis-aligned camera rays at the image center row/column) would
    give inf * 0 = NaN in ``(bmin - o) * inv_d``; substituting a huge
    finite value keeps the axis test meaningful (inside the slab → no
    constraint, outside → certain miss)."""
    import jax.numpy as jnp

    tiny = 1e-12
    big = 1e30
    return jnp.where(
        jnp.abs(d) < tiny,
        jnp.where(d >= 0, big, -big),
        1.0 / jnp.where(jnp.abs(d) < tiny, 1.0, d),
    )

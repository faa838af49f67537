"""Ray reordering for traversal coherence.

Bounce rays are incoherent in pixel order: a 128-ray tile's rays
collectively hit ~60-100 clusters while each ray only needs ~2 (measured,
ROADMAP.md). Sorting rays by their *nearest hit cluster* groups rays that
start their traversal in the same treelet — and because treelets are
spatially local, their 2nd/3rd clusters correlate too, collapsing tile
unions toward per-ray needs.

The key is computed with the same dense box-test pass the tracer already
uses (argmin instead of per-tile min); the permutation is one
``jnp.argsort`` over R int32 keys plus row gathers, and results are
scattered back to ray order — all standard XLA ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import F32_MAX, MIN_DIST
from .intersect import safe_inv_dir
from .traverse import Hit

_INF = float(F32_MAX)


def nearest_cluster_key(
    o: jnp.ndarray,  # (R, 3)
    d: jnp.ndarray,  # (R, 3)
    t_max: jnp.ndarray,  # (R,)
    boxes: jnp.ndarray,  # (C, 6)
    chunk: int = 65536,
) -> jnp.ndarray:
    """Per-ray id of the nearest-entry hit cluster; C when nothing is hit
    (sorts dead/miss rays to the back)."""
    r = o.shape[0]
    c = boxes.shape[0]
    chunk = min(chunk, max(128, -(-r // 128) * 128))
    inv_d = safe_inv_dir(d)

    def per_chunk(args):
        oc, ic, tc = args
        # per-axis accumulation keeps temporaries 2-D (chunk, C); a
        # (chunk, C, 3) broadcast de-fuses into multi-GB HBM traffic
        near = jnp.full((oc.shape[0], c), -_INF, jnp.float32)
        far = jnp.full((oc.shape[0], c), _INF, jnp.float32)
        for ax in range(3):
            t0 = (boxes[None, :, ax] - oc[:, ax : ax + 1]) * ic[:, ax : ax + 1]
            t1 = (
                boxes[None, :, 3 + ax] - oc[:, ax : ax + 1]
            ) * ic[:, ax : ax + 1]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = (near < far) & (near < tc[:, None]) & (far > MIN_DIST)
        nears = jnp.where(hit, jnp.maximum(near, 0.0), _INF)
        best = jnp.min(nears, axis=1)
        key = jnp.argmin(nears, axis=1).astype(jnp.int32)
        return jnp.where(best < _INF, key, c)

    pad = (-r) % chunk
    if pad:
        o = jnp.concatenate([o, jnp.ones((pad, 3), o.dtype)])
        inv_d = jnp.concatenate([inv_d, jnp.ones((pad, 3), o.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    n_chunks = (r + pad) // chunk
    keys = jax.lax.map(
        per_chunk,
        (
            o.reshape(n_chunks, chunk, 3),
            inv_d.reshape(n_chunks, chunk, 3),
            t_max.reshape(n_chunks, chunk),
        ),
    ).reshape(-1)[:r]
    return keys


def sorted_trace(trace_fn, o, d, t_max, tables, active=None):
    """Run ``trace_fn(o, d, t_max, tables, active)`` with rays permuted by
    nearest-cluster key; results are returned in original ray order."""
    r = o.shape[0]
    if active is None:
        active = jnp.ones((r,), bool)
    key = nearest_cluster_key(
        o, d, jnp.where(active, t_max, 0.0), tables.clusters.box
    )
    order = jnp.argsort(key)
    hit_s: Hit = trace_fn(
        jnp.take(o, order, axis=0),
        jnp.take(d, order, axis=0),
        jnp.take(t_max, order),
        tables,
        jnp.take(active, order),
    )
    inv = jnp.zeros((r,), jnp.int32).at[order].set(
        jnp.arange(r, dtype=jnp.int32)
    )
    return Hit(
        t=jnp.take(hit_s.t, inv),
        u=jnp.take(hit_s.u, inv),
        v=jnp.take(hit_s.v, inv),
        face=jnp.take(hit_s.face, inv),
    )

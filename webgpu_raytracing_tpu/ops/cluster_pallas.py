"""Pallas TPU kernel for clustered tracing.

The XLA-level clustered tracer (ops/cluster_trace.py) pays per round for a
cluster-matrix gather from HBM, a materialized (R, 4S) matmul output, and
a dispatch. This kernel removes all three: the whole cluster table lives
in VMEM (bundled scene: ~10 MB), each grid step owns one ray tile, and the
near-ordered cluster rounds run as an in-kernel ``while`` — each round is
one ``(T, 16) @ (16, 4S)`` MXU matmul plus a VPU epilogue, entirely
on-chip. Each tile runs exactly its own number of rounds (no cross-tile
max), the per-tile cluster shortlist (box tests) is also computed
in-kernel in ray chunks, and the only HBM traffic is streaming ray blocks
in and per-ray hit records out.

Layout notes:
* the ray matrix is padded to 16 columns [o | w=o×d | d | 1 | inv_d | t_max
  | pad] so one streamed block carries everything;
* mat_b is (C, 16, 4S) f32 — dynamic indexing on the *leading* dim of a
  VMEM ref is the supported Mosaic pattern;
* boxes are stored transposed (8, C) so slab tests broadcast along lanes;
* per-tile state vectors are (1, C)/(1, T) rows updated with masked
  ``where`` (no dynamic-lane scatters);
* the matmul runs at Precision.HIGHEST — intersection decisions compare
  u/v against det and need full f32 mantissas (bf16 passes flip ~17% of
  faces on the bundled scene).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPSILON, F32_MAX, MIN_DIST
from .cluster_trace import ClusterTables
from .intersect import safe_inv_dir
from .traverse import Hit

_EPS2 = EPSILON * EPSILON
_INF = float(F32_MAX)
_NEAR_CHUNK = 128  # rays per in-kernel box-test chunk (bounds VMEM temps)


def _kernel(
    a_ref,  # (1, T, 16) ray block: [o, w, d, 1, inv_d, t_max, pad, pad]
    near_ref,  # (1, 1, C) per-cluster tile entry distances (XLA-computed)
    matb_ref,  # (C, 16, 4S) cluster matrices (VMEM resident)
    face_ref,  # (C, S) global face ids (VMEM resident)
    out_t_ref,  # (1, 1, T)
    out_u_ref,
    out_v_ref,
    out_f_ref,  # int32
    *,
    n_s: int,
):
    a = a_ref[0]  # (T, 16)
    t_dim = a.shape[0]
    near0 = near_ref[0]  # (1, C)
    c_dim = near0.shape[1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c_dim), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (t_dim, n_s), 1)
    t_max = a[:, 13]  # (T,)

    # ---- near-ordered cluster rounds ----
    def cond(state):
        near, best_t, *_ = state
        return jnp.min(near) < jnp.max(best_t)

    def body(state):
        near, best_t, best_u, best_v, best_f = state
        cmin = jnp.min(near)
        cid = jnp.min(jnp.where(near == cmin, iota_c, c_dim))

        b = matb_ref[cid]  # (16, 4S)
        out = jnp.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        det = out[:, 0 * n_s : 1 * n_s]
        t_num = out[:, 1 * n_s : 2 * n_s]
        u_num = out[:, 2 * n_s : 3 * n_s]
        v_num = out[:, 3 * n_s : 4 * n_s]

        valid = (
            (det >= _EPS2)
            & (u_num >= 0.0)
            & (u_num <= det)
            & (v_num >= 0.0)
            & (u_num + v_num <= det)
        )
        inv_det = 1.0 / jnp.where(valid, det, 1.0)
        t = t_num * inv_det
        valid = valid & (t > MIN_DIST) & (t < best_t[0][:, None])

        t_masked = jnp.where(valid, t, _INF)
        cand_t = jnp.min(t_masked, axis=1)  # (T,)
        # first index achieving the min (min+iota instead of argmin — the
        # reliably-lowered reduction pattern)
        slot = jnp.min(
            jnp.where(t_masked == cand_t[:, None], iota_s, n_s), axis=1
        )
        sel = iota_s == slot[:, None]  # (T, S)
        cand_u = jnp.sum(jnp.where(sel, u_num * inv_det, 0.0), axis=1)
        cand_v = jnp.sum(jnp.where(sel, v_num * inv_det, 0.0), axis=1)
        frow = face_ref[cid]  # (S,) int32
        cand_f = jnp.sum(
            jnp.where(sel, frow[None, :], 0), axis=1
        ).astype(jnp.int32)

        improved = cand_t < best_t[0]
        best_t = jnp.where(improved, cand_t, best_t[0])[None, :]
        best_u = jnp.where(improved, cand_u, best_u[0])[None, :]
        best_v = jnp.where(improved, cand_v, best_v[0])[None, :]
        best_f = jnp.where(improved, cand_f, best_f[0])[None, :]
        near = jnp.where(iota_c == cid, _INF, near)
        return near, best_t, best_u, best_v, best_f

    init = (
        near0,
        t_max[None, :],
        jnp.zeros((1, t_dim), jnp.float32),
        jnp.zeros((1, t_dim), jnp.float32),
        jnp.full((1, t_dim), -1, jnp.int32),
    )
    _, best_t, best_u, best_v, best_f = jax.lax.while_loop(cond, body, init)
    out_t_ref[0] = best_t
    out_u_ref[0] = best_u
    out_v_ref[0] = best_v
    out_f_ref[0] = best_f


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def trace_closest_clustered_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    tables,
    active: jnp.ndarray | None = None,
    tile: int = 512,
    interpret: bool = False,
) -> Hit:
    """Drop-in closest-hit using the Pallas tile kernel."""
    ct: ClusterTables = tables.clusters
    r0 = o.shape[0]
    if active is None:
        active = jnp.ones((r0,), bool)
    if r0 % tile:
        pad = tile - r0 % tile
        o = jnp.concatenate([o, jnp.ones((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
    r = o.shape[0]
    n_tiles = r // tile
    t_max = jnp.where(active, t_max, 0.0)

    c = ct.n_clusters
    s = ct.face_id.shape[1]
    # only the near-vector lane dim needs 128-padding; the cluster table
    # keeps its true C (padded nears are +inf, so cid never lands there)
    cp = max(128, -(-c // 128) * 128)
    matb = ct.mat_b
    if matb.shape[1] != 16:
        matb = jnp.pad(matb, ((0, 0), (0, 16 - matb.shape[1]), (0, 0)))
    face_id = ct.face_id

    w = jnp.cross(o, d)
    ones = jnp.ones((r, 1), jnp.float32)
    inv_d = safe_inv_dir(d)
    zeros = jnp.zeros((r, 2), jnp.float32)
    a_mat = jnp.concatenate(
        [o, w, d, ones, inv_d, t_max[:, None], zeros], axis=-1
    ).reshape(n_tiles, tile, 16)

    from .cluster_trace import _boxes_near

    def tile_nears(args):
        ot, it, tt = args
        near = jnp.min(_boxes_near(ot, it, ct.box, tt), axis=0)  # (C,)
        return jnp.pad(near, (0, cp - c), constant_values=F32_MAX)

    near_tc = jax.lax.map(
        tile_nears,
        (
            o.reshape(n_tiles, tile, 3),
            inv_d.reshape(n_tiles, tile, 3),
            t_max.reshape(n_tiles, tile),
        ),
        batch_size=max(1, min(n_tiles, 2_000_000 // (tile * cp))),
    )

    grid = (n_tiles,)
    kernel = functools.partial(_kernel, n_s=s)
    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
    )
    row_spec = pl.BlockSpec(
        (1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    best_t, best_u, best_v, best_f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cp, 16, 4 * s), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((cp, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(a_mat, near_tc.reshape(n_tiles, 1, cp), matb, face_id)

    return Hit(
        t=best_t.reshape(r)[:r0],
        u=best_u.reshape(r)[:r0],
        v=best_v.reshape(r)[:r0],
        face=best_f.reshape(r)[:r0],
    )

"""CPU study: two-level (supercluster) kernel work for the BUNDLED scene.

The r4 conclusion (ROADMAP): every round-SCHEDULING scheme lands on the
same ~150 ms/leg wall, and the r5 on-chip multipass arms measured the
work-volume recompaction as a wash (mp4 9.01 vs default 9.07 Mrays/s) —
the XLA plumbing costs what the capped passes save. What remains is the
two-level layout: per-ray/per-tile O(R*C) XLA passes shrink to O(R*C2)
over supers, and the child-box expansion moves IN-kernel (VPU slab tests
against a VMEM-resident (C2, 8, G) table) where it costs ~nothing.

This sim answers, for real bounce rays on the bundled scene: at each
(S, G, T), how many SUPER drain rounds a tile pays (serial machinery),
how many CHILD matmuls it pays (the MXU/VPU work volume), and the
epilogue elems/ray — comparable to the production figure 12.05 rounds *
4S = 6169 elems/ray at S=128/T=128 (tools/lockstep_sim work table, r4).

"needed" uses the exact post-hoc oracle (near <= ray's closest-hit t);
"tested" models the tile-consensus: a child is matmul'd if ANY ray in
the tile needs its super (union) AND any ray hits the child box with
near <= that ray's closest t. This underestimates the prune-bound lag
(~+3 rounds at the cluster level in production) uniformly across
configs, so RELATIVE numbers are the signal.

Usage: python tools/twolevel_sim.py
"""
import os, sys
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_webgpu_raytracing_tpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from webgpu_raytracing_tpu.config import RenderSettings, F32_MAX, MIN_DIST
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.ops.raygen import camera_rays
from webgpu_raytracing_tpu.ops import rng
from webgpu_raytracing_tpu.ops.cluster_trace import trace_closest_clustered
from webgpu_raytracing_tpu.ops.intersect import safe_inv_dir
from webgpu_raytracing_tpu.ops.ray_sort import nearest_cluster_key

W, H = 512, 384
R = W * H
settings = RenderSettings(width=W, height=H)
scene = load_scene(
    "/root/reference/assets/raytraced-scene.obj",
    "/root/reference/assets/raytraced-scene.mtl",
)


def make_bounce_rays(tables):
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.int32), jnp.arange(W, dtype=jnp.int32),
        indexing="ij",
    )
    idx = (xs + ys * W).reshape(R)
    base_pos = jnp.stack([xs, ys], axis=-1).reshape(R, 2).astype(jnp.float32)
    view = jnp.eye(4, dtype=jnp.float32)
    state = rng.seed_state(jnp.broadcast_to(jnp.uint32(1), (R,)), idx)
    o, d, state = camera_rays(base_pos, view, state, settings)
    tmax = jnp.full((R,), F32_MAX, jnp.float32)
    hit = trace_closest_clustered(o, d, tmax, tables, None, tile=256)
    t2, state = rng.random_2(state)
    nd = rng.sample_cosine_weighted_hemisphere(t2, -d)
    found = np.asarray(hit.face) >= 0
    no = np.asarray(o) + np.asarray(d) * np.where(
        found, np.asarray(hit.t), 1.0
    )[:, None]
    nd = np.asarray(nd)
    btmax = np.where(found, F32_MAX, 0.0).astype(np.float32)
    bhit = trace_closest_clustered(
        jnp.asarray(no), jnp.asarray(nd), jnp.asarray(btmax), tables, None,
        tile=256,
    )
    bt = np.asarray(bhit.t)
    bt = np.where(
        np.asarray(bhit.face) >= 0, bt, np.where(found, F32_MAX, 0.0)
    )
    return no, nd, btmax, bt


def nears_of(o_, inv_, tm_, bx):
    """Per-(ray, box) entry distances; inf = not needed. Pad boxes are
    inverted-empty (min > max) — masked out explicitly (the f32 slab
    math on their +-F32_MAX extents overflows in numpy)."""
    n = bx.shape[0]
    valid = (bx[:, 0] <= bx[:, 3]).astype(bool)  # (n,)
    near = np.full((o_.shape[0], n), -np.inf, np.float64)
    far = np.full((o_.shape[0], n), np.inf, np.float64)
    bx64 = bx.astype(np.float64)
    for ax in range(3):
        t0 = (bx64[None, :, ax] - o_[:, ax : ax + 1]) * inv_[:, ax : ax + 1]
        t1 = (
            bx64[None, :, 3 + ax] - o_[:, ax : ax + 1]
        ) * inv_[:, ax : ax + 1]
        near = np.maximum(near, np.minimum(t0, t1))
        far = np.minimum(far, np.maximum(t0, t1))
    hitb = (
        (near < far) & (near < tm_[:, None]) & (far > MIN_DIST)
        & valid[None, :]
    )
    return np.where(hitb, np.maximum(near, 0.0), np.inf).astype(np.float32)


def study(cluster_size, group, tile):
    tables = scene.tables(cluster_size=cluster_size, group_size=group)
    ct = tables.clusters
    cboxes = np.asarray(ct.box)
    sboxes = np.asarray(ct.super_box) if ct.super_box is not None else cboxes
    C, C2 = cboxes.shape[0], sboxes.shape[0]
    no, nd, btmax, bt = make_bounce_rays(tables)
    # sort rays exactly the way production does (nearest super/cluster key)
    key = np.asarray(
        nearest_cluster_key(
            jnp.asarray(no), jnp.asarray(nd), jnp.asarray(btmax),
            jnp.asarray(sboxes),
        )
    )
    order = np.argsort(key, kind="stable")
    no_, nd_, btm_, bt_ = no[order], nd[order], btmax[order], bt[order]
    inv = np.asarray(safe_inv_dir(jnp.asarray(nd_)))

    sup_rounds, child_mms, need_children = [], [], []
    for i in range(0, R, tile):
        sl = slice(i, i + tile)
        snr = nears_of(no_[sl], inv[sl], btm_[sl], sboxes)  # (T, C2)
        cnr = nears_of(no_[sl], inv[sl], btm_[sl], cboxes)  # (T, C)
        need_c = cnr <= bt_[sl][:, None]  # exact per-ray needed children
        need_children.append(need_c.sum(axis=1))
        need_s = snr <= bt_[sl][:, None]  # needed supers per ray
        s_union = need_s.any(axis=0)  # tile's super drain rounds
        sup_rounds.append(int(s_union.sum()))
        # children matmul'd: super in tile union AND child box hit by any
        # ray with near <= that ray's closest t
        cu = need_c.any(axis=0)
        if ct.super_box is not None:
            g = ct.group
            cu = cu & np.repeat(s_union, g)[: C]
        child_mms.append(int(cu.sum()))
    sup_rounds = np.array(sup_rounds)
    child_mms = np.array(child_mms)
    needc = np.concatenate(need_children)
    elems_ray = child_mms.mean() * 4 * cluster_size
    print(
        f"S={cluster_size:4d} G={group:3d} T={tile:3d}  C={C:5d} C2={C2:4d}"
        f"  sup_rounds/tile mean={sup_rounds.mean():6.2f} p95="
        f"{np.percentile(sup_rounds, 95):5.1f}"
        f"  child_mms/tile mean={child_mms.mean():6.2f} p95="
        f"{np.percentile(child_mms, 95):6.1f}"
        f"  need_child/ray={needc.mean():5.2f}"
        f"  elems/ray={elems_ray:7.0f}",
        flush=True,
    )


if __name__ == "__main__":
    # production baseline: single-level S=128 T=128 (elems/ray 6169 at
    # rounds=12.05; this sim's "tested" proxy lands lower — compare rows
    # to each other, against the S=128 G=0 row)
    study(128, 0, 128)
    for s_, g_ in ((128, 8), (128, 16), (64, 16), (64, 32), (32, 32), (32, 64), (32, 16)):
        study(s_, g_, 128)
    study(32, 32, 32)
    study(64, 16, 64)

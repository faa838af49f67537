"""CPU simulation of lockstep-tile-batching round counts.

The lockstep kernel (ops/cluster_pallas._kernel_lockstep) runs the L
tiles of a grid step in one fused round loop, so a step's serial round
count is max(rounds_l) instead of sum(rounds_l). This sims the exact
per-tile round dynamics (same model as rounds_sim.py) and reports total
SERIAL rounds for the production configurations, to pick L / gang / the
heavy split before burning TPU compile time on arms that can't win.

Usage: python tools/lockstep_sim.py   (CPU; ~2 min)
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
TILE = 128
settings = RenderSettings(width=W, height=H)
scene = load_scene(
    "/root/reference/assets/raytraced-scene.obj",
    "/root/reference/assets/raytraced-scene.mtl",
)
tables = scene.tables()
boxes = np.asarray(tables.clusters.box)
C = boxes.shape[0]
fid = np.asarray(tables.clusters.face_id)
n_faces = int(fid.max()) + 1
face2cl = np.full(n_faces, -1, np.int32)
for c in range(C):
    sel = fid[c] >= 0
    face2cl[fid[c][sel]] = c

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
nd = np.asarray(rng.sample_cosine_weighted_hemisphere(t2, -d))
found = np.asarray(hit.face) >= 0
no = np.asarray(o) + np.asarray(d) * np.where(
    found, np.asarray(hit.t), 1.0
)[:, None]
btm = np.where(found, F32_MAX, 0.0).astype(np.float32)
bh = trace_closest_clustered(
    jnp.asarray(no), jnp.asarray(nd), jnp.asarray(btm), tables, None,
    tile=256,
)
bface = np.asarray(bh.face)
bt = np.where(bface >= 0, np.asarray(bh.t), btm)
bwc = np.where(bface >= 0, face2cl[np.maximum(bface, 0)], -1)
inv = np.asarray(safe_inv_dir(jnp.asarray(nd)))
key = np.asarray(
    nearest_cluster_key(
        jnp.asarray(no), jnp.asarray(nd), jnp.asarray(btm),
        jnp.asarray(tables.clusters.sort_box),
    )
)
order = np.argsort(key, kind="stable")


def ray_nears(o_, inv_, tm_):
    near = np.full((o_.shape[0], C), -np.float32(np.inf), np.float32)
    far = np.full((o_.shape[0], C), np.float32(np.inf), np.float32)
    with np.errstate(over="ignore", invalid="ignore"):
        for ax in range(3):
            t0 = (boxes[None, :, ax] - o_[:, ax : ax + 1]) * inv_[
                :, ax : ax + 1
            ]
            t1 = (boxes[None, :, 3 + ax] - o_[:, ax : ax + 1]) * inv_[
                :, ax : ax + 1
            ]
            near = np.maximum(near, np.minimum(t0, t1))
            far = np.minimum(far, np.maximum(t0, t1))
    h = (near < far) & (near < tm_[:, None]) & (far > MIN_DIST)
    return np.where(h, np.maximum(near, 0.0), np.float32(np.inf))


# exact per-tile serial rounds at gang=K (ceil division happens on the
# DRAIN, not on the final count: the prune re-checks between rounds)
def tile_rounds(sel, gangk):
    nr = ray_nears(no[sel], inv[sel], btm[sel])
    tile_near = nr.min(axis=0)
    union = int((tile_near < np.float32(np.inf)).sum())
    cl_order = np.argsort(tile_near, kind="stable")
    cl_order = cl_order[tile_near[cl_order] < np.float32(np.inf)]
    best = btm[sel].copy()
    bound = best.max()
    rounds = 0
    i = 0
    while i < len(cl_order):
        if not (tile_near[cl_order[i]] < bound):
            break
        rounds += 1
        take = 0
        while take < gangk and i < len(cl_order) and (
            tile_near[cl_order[i]] < bound
        ):
            c = cl_order[i]
            wins = bwc[sel] == c
            best = np.where(wins, bt[sel], best)
            i += 1
            take += 1
        bound = best.max()
    return rounds, union


n_tiles = R // TILE
print(f"{n_tiles} tiles of {TILE}; clusters {C}")

# per-tile rounds at the gangs of interest
r1, r2, r8, unions = [], [], [], []
for i in range(0, R, TILE):
    sel = order[i : i + TILE]
    a, u = tile_rounds(sel, 1)
    b, _ = tile_rounds(sel, 2)
    c8, _ = tile_rounds(sel, 8)
    r1.append(a); r2.append(b); r8.append(c8); unions.append(u)
r1, r2, r8 = np.array(r1), np.array(r2), np.array(r8)
unions = np.array(unions)

heavy_order = np.argsort(-unions, kind="stable")


def groups_max(vals, L):
    pad = (-len(vals)) % L
    v = np.concatenate([vals, np.zeros(pad, vals.dtype)])
    return v.reshape(-1, L).max(axis=1).sum()


def report(label, serial):
    print(f"{label:42s} serial rounds {serial:7.0f}")


# current production: heavy 1/8 (union-sorted) gang=8 serial, light serial
nh = n_tiles // 8
hsel, lsel = heavy_order[:nh], heavy_order[nh:]
report("serial gang off (all tiles)", r1.sum())
report("serial prod (heavy/8 gang=8 + light)", r8[hsel].sum() + r1[lsel].sum())
for L in (4, 8, 16):
    report(
        f"lockstep L={L} heavy gang=2 + light g1",
        groups_max(r2[hsel], L) + groups_max(r1[lsel], L),
    )
    report(
        f"lockstep L={L} all gang=1 (union-sorted)",
        groups_max(r1[heavy_order], L),
    )
    report(
        f"lockstep L={L} all gang=2 (union-sorted)",
        groups_max(r2[heavy_order], L),
    )
    # unsorted grouping (ray-sort order only): the any_hit path today
    report(
        f"lockstep L={L} all gang=1 (ray order)", groups_max(r1, L)
    )

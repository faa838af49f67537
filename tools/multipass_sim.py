"""Exact CPU simulation of a CAPPED-ROUNDS + RECOMPACTION bounce trace:
pass 1 runs every tile for at most M near-ordered rounds; surviving rays
(next unprocessed cluster still beats their best) are re-sorted by their
NEXT needed cluster and traced again, repeating until drained (final
pass uncapped, gang-compressed like production's heavy tail).

Today's kernel spends rounds by TILE CONSENSUS: epilogue work/ray =
tile_rounds x 4S (12.05 at T=128) while the per-ray need is only 1.34
clusters — a ~9x waste multiplier that neither lockstep nor small tiles
could recover (ROADMAP r4: small tiles lose on per-round fixed costs).
Recompaction attacks the waste directly: after M rounds the stragglers
regroup by where they actually need to go next, so later passes' tiles
are need-aligned instead of dragged by the pass-1 grouping.

Outputs per (tile, cap, gang): per-pass ray/tile/round counts, total
serial rounds and epilogue work vs the production single-pass gang
scheme, so the wall-clock model (rounds x fixed + work x VPU rate +
per-pass plumbing on the surviving ray count) can be evaluated with the
WRT_ABLATE-measured cost splits.
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

W, H = 512, 384
R = W * H
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

# per-ray cluster nears, dense (R, C) — chunked
NEARS = np.empty((R, C), np.float32)
for i in range(0, R, 65536):
    sl = slice(i, min(i + 65536, R))
    near = np.full((sl.stop - sl.start, C), -np.float32(np.inf), np.float32)
    far = np.full_like(near, np.float32(np.inf))
    with np.errstate(over="ignore", invalid="ignore"):
        for ax in range(3):
            t0 = (boxes[None, :, ax] - no[sl, ax:ax+1]) * inv[sl, ax:ax+1]
            t1 = (boxes[None, :, 3+ax] - no[sl, ax:ax+1]) * inv[sl, ax:ax+1]
            near = np.maximum(near, np.minimum(t0, t1))
            far = np.minimum(far, np.maximum(t0, t1))
    h = (near < far) & (near < btm[sl, None]) & (far > MIN_DIST)
    NEARS[sl] = np.where(h, np.maximum(near, 0.0), np.float32(np.inf))
INF = np.float32(np.inf)


def run_pass(ray_ids, seen, best, tile, cap, gang_tail):
    """One capped pass over ray_ids (sorted by caller). Returns
    (serial_rounds, work_tiles_x_rounds, survivors). `seen` is the
    per-ray set of already-processed clusters (bool R x C)."""
    serial = 0
    work_rounds = 0  # in units of tile-rounds (epilogue elems = x T x 4S)
    survivors = []
    for i in range(0, len(ray_ids), tile):
        sel = ray_ids[i:i + tile]
        nr = np.where(seen[sel], INF, NEARS[sel])
        tile_near = nr.min(axis=0)
        cl_order = np.argsort(tile_near, kind="stable")
        bsel = best[sel].copy()
        bound = bsel.max()
        rounds = 0
        for c in cl_order:
            nc = tile_near[c]
            if not (nc < bound) or (cap and rounds >= cap):
                break
            rounds += 1
            wins = bwc[sel] == c
            bsel = np.where(wins & (bt[sel] < bsel), bt[sel], bsel)
            seen[sel, c] = True
            bound = bsel.max()
        # gang compression only helps tiles past the cap-free tail
        # (production gangs the heavy 1/8; approximate: rounds > 8)
        if rounds > 8 and gang_tail > 1 and not (cap and rounds >= cap):
            serial += -(-rounds // gang_tail)
        else:
            serial += rounds
        work_rounds += rounds
        best[sel] = bsel
        # survivor: any unseen cluster with near < this ray's best
        pend = np.where(seen[sel], INF, NEARS[sel]).min(axis=1) < bsel
        survivors.extend(sel[pend])
    return serial, work_rounds, np.array(survivors, np.int64)


def simulate(tile, cap, gang_tail=8, max_passes=4):
    seen = np.zeros((R, C), bool)
    best = btm.copy()
    # pass-1 order: production's nearest-cluster sort (approximate with
    # per-ray two nearest unseen clusters, same signal)
    def sort_key(ids):
        nr = np.where(seen[ids], INF, NEARS[ids])
        k1 = nr.argmin(axis=1)
        v1 = nr[np.arange(len(ids)), k1]
        nr2 = nr.copy()
        nr2[np.arange(len(ids)), k1] = INF
        k2 = nr2.argmin(axis=1)
        c1 = np.where(np.isfinite(v1), k1, C)
        c2 = np.where(np.isfinite(nr2[np.arange(len(ids)), k2]), k2, C)
        return c1 * (C + 1) + c2

    ids = np.arange(R, dtype=np.int64)
    ids = ids[np.argsort(sort_key(ids), kind="stable")]
    tot_serial = tot_work = 0
    stats = []
    for p in range(max_passes):
        last = p == max_passes - 1
        serial, work, surv = run_pass(
            ids, seen, best, tile, 0 if last else cap, gang_tail
        )
        tot_serial += serial
        tot_work += work
        stats.append((len(ids), -(-len(ids) // tile), serial, work))
        if len(surv) == 0:
            break
        ids = surv[np.argsort(sort_key(surv), kind="stable")]
    ok = np.array_equal(best, np.maximum(bt, 0))  # all rays resolved
    per_pass = " | ".join(
        f"p{k}: R={r} tiles={t} serial={s} work={w}"
        for k, (r, t, s, w) in enumerate(stats)
    )
    print(
        f"tile={tile} cap={cap} gang_tail={gang_tail}: "
        f"total serial={tot_serial} work_tile_rounds={tot_work} "
        f"work/ray(x4S)={tot_work * tile / R:.2f}\n   {per_pass}",
        flush=True,
    )
    return tot_serial, tot_work


if __name__ == "__main__":
    # production baseline: single pass, no cap, gang on heavy tail
    simulate(128, cap=0, gang_tail=8, max_passes=1)
    for cap in (1, 2, 4, 8):
        simulate(128, cap=cap, gang_tail=8)
    simulate(256, cap=2, gang_tail=8)
    simulate(256, cap=4, gang_tail=8)

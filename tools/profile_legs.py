"""Piece-by-piece on-chip timing of the sorted bounce-trace leg.

The round-3 question: post-gang, the kernel rounds shrank — what is the
sort-leg overhead NOW, piece by piece, and which replacement wins?

Pieces timed at 1080p ray count (2.07M), both full-alive and half-alive
(real frames run bounce segments at ~30-60% aliveness, and the O(R)
permutation legs do NOT shrink with aliveness):

  key        nearest_cluster_key (dense box test + packed top-2 reduce)
  okey       origin-cluster key variant (no box test: cluster id of the
             origin face + direction octant) -- candidate replacement
  sort       lax.sort (key, rid)
  sortpay8   lax.sort key + 8 i32 payload columns (carries the whole ray
             row through the sort network -- would delete gather+scatter)
  gather7/16 one packed (R, k) row gather (the permutation legs)
  scatter4   one packed (R, 4) scatter (the raw_pair unsort)
  near       the tile-nears pass alone (on sorted rays)
  kernel     the Pallas kernel alone on pre-sorted rays (pairs, gang=4)
  kernel_ok  kernel on okey-sorted rays (grouping-quality probe)
  kernel_st  kernel on stale-permutation rays (segment-2 reuse probe)
  adjud      adjudicate_candidates alone
  leg        the full production sorted leg (cross-check vs sum of parts)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_legs.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from webgpu_raytracing_tpu.config import F32_MAX, RenderSettings
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.ops import rng
from webgpu_raytracing_tpu.ops.cluster_pallas import (
    adjudicate_candidates,
    adjudicate_compact,
    trace_closest_clustered_pallas,
)
from webgpu_raytracing_tpu.ops.raygen import camera_rays
from webgpu_raytracing_tpu.ops.ray_sort import (
    nearest_cluster_key,
    sorted_trace,
)

W = int(os.environ.get("PROF_W", 1920))
H = int(os.environ.get("PROF_H", 1080))
R = W * H
REPS = int(os.environ.get("PROF_REPS", 4))
# r4: defaults follow production (exact_pairs OFF, gang=8, folded 2-pass
# matmul); the pairs-era numbers are in ROADMAP. PROF_PAIRS=1 restores
# the r3 configuration (raw_pair kernel + adjudication cases need it).
if os.environ.get("PROF_PAIRS"):
    KW = dict(
        tile=128, tiles_per_step=8, exact_pairs=True, gang=4, gang_frac=8
    )
else:
    KW = dict(
        tile=128, tiles_per_step=8, exact_pairs=False, gang=8, gang_frac=8,
        mm_passes=2,
    )
if os.environ.get("PROF_LOCK"):  # r4 lockstep tile batching
    KW["lockstep"] = True
if os.environ.get("PROF_INTERPRET"):  # CPU smoke test
    KW["interpret"] = True
    KW["gang"] = 0


def timed(label, fn, arg_sets):
    t0 = time.perf_counter()
    out = fn(*arg_sets[0])
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    accs = []
    for i in range(REPS):
        accs.append(fn(*arg_sets[i % len(arg_sets)]))
    for a in accs:
        _sync(a)
    dt = (time.perf_counter() - t0) / REPS
    print(
        json.dumps(
            {"label": label, "ms": round(1000 * dt, 1),
             "compile_s": round(compile_s, 1)}
        ),
        flush=True,
    )
    return dt


def _sync(out):
    leaves = jax.tree.leaves(out)
    # host-readback sync (block_until_ready lies through the tunnel);
    # reduce on device first so the readback is one scalar
    x = leaves[0]
    f = jnp.sum(x) if x.dtype != jnp.bool_ else jnp.sum(x.astype(jnp.int32))
    float(jnp.asarray(f, jnp.float32))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    tables = jax.device_put(scene.tables())
    ct = tables.clusters
    settings = RenderSettings(width=W, height=H)

    # face -> cluster-id inverse map (host, once)
    fid = np.asarray(ct.face_id)
    c, s = fid.shape
    f2c = np.zeros((int(np.asarray(tables.tri).shape[0]),), np.int32)
    valid = fid >= 0
    f2c[fid[valid]] = np.repeat(np.arange(c, dtype=np.int32), s).reshape(
        c, s
    )[valid]
    f2c = jax.device_put(jnp.asarray(f2c))

    # bounce-like ray sets (two RNG draws x two aliveness levels)
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.int32),
        jnp.arange(W, dtype=jnp.int32),
        indexing="ij",
    )
    idx = (xs + ys * W).reshape(R)
    pos = jnp.stack([xs, ys], axis=-1).reshape(R, 2).astype(jnp.float32)
    view = jnp.eye(4, dtype=jnp.float32)
    state = rng.seed_state(jnp.broadcast_to(jnp.uint32(1), (R,)), idx)
    o, d, state = camera_rays(pos, view, state, settings)
    tmax = jnp.full((R,), F32_MAX, jnp.float32)
    hit = trace_closest_clustered_pallas(o, d, tmax, tables, **KW)
    found = hit.face >= 0
    no = o + d * jnp.where(found, hit.t, 1.0)[:, None]
    ocid = jnp.where(found, jnp.take(f2c, jnp.maximum(hit.face, 0)), c)

    # one distinct ray set per timed rep — the tunnel memoizes identical
    # executions, so cycling 2 sets over 4 reps undercounts by ~2x
    # (observed: leg_full < sum of its own pieces)
    sets = {"full": [], "half": []}
    for k in range(REPS):
        t2, state = rng.random_2(state)
        nd = rng.sample_cosine_weighted_hemisphere(t2, -d)
        u1, state = rng.random_1(state)
        tm_full = jnp.where(found, F32_MAX, 0.0)
        tm_half = jnp.where(found & (u1 < 0.55), F32_MAX, 0.0)
        sets["full"].append((no, nd, tm_full))
        sets["half"].append((no, nd, tm_half))
    sets = jax.device_put(sets)

    sbox = ct.sort_box

    @jax.jit
    def f_key(o, d, tm):
        return nearest_cluster_key(o, d, tm, sbox)

    @jax.jit
    def f_okey(o, d, tm):
        # origin cluster (known from the previous hit -- free in the
        # integrator) + 3-bit direction octant; dead lanes key to back
        oct_ = (
            (d[:, 0] < 0).astype(jnp.int32)
            + 2 * (d[:, 1] < 0).astype(jnp.int32)
            + 4 * (d[:, 2] < 0).astype(jnp.int32)
        )
        key = ocid * 8 + oct_
        return jnp.where(tm > 0.0, key, jnp.int32(2**30))

    rid = jnp.arange(R, dtype=jnp.int32)

    @jax.jit
    def f_sort(key):
        _, rid_s = jax.lax.sort((key, rid), num_keys=1)
        return rid_s

    @jax.jit
    def f_sortpay8(key, o, d, tm):
        cols = [key] + [
            jax.lax.bitcast_convert_type(x, jnp.int32)
            for x in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tm)
        ] + [rid]
        return jax.lax.sort(tuple(cols), num_keys=1)[1]

    @jax.jit
    def f_gather7(rid_s, o, d, tm):
        packed = jnp.concatenate([o, d, tm[:, None]], axis=1)
        return jnp.take(packed, rid_s, axis=0)

    @jax.jit
    def f_gather16(rid_s, o, d, tm):
        packed = jnp.concatenate([o, d, tm[:, None], o, d], axis=1)
        return jnp.take(packed, rid_s, axis=0)

    @jax.jit
    def f_scatter4(rid_s, o, tm):
        rows = jnp.concatenate(
            [jax.lax.bitcast_convert_type(o, jnp.int32),
             jax.lax.bitcast_convert_type(tm, jnp.int32)[:, None]],
            axis=1,
        )
        return jnp.zeros((R, 4), jnp.int32).at[rid_s].set(rows)

    def near_pass(o, d, tm):
        from webgpu_raytracing_tpu.ops.cluster_trace import _boxes_near
        from webgpu_raytracing_tpu.ops.intersect import safe_inv_dir

        tile = KW["tile"]
        n_tiles = R // tile
        nb = sbox.shape[0]
        cp = max(128, -(-nb // 128) * 128)
        inv_d = safe_inv_dir(d)

        def tile_nears(args):
            ot, it, tt = args
            near = jnp.min(_boxes_near(ot, it, sbox, tt), axis=0)
            return jnp.pad(near, (0, cp - nb), constant_values=F32_MAX)

        return jax.lax.map(
            tile_nears,
            (
                o.reshape(n_tiles, tile, 3),
                inv_d.reshape(n_tiles, tile, 3),
                tm.reshape(n_tiles, tile),
            ),
            batch_size=max(1, min(n_tiles, 16_777_216 // (tile * cp))),
        )

    f_near = jax.jit(near_pass)

    @jax.jit
    def f_kernel(o, d, tm):
        return trace_closest_clustered_pallas(
            o, d, tm, tables, raw_pair=True, derive_uv=False, **KW
        )

    @jax.jit
    def f_adjud(o, d, tm, f1, f2, f3):
        return adjudicate_candidates(o, d, tm, (f1, f2, f3), tables)

    @jax.jit
    def f_adjud_c(o, d, tm, f1, f2, f3, amb):
        return adjudicate_compact(o, d, tm, tm, (f1, f2, f3), amb, tables)

    if KW.get("exact_pairs"):

        @jax.jit
        def f_leg(o, d, tm):
            def tf(o_, d_, tm_, tb_, act_):
                _, f1, f2, f3, amb = trace_closest_clustered_pallas(
                    o_, d_, tm_, tb_, act_, raw_pair=True,
                    derive_uv=False, **KW
                )
                return f1, f2, f3, amb

            f1, f2, f3, amb = sorted_trace(tf, o, d, tm, tables, None)
            return adjudicate_compact(
                o, d, tm, tm, (f1, f2, f3), amb, tables
            )

    else:
        # the production (pairs-off) leg: unsort only (t, face), then
        # re-derive u/v in original order — mirrors integrator.py
        from webgpu_raytracing_tpu.ops.cluster_pallas import rederive_uv

        @jax.jit
        def f_leg(o, d, tm):
            def tf(o_, d_, tm_, tb_, act_):
                h = trace_closest_clustered_pallas(
                    o_, d_, tm_, tb_, act_, derive_uv=False, **KW
                )
                return h.t, h.face

            t, face = sorted_trace(tf, o, d, tm, tables, None)
            return rederive_uv(o, d, t, face, tables)

    # pre-computed sorted orders for the kernel-quality probes
    def presort(keyfn, rays):
        out = []
        for o_, d_, tm_ in rays:
            rid_s = f_sort(keyfn(o_, d_, tm_))
            p = f_gather7(rid_s, o_, d_, tm_)
            out.append((p[:, 0:3], p[:, 3:6], p[:, 6]))
        return jax.device_put(out)

    cases = {}
    for lvl in ("full", "half"):
        rays = sets[lvl]
        keys = [f_key(*a) for a in rays]
        rids = [(f_sort(k),) for k in keys]
        rg = [(f_sort(keys[i]),) + rays[i] for i in range(len(rays))]
        cases[f"key_{lvl}"] = (f_key, rays)
        cases[f"okey_{lvl}"] = (f_okey, rays)
        cases[f"sort_{lvl}"] = (f_sort, [(k,) for k in keys])
        cases[f"sortpay8_{lvl}"] = (
            f_sortpay8, [(keys[i],) + rays[i] for i in range(len(rays))]
        )
        cases[f"gather7_{lvl}"] = (f_gather7, rg)
        cases[f"gather16_{lvl}"] = (f_gather16, rg)
        cases[f"scatter4_{lvl}"] = (
            f_scatter4, [(r[0], rays[i][0], rays[i][2]) for i, r in
                         enumerate(rids)]
        )
        srt = presort(f_key, rays)
        cases[f"near_{lvl}"] = (f_near, srt)
        cases[f"kernel_{lvl}"] = (f_kernel, srt)
        srt_ok = presort(f_okey, rays)
        cases[f"kernel_ok_{lvl}"] = (f_kernel, srt_ok)
        # stale permutation: sort rays of set B by set A's order
        stale = [
            (lambda p: (p[:, 0:3], p[:, 3:6], p[:, 6]))(
                f_gather7(f_sort(keys[0]), *rays[1])
            )
        ]
        cases[f"kernel_st_{lvl}"] = (f_kernel, stale)
        if KW.get("exact_pairs"):
            kouts = [f_kernel(*a) for a in srt]
            cases[f"adjud_{lvl}"] = (
                f_adjud,
                [srt[i] + (k[1], k[2], k[3]) for i, k in enumerate(kouts)],
            )
            cases[f"adjudc_{lvl}"] = (
                f_adjud_c,
                [
                    srt[i] + (k[1], k[2], k[3], k[4])
                    for i, k in enumerate(kouts)
                ],
            )
        cases[f"leg_{lvl}"] = (f_leg, rays)

    only = sys.argv[1:]
    for name, (fn, arg_sets) in cases.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        timed(name, fn, arg_sets)


if __name__ == "__main__":
    main()

"""Isolated sorted-bounce-trace bench on TPU: exact_pairs cost, miss-tail
gang sizes, and the coherent primary trace — fast iteration without
full-frame compiles.

Bounce rays are generated the way the integrator makes them (primary hit
points + cosine-weighted directions, dead lanes for primary misses), at
1080p scale. Timing per CLAUDE.md: on-device accumulation, one scalar
host readback ends each timed region; inputs cycle across reps so the
tunnel can't memoize.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/gang_bench.py [labels...]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)

import jax

if os.environ.get("PROF_CPU"):  # smoke-test mode (the tunnel ignores
    jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS — CLAUDE.md)
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from webgpu_raytracing_tpu.config import F32_MAX, RenderSettings
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.ops import rng
from webgpu_raytracing_tpu.ops.cluster_pallas import (
    adjudicate_compact,
    rederive_uv,
    trace_closest_clustered_pallas,
)
from webgpu_raytracing_tpu.ops.raygen import camera_rays
from webgpu_raytracing_tpu.ops.ray_sort import sorted_trace

INTERP = bool(os.environ.get("PROF_CPU"))  # new-arm smoke only
W = int(os.environ.get("PROF_W", 1920))
H = int(os.environ.get("PROF_H", 1080))
R = W * H
REPS = int(os.environ.get("PROF_REPS", 4))


def make_rays(tables, settings):
    """Primary rays + two bounce-ray sets (different RNG draws)."""
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
    hit = trace_closest_clustered_pallas(
        o, d, tmax, tables, tile=128, exact_pairs=False, interpret=INTERP
    )
    found = hit.face >= 0
    no = o + d * jnp.where(found, hit.t, 1.0)[:, None]
    btm = jnp.where(found, F32_MAX, 0.0)
    sets = []
    for _ in range(2):
        t2, state = rng.random_2(state)
        nd = rng.sample_cosine_weighted_hemisphere(t2, -d)
        sets.append((no, nd, btm))
    return (o, d, tmax), sets


def timed(fn, ray_sets, label):
    t_c0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    h = fn(*ray_sets[0])
    float(jnp.sum(h.t))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(REPS):
        h = fn(*ray_sets[i % len(ray_sets)])
        acc = acc + jnp.sum(h.t)
    float(acc)
    dt = (time.perf_counter() - t0) / REPS
    rec = {
        "label": label,
        "ms": round(1000 * dt, 1),
        "mrays": round(R / dt / 1e6, 2),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    tables = jax.device_put(scene.tables())
    settings = RenderSettings(width=W, height=H)
    (po, pd, ptm), bounce_sets = make_rays(tables, settings)

    def sorted_pairs(
        gang, gang_frac, exact_pairs, approx_div=False, mm=3, sched=0,
        tile=128, tps=8,
    ):
        kw = dict(
            tile=tile, tiles_per_step=tps, approx_div=approx_div,
            exact_pairs=exact_pairs, gang=gang, gang_frac=gang_frac,
            mm_passes=mm, sched_rounds=sched, interpret=INTERP,
        )

        @jax.jit
        def run(o, d, tm):
            if exact_pairs:
                def tf(o_, d_, tm_, tb_, act_):
                    _, f1, f2, f3, amb = trace_closest_clustered_pallas(
                        o_, d_, tm_, tb_, act_, raw_pair=True,
                        derive_uv=False, **kw,
                    )
                    return f1, f2, f3, amb

                f1, f2, f3, amb = sorted_trace(tf, o, d, tm, tables, None)
                return adjudicate_compact(
                    o, d, tm, tm, (f1, f2, f3), amb, tables
                )

            def tf(o_, d_, tm_, tb_, act_):
                h = trace_closest_clustered_pallas(
                    o_, d_, tm_, tb_, act_, derive_uv=False, **kw
                )
                return h.t, h.face

            t, face = sorted_trace(tf, o, d, tm, tables, None)
            return rederive_uv(o, d, t, face, tables)

        return run

    def primary(gang, gang_frac, exact_pairs, mm=3):
        @jax.jit
        def run(o, d, tm):
            return trace_closest_clustered_pallas(
                o, d, tm, tables, tile=128, tiles_per_step=8,
                approx_div=False, exact_pairs=exact_pairs, gang=gang,
                gang_frac=gang_frac, mm_passes=mm,
            )

        return run

    def binned(mm=2, sf=3, bps=8):
        from webgpu_raytracing_tpu.ops.ray_sort import binned_trace

        fn_surv = functools.partial(
            trace_closest_clustered_pallas, tile=128, tiles_per_step=8,
            exact_pairs=False, gang=0, gang_frac=0, lockstep=True,
            mm_passes=mm, derive_uv=False, interpret=INTERP,
        )

        @jax.jit
        def run(o, d, tm):
            t, face = binned_trace(
                fn_surv, o, d, tm, tables, surv_frac=sf,
                blocks_per_step=bps, mm_passes=mm, interpret=INTERP,
            )
            return rederive_uv(o, d, t, face, tables)

        return run

    def sorted_lock(gang, mm=2):
        kw = dict(
            tile=128, tiles_per_step=8, exact_pairs=False, gang=gang,
            gang_frac=0, lockstep=True, mm_passes=mm,
        )

        @jax.jit
        def run(o, d, tm):
            def tf(o_, d_, tm_, tb_, act_):
                h = trace_closest_clustered_pallas(
                    o_, d_, tm_, tb_, act_, derive_uv=False, interpret=INTERP, **kw
                )
                return h.t, h.face

            t, face = sorted_trace(tf, o, d, tm, tables, None)
            return rederive_uv(o, d, t, face, tables)

        return run

    def anyhit(lockstep):
        @jax.jit
        def run(o, d, tm):
            def tf(o_, d_, tm_, tb_, act_):
                h = trace_closest_clustered_pallas(
                    o_, d_, tm_, tb_, act_, tile=128, tiles_per_step=8,
                    any_hit=True, mm_passes=2, lockstep=lockstep,
                    interpret=INTERP,
                )
                return h.t, h.face

            t, face = sorted_trace(tf, o, d, tm, tables, None)
            return rederive_uv(o, d, t, face, tables)

        return run

    def anyhit_binned(sf=3):
        from webgpu_raytracing_tpu.ops.ray_sort import binned_trace_any
        from webgpu_raytracing_tpu.ops.traverse import Hit

        fn_any = functools.partial(
            trace_closest_clustered_pallas, tile=128, tiles_per_step=8,
            any_hit=True, mm_passes=2, lockstep=True, derive_uv=False,
            interpret=INTERP,
        )

        @jax.jit
        def run(o, d, tm):
            blocked = binned_trace_any(
                fn_any, o, d, tm, tables, surv_frac=sf, mm_passes=2,
                interpret=INTERP,
            )
            # timed() sums h.t — make the blocked mask the payload
            z = jnp.zeros((R,), jnp.float32)
            return Hit(
                t=blocked.astype(jnp.float32), u=z, v=z,
                face=blocked.astype(jnp.int32),
            )

        return run

    def binned_stage(stage, mm=2, sf=3, bps=8):
        """Cumulative piece timing of the binned closest-hit leg: the
        r5 leg measured ~255 ms vs the drain leg's ~230 with ~1/12 the
        kernel work, so the cost moved into plumbing — attribute it.
        Stages replicate ops/ray_sort.binned_trace's phases verbatim
        (each stage executes everything before it; deltas between arms
        are the piece costs, XLA overlap caveat as in profile_legs)."""
        import numpy as _np

        from webgpu_raytracing_tpu.ops.ray_sort import (
            _block_schedules,
            _from_cols,
            _recompact_final_pass,
            _to_cols,
            nearest_cluster_keys2,
        )
        from webgpu_raytracing_tpu.ops.cluster_pallas import (
            trace_binned_pass,
        )
        from webgpu_raytracing_tpu.ops.traverse import Hit

        fn_surv = functools.partial(
            trace_closest_clustered_pallas, tile=128, tiles_per_step=8,
            exact_pairs=False, gang=0, gang_frac=0, lockstep=True,
            mm_passes=mm, derive_uv=False, interpret=INTERP,
        )

        @jax.jit
        def run(o, d, t_max):
            boxes = tables.clusters.sort_box
            c = boxes.shape[0]
            cbits = max(1, (c - 1).bit_length())
            kmask = (1 << cbits) - 1
            miss_th = int(_np.float32(3.4e38).view(_np.int32)) & ~kmask
            n_s = tables.clusters.face_id.shape[1]
            sl_mask = (1 << max(1, (n_s - 1).bit_length())) - 1
            step = 128 * bps
            pad = (-o.shape[0]) % step
            assert pad == 0
            r = o.shape[0]
            z = jnp.zeros((r,), jnp.float32)

            def hit_of(x):
                return Hit(
                    t=x.astype(jnp.float32), u=z, v=z,
                    face=jnp.zeros((r,), jnp.int32),
                )

            k1, k2 = nearest_cluster_keys2(o, d, t_max, boxes)
            if stage == "keys":
                return hit_of(k1 + k2)
            cid1 = jnp.where((k1 & ~kmask) < miss_th, k1 & kmask, c)
            rid = jnp.arange(r, dtype=jnp.int32)
            cols, specs, td = _to_cols((o, d, t_max, k2))
            s1 = jax.lax.sort(
                tuple([cid1, rid] + cols), num_keys=1, is_stable=True
            )
            cid_s, rid_s = s1[0], s1[1]
            o_s, d_s, tm_s, k2_s = _from_cols(list(s1[2:]), specs, td)
            if stage == "sort":
                return hit_of(cid_s + rid_s)
            sched, flag = _block_schedules(cid_s, r // 128, 128, c)
            t1, f1 = trace_binned_pass(
                o_s, d_s, tm_s, tables, sched, excl_code=None,
                interpret=INTERP, blocks_per_step=bps, mm_passes=mm,
            )
            if stage == "pass1":
                return hit_of(t1)
            nmask = kmask | sl_mask
            k2n = k2_s & ~nmask
            live = tm_s > 0.0
            stop = jnp.where(
                live,
                jnp.where(flag, jnp.maximum(k2n - 1, 0), 0),
                jnp.int32(0x7FFFFFFF),
            )
            if stage == "fracprobe":
                surv = (
                    jax.lax.bitcast_convert_type(t1, jnp.int32) > stop
                )
                return hit_of(surv)
            if stage == "unsorted_nosurv":
                back = jax.lax.sort(
                    (
                        rid_s,
                        jax.lax.bitcast_convert_type(t1, jnp.int32),
                        f1,
                    ),
                    num_keys=1,
                    is_stable=False,
                )
                return hit_of(back[1])
            t_fin, f_fin, rid_c = _recompact_final_pass(
                fn_surv, o_s, d_s, None, t1, f1, stop, rid_s, tables,
                boxes, sf,
            )
            if stage == "surv":
                return hit_of(t_fin)
            back = jax.lax.sort(
                (
                    rid_c,
                    jax.lax.bitcast_convert_type(t_fin, jnp.int32),
                    f_fin,
                ),
                num_keys=1,
                is_stable=False,
            )
            return hit_of(back[1])

        return run

    # env-NEE shadow-ray sets (VERDICT r4 #4): origins = primary hit
    # points, directions = a sun direction + per-ray cone jitter,
    # t_max = F32_MAX (the environment has no distance — the unbounded
    # any-hit case), dead lanes where the primary missed. The sun comes
    # through the OPEN right side, so the set mixes fast blocked rays
    # (walls) with full-line-walk visible rays — config #3's real mix.
    no0, nd0, btm0 = bounce_sets[0]
    sun = jnp.asarray([0.8, 0.55, 0.25], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    env_sets, light_sets = [], []
    st_env = rng.seed_state(
        jnp.broadcast_to(jnp.uint32(7), (R,)),
        jnp.arange(R, dtype=jnp.int32),
    )
    for _ in range(2):
        t2, st_env = rng.random_2(st_env)
        jit3 = rng.sample_cosine_weighted_hemisphere(t2, sun)
        ed = sun[None, :] * 0.95 + jit3 * 0.05
        ed = ed / jnp.linalg.norm(ed, axis=-1, keepdims=True)
        env_sets.append((no0, ed, btm0))
        # light-NEE contrast: same origins toward the ceiling light
        # (model 0 sits near the ceiling center), t_max = distance
        lt = jnp.asarray([0.0, 1.95, 0.0], jnp.float32) - no0
        dist = jnp.linalg.norm(lt, axis=-1, keepdims=True)
        light_sets.append(
            (
                no0,
                lt / jnp.maximum(dist, 1e-6),
                jnp.where(btm0 > 0, dist[:, 0], 0.0),
            )
        )

    cases = {
        # r3 production defaults (nopairs, gang=4): folded vs 3-pass matmul
        "bounce_nopairs_g4_mm3": lambda: timed(
            sorted_pairs(4, 8, False, mm=3), bounce_sets,
            "bounce_nopairs_g4_mm3",
        ),
        "bounce_nopairs_g4_mm2": lambda: timed(
            sorted_pairs(4, 8, False, mm=2), bounce_sets,
            "bounce_nopairs_g4_mm2",
        ),
        "bounce_nopairs_g0_mm2": lambda: timed(
            sorted_pairs(0, 8, False, mm=2), bounce_sets,
            "bounce_nopairs_g0_mm2",
        ),
        "primary_nopairs_g4_mm3": lambda: timed(
            primary(4, 8, False, mm=3), [(po, pd, ptm)],
            "primary_nopairs_g4_mm3",
        ),
        "primary_nopairs_g4_mm2": lambda: timed(
            primary(4, 8, False, mm=2), [(po, pd, ptm)],
            "primary_nopairs_g4_mm2",
        ),
        # post-fold retune: wider gangs / fractions (ganged rounds are
        # relatively cheaper now that the matmul is 2 issues)
        "bounce_nopairs_g8_mm2": lambda: timed(
            sorted_pairs(8, 8, False, mm=2), bounce_sets,
            "bounce_nopairs_g8_mm2",
        ),
        "bounce_nopairs_g4f4_mm2": lambda: timed(
            sorted_pairs(4, 4, False, mm=2), bounce_sets,
            "bounce_nopairs_g4f4_mm2",
        ),
        "bounce_nopairs_g8f4_mm2": lambda: timed(
            sorted_pairs(8, 4, False, mm=2), bounce_sets,
            "bounce_nopairs_g8f4_mm2",
        ),
        "bounce_pairs_g0": lambda: timed(
            sorted_pairs(0, 8, True), bounce_sets, "bounce_pairs_g0"
        ),
        "bounce_nopairs_g0": lambda: timed(
            sorted_pairs(0, 8, False), bounce_sets, "bounce_nopairs_g0"
        ),
        "bounce_pairs_g4f8": lambda: timed(
            sorted_pairs(4, 8, True), bounce_sets, "bounce_pairs_g4f8"
        ),
        "bounce_pairs_g4f4": lambda: timed(
            sorted_pairs(4, 4, True), bounce_sets, "bounce_pairs_g4f4"
        ),
        "bounce_pairs_g8f8": lambda: timed(
            sorted_pairs(8, 8, True), bounce_sets, "bounce_pairs_g8f8"
        ),
        "bounce_pairs_g2f8": lambda: timed(
            sorted_pairs(2, 8, True), bounce_sets, "bounce_pairs_g2f8"
        ),
        "primary_pairs_g0": lambda: timed(
            primary(0, 8, True), [(po, pd, ptm)], "primary_pairs_g0"
        ),
        "primary_pairs_g4f8": lambda: timed(
            primary(4, 8, True), [(po, pd, ptm)], "primary_pairs_g4f8"
        ),
        "primary_nopairs_g0": lambda: timed(
            primary(0, 8, False), [(po, pd, ptm)], "primary_nopairs_g0"
        ),
        # schedule-fed round loop (r4, _kernel_sched): XLA-sorted per-tile
        # cluster schedules in SMEM — no in-kernel drain, no per-round
        # scalar extraction; J-block rounds vs the gang=8 production arm
        "bounce_sched2_mm2": lambda: timed(
            sorted_pairs(0, 8, False, mm=2, sched=2), bounce_sets,
            "bounce_sched2_mm2",
        ),
        "bounce_sched4_mm2": lambda: timed(
            sorted_pairs(0, 8, False, mm=2, sched=4), bounce_sets,
            "bounce_sched4_mm2",
        ),
        "bounce_sched8_mm2": lambda: timed(
            sorted_pairs(0, 8, False, mm=2, sched=8), bounce_sets,
            "bounce_sched8_mm2",
        ),
        "bounce_sched4_t256": lambda: timed(
            sorted_pairs(0, 8, False, mm=2, sched=4, tile=256, tps=4),
            bounce_sets, "bounce_sched4_t256",
        ),
        # r5 binned per-ray scheduling vs the production drain leg
        # (ROADMAP ceiling ledger: 1.02 vs ~12 cluster-units per block)
        "bounce_binned_mm2": lambda: timed(
            binned(mm=2), bounce_sets, "bounce_binned_mm2",
        ),
        "bounce_binned_sf8": lambda: timed(
            binned(mm=2, sf=8), bounce_sets, "bounce_binned_sf8",
        ),
        "bounce_binned_p16": lambda: timed(
            binned(mm=2, bps=16), bounce_sets, "bounce_binned_p16",
        ),
        # survivor-slice sizing: sf4's slice is r/4 = 25% but the
        # union analysis puts need>=2 at ~20-30% of rays — if n_surv
        # exceeds the slice, the lax.cond takes the FULL-WIDTH drain
        # fallback every time and the binned leg degenerates to
        # drain + pass-1 overhead (the r5 leg numbers' shape)
        "bounce_binned_sf2": lambda: timed(
            binned(mm=2, sf=2), bounce_sets, "bounce_binned_sf2",
        ),
        # binned scheduling for the COHERENT primary leg (screen-order
        # rays share cid1 -> pass 1 resolves most lanes; does the extra
        # key+sort plumbing beat the drain kernel's rounds?)
        "primary_binned": lambda: timed(
            binned(mm=2), [(po, pd, ptm)], "primary_binned",
        ),
        # cumulative piece attribution of the binned leg (deltas =
        # piece costs; see binned_stage docstring)
        "bpiece_keys": lambda: timed(
            binned_stage("keys"), bounce_sets, "bpiece_keys",
        ),
        "bpiece_sort": lambda: timed(
            binned_stage("sort"), bounce_sets, "bpiece_sort",
        ),
        "bpiece_pass1": lambda: timed(
            binned_stage("pass1"), bounce_sets, "bpiece_pass1",
        ),
        "bpiece_nosurv": lambda: timed(
            binned_stage("unsorted_nosurv"), bounce_sets,
            "bpiece_nosurv",
        ),
        "bpiece_surv": lambda: timed(
            binned_stage("surv"), bounce_sets, "bpiece_surv",
        ),
        "bpiece_full": lambda: timed(
            binned_stage("full"), bounce_sets, "bpiece_full",
        ),
        "bpiece_sfrac": lambda: print(
            json.dumps(
                {
                    "label": "bpiece_sfrac",
                    "surv_frac": [
                        round(
                            float(
                                jnp.sum(
                                    binned_stage("fracprobe")(
                                        *s
                                    ).t
                                )
                            )
                            / R,
                            4,
                        )
                        for s in bounce_sets
                    ],
                }
            ),
            flush=True,
        ),
        # production incumbent at the r4 defaults (lockstep gang-all)
        "bounce_lockg2_mm2": lambda: timed(
            sorted_lock(2, mm=2), bounce_sets, "bounce_lockg2_mm2",
        ),
        # VERDICT r4 #4: the env-NEE any-hit legs (unbounded t_max,
        # mostly-miss) — cost vs the closest-hit leg on the SAME rays
        "anyhit_env": lambda: timed(
            anyhit(False), env_sets, "anyhit_env",
        ),
        "anyhit_env_lock": lambda: timed(
            anyhit(True), env_sets, "anyhit_env_lock",
        ),
        "closest_env": lambda: timed(
            sorted_pairs(0, 8, False, mm=2), env_sets, "closest_env",
        ),
        # the light-NEE shadow legs for contrast (bounded t_max)
        "anyhit_light": lambda: timed(
            anyhit(False), light_sets, "anyhit_light",
        ),
        # binned any-hit (r5): pass 1 = nearest cluster only, survivors
        # drain with the t_start skip
        "anyhit_env_binned": lambda: timed(
            anyhit_binned(), env_sets, "anyhit_env_binned",
        ),
        "anyhit_light_binned": lambda: timed(
            anyhit_binned(), light_sets, "anyhit_light_binned",
        ),
    }
    only = sys.argv[1:]
    for name, f in cases.items():
        if only and name not in only:
            continue
        f()


if __name__ == "__main__":
    main()

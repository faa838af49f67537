"""Frame-cost decomposition on TPU: time render_frame under setting
variants whose DELTAS isolate per-piece costs (marginal bounce segment,
marginal camera sample, predictor, sort plumbing) — the trace-leg
microbenches (gang_bench/profile_legs) can't see integrator/shading/
G-buffer overheads that only exist in the full frame graph.

Timing per CLAUDE.md: on-device accumulation across frames, ONE scalar
readback ends the timed region; seeds vary per frame so the tunnel can't
memoize.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/frame_profile.py [labels...]
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

if os.environ.get("PROF_CPU"):  # smoke-test mode (the tunnel ignores
    jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS — CLAUDE.md)
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/jax_cache_webgpu_raytracing_tpu"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from webgpu_raytracing_tpu.config import RenderSettings
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.renderer import FrameBuffers, FrameInputs, render_frame
from webgpu_raytracing_tpu.utils.image import load_cubemap

W = int(os.environ.get("PROF_W", 1920))
H = int(os.environ.get("PROF_H", 1080))
FRAMES = int(os.environ.get("PROF_FRAMES", 6))


def synth_equirect(h=2048, w=4096):
    """Synthetic HDR equirect (config #3 arm: the reference's EXR asset
    isn't bundled — VERDICT r3 #5 sanctions a synthetic 4k equirect):
    smooth sky gradient + a small bright sun (the case where luminance
    importance sampling pays)."""
    import numpy as np

    y = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    img = np.stack(
        [
            0.3 + 0.5 * y + 0 * np.zeros((h, w), np.float32),
            0.4 + 0.4 * y + np.zeros((h, w), np.float32),
            0.6 + 0.3 * y + np.zeros((h, w), np.float32),
        ],
        axis=-1,
    )
    img[h // 3 : h // 3 + 16, w // 4 : w // 4 + 16] = 800.0  # the sun
    return img


def run(label, settings, tables, env):
    try:
        _run(label, settings, tables, env)
    except Exception as e:  # one bad arm must not kill the batch
        msg = str(e).split("\n")[0][:200]
        print(json.dumps({"label": label, "error": msg}), flush=True)


def _run(label, settings, tables, env):
    buffers = FrameBuffers.create(W, H)
    view = jnp.eye(4, dtype=jnp.float32)
    t0 = time.perf_counter()
    buffers, rays = render_frame(
        buffers, tables, env, FrameInputs.simple(view, 1, 0), settings
    )
    float(rays)
    compile_s = time.perf_counter() - t0
    total = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for k in range(FRAMES):
        buffers, rays = render_frame(
            buffers, tables, env,
            FrameInputs.simple(view, 2654435761 * (k + 2) % (2**32), k + 1),
            settings,
        )
        total = total + rays
    tot = float(total)
    dt = (time.perf_counter() - t0) / FRAMES
    print(
        json.dumps(
            {
                "label": label,
                "ms_frame": round(1000 * dt, 1),
                "mrays": round(tot / FRAMES / dt / 1e6, 2),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    tables = jax.device_put(scene.tables())
    env = jnp.asarray(
        load_cubemap(
            [
                f"/root/reference/assets/{f}.jpg"
                for f in ("right", "left", "top", "bottom", "front", "back")
            ]
        )
    )
    base = RenderSettings(
        width=W, height=H, environment="cubemap", sample_count=1,
        bounces_depth=4,
    )
    cases = {
        # the bench configuration
        "default": base,
        # marginal bounce segment: default minus one segment per sample
        "depth3": base.replace(bounces_depth=3),
        # primary-only paths (1 segment per sample)
        "depth2": base.replace(bounces_depth=2),
        # marginal camera sample (1 sample instead of 2)
        "sample0": base.replace(sample_count=0),
        # predictor off: t_max = inf primaries, no prev-quad pass
        "nopred": base.replace(use_hit_predictor=False),
        # unsorted bounce legs (sort plumbing + coherence win, net)
        "nosort": base.replace(sort_bounce_rays=False),
        # 3-pass matmul (the pre-fold kernel)
        "mm3": base.replace(mm_passes=3),
        # environment fetch cost: procedural sky needs no per-lane
        # texture gathers (the cubemap fetch is one deferred per-path
        # gather pass; delta = its real cost)
        "proc_env": base.replace(environment="procedural"),
        # retune arms at frame level (default is gang=8 post-fold)
        "gang4": base.replace(trace_gang=4),
        "tile256": base.replace(trace_tile=256, tiles_per_step=4),
        "tile256tps8": base.replace(trace_tile=256, tiles_per_step=8),
        "tps16": base.replace(tiles_per_step=16),
        # software-pipelined kernel rounds off (r4 A/B: MXU/VPU overlap)
        "nopipe": base.replace(pipeline_rounds=False),
        # gang EVERY tile (gang_frac=0): serial rounds drop ~K× on the
        # light 7/8 of tiles too, at up to K× extra epilogue work past
        # their prune point — and the union-sort/reorder legs vanish
        "gangall2": base.replace(trace_gang=2, trace_gang_frac=0),
        "gangall4": base.replace(trace_gang=4, trace_gang_frac=0),
        "gangall8": base.replace(trace_gang=8, trace_gang_frac=0),
        # lockstep tile batching (r4: one fused round loop per grid
        # step — serial rounds drop from sum(tiles) to max(tiles))
        "lock": base.replace(lockstep_tiles=True),
        "lock_tps16": base.replace(lockstep_tiles=True, tiles_per_step=16),
        "lock_gangall": base.replace(lockstep_tiles=True, trace_gang_frac=0),
        "lock_tps4": base.replace(lockstep_tiles=True, tiles_per_step=4),
        # small tiles x lockstep (r4: the kernel is VPU-THROUGHPUT-bound
        # on epilogue work = tile_rounds x 4S per ray; tile=32 nearly
        # halves it — work/ray 6.37 vs 12.05, tools/ lockstep work sim —
        # while lockstep absorbs the serial-round penalty that sank
        # small tiles before)
        "lock32": base.replace(
            lockstep_tiles=True, trace_tile=32, tiles_per_step=32
        ),
        "lock32_gangall": base.replace(
            lockstep_tiles=True, trace_tile=32, tiles_per_step=32,
            trace_gang_frac=0,
        ),
        "lock64": base.replace(
            lockstep_tiles=True, trace_tile=64, tiles_per_step=16
        ),
        "lock64_gangall": base.replace(
            lockstep_tiles=True, trace_tile=64, tiles_per_step=16,
            trace_gang_frac=0,
        ),
        # approx-reciprocal round picks, re-armed with the r4 inflated
        # prune bound (the r3 parity catastrophe was the bound consuming
        # underestimated t; ranking flips are knife-edge noise) — time
        # here, parity via tools/parity_tpu.py PARITY_OPTS=approx_div=1
        "adiv": base.replace(approx_div=True),
        "lock32_adiv": base.replace(
            lockstep_tiles=True, trace_tile=32, tiles_per_step=32,
            trace_gang_frac=0, approx_div=True,
        ),
        # schedule-fed round loop (r4 _kernel_sched): closest-hit legs
        # use XLA-sorted SMEM cluster schedules (no drain/extract);
        # shadow legs keep the drain kernel (any_hit unsupported)
        "sched2": base.replace(trace_sched=2),
        "sched4": base.replace(trace_sched=4),
        "sched8": base.replace(trace_sched=8),
        # chained segment sorting re-check: the r3 ablation measured -4%
        # in the pairs-era kernel; with the folded/ganged trace the sort
        # legs are a larger frame fraction, so re-measure
        "chained": base.replace(chained_sort=True),
        # predictor-off + chained combination (both independent wins?)
        "nopred_chained": base.replace(
            use_hit_predictor=False, chained_sort=True
        ),
        # capped-rounds + recompaction multipass (r4 work-volume lever,
        # ops/ray_sort.sorted_trace_multipass; CPU-exact study predicts
        # work/ray 12.0 -> 5.6 at cap=4 — tools/multipass_sim.py).
        # Bit-identical (tests); arms sweep cap and pass count.
        "mp2": base.replace(multipass_cap=2),
        "mp4": base.replace(multipass_cap=4),
        "mp8": base.replace(multipass_cap=8),
        "mp4_p3": base.replace(multipass_cap=4, multipass_passes=3),
        "mp2_p3": base.replace(multipass_cap=2, multipass_passes=3),
        # binned per-ray scheduling (r5 ceiling-ledger consequence:
        # pass 1 = each block's distinct nearest-cluster ids, ~1.02
        # cluster-units/block vs the drain kernels' ~12; survivors run
        # the compacted drain pass). Bit-identical at gang<=1 (tests).
        "binned": base.replace(binned_sort=True),
        # binned any-hit shadow legs (config.py binned_any_sort,
        # default OFF after the cache-warm A/B) — frame-level check
        "binany": base.replace(binned_any_sort=True),
        # dead-lane slicing of sorted bounce legs now DEFAULT ON
        # (config.py live_slice; measured live fractions 62%/31% at
        # bounce segs 1/2) — this arm isolates the frame-level delta
        "noslice": base.replace(live_slice=False),
        # binned + predictor off / chained interactions
        "binned_nopred": base.replace(
            binned_sort=True, use_hit_predictor=False
        ),
    }
    # config #3 arms (BASELINE: equirect env, 1080p, MIS on vs off) —
    # built lazily; the equirect replaces the cubemap env operand
    env_cases = {
        "equirect": base.replace(environment="equirect"),
        "envis": base.replace(
            environment="equirect", env_importance_sampling=True
        ),
        # env-NEE depth limit (RenderSettings.env_nee_depth) and the
        # binned any-hit shadow legs — the two config-#3 levers (r5)
        "envis_d1": base.replace(
            environment="equirect", env_importance_sampling=True,
            env_nee_depth=1,
        ),
        # isolate live_slice's effect on the env-IS frame (the r5
        # envis/equirect ratio moved 2.77x -> 4.1x vs r4; which part
        # is session speed and which is slicing?)
        "envis_noslice": base.replace(
            environment="equirect", env_importance_sampling=True,
            live_slice=False,
        ),
        "envis_d1_noslice": base.replace(
            environment="equirect", env_importance_sampling=True,
            env_nee_depth=1, live_slice=False,
        ),
        "envis_d2": base.replace(
            environment="equirect", env_importance_sampling=True,
            env_nee_depth=2,
        ),
        "envis_binned": base.replace(
            environment="equirect", env_importance_sampling=True,
            binned_sort=True,
        ),
        "envis_d1_binned": base.replace(
            environment="equirect", env_importance_sampling=True,
            env_nee_depth=1, binned_sort=True,
        ),
    }
    only = sys.argv[1:]
    for name, s in cases.items():
        if only and name not in only:
            continue
        run(name, s, tables, env)
    if any(n in env_cases for n in only) or not only:
        eq_np = synth_equirect()
        for name, s in env_cases.items():
            if only and name not in only:
                continue
            if s.env_importance_sampling:
                from webgpu_raytracing_tpu.ops.env_sample import (
                    build_env_distribution,
                )
                run(name, s, tables, build_env_distribution(eq_np))
            else:
                run(name, s, tables, jnp.asarray(eq_np))


if __name__ == "__main__":
    main()

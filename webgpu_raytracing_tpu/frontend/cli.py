"""Headless CLI frontend.

The reference's frontend is a SolidJS browser UI (UI.tsx, index.tsx) with
live timers; the headless equivalent is render-to-file plus a benchmark
mode reporting rays/sec and wall-clock-to-N-spp (replacing the UI's
GPU-time/JS-time/Update-time readouts, UI.tsx:26-42), an orbit mode for
the scripted-camera config, and checkpoint/resume of long renders.

Usage:
    python -m webgpu_raytracing_tpu.frontend.cli render --size 512 --spp 16 -o out.png
    python -m webgpu_raytracing_tpu.frontend.cli bench --size 1080p --frames 4
    python -m webgpu_raytracing_tpu.frontend.cli orbit --frames 8 --spp 4 -o orbit_dir
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

DEFAULT_OBJ = "/root/reference/assets/raytraced-scene.obj"
DEFAULT_MTL = "/root/reference/assets/raytraced-scene.mtl"
CUBEMAP_FACES = [
    "right.jpg", "left.jpg", "top.jpg", "bottom.jpg", "front.jpg", "back.jpg",
]


def _enable_cache():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                "/tmp/jax_cache_webgpu_raytracing_tpu",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _parse_size(s: str):
    if s == "1080p":
        return 1920, 1080
    if s == "4k":
        return 3840, 2160
    if "x" in s:
        w, h = s.split("x")
        return int(w), int(h)
    return int(s), int(s)


def _build(args):
    from ..config import RenderSettings, ProjectionType, Tonemapping
    from ..models.scene import load_scene
    from ..renderer import Renderer

    width, height = _parse_size(args.size)
    env_data = None
    environment = args.env
    if environment == "cubemap":
        from ..utils.image import load_cubemap

        base = os.path.dirname(args.obj)
        env_data = load_cubemap(
            [os.path.join(base, f) for f in CUBEMAP_FACES]
        )
    elif environment == "equirect":
        from ..utils.image import read_exr, read_hdr

        path = args.env_file
        if not path or not os.path.exists(path):
            raise SystemExit(
                "--env equirect requires --env-file pointing to an "
                ".exr/.hdr asset"
            )
        env_data = (
            read_exr(path) if path.endswith(".exr") else read_hdr(path)
        )
        if args.env_importance:
            from ..ops.env_sample import build_env_distribution

            env_data = build_env_distribution(env_data)

    settings = RenderSettings(
        width=width,
        height=height,
        sample_count=args.sample_count,
        bounces_depth=args.bounces,
        environment=environment,
        env_importance_sampling=bool(
            args.env_importance and environment == "equirect"
        ),
        projection_type=ProjectionType[args.projection.upper()],
        tonemapping=Tonemapping[args.tonemap.upper()],
        reprojection_rate=args.reprojection_rate,
        debug_bvh=args.debug_bvh,
    )
    scene = load_scene(args.obj, args.mtl)
    return Renderer(scene, settings, env_data=env_data, base_seed=args.seed)


def cmd_render(args):
    from ..utils.image import write_png

    _enable_cache()
    r = _build(args)
    if args.resume and os.path.exists(args.resume):
        r.load_checkpoint(args.resume)
        print(f"resumed at counter={r.counter}")
    t0 = time.time()
    per_frame = 1 + r.settings.sample_count
    while r.counter * per_frame < args.spp:
        r.step()
        print(
            json.dumps(
                {
                    "frame": r.counter,
                    "spp": r.counter * per_frame,
                    "rays": r.last_rays,
                    "wall_s": round(time.time() - t0, 3),
                }
            )
        )
        if args.checkpoint and r.counter % args.checkpoint_every == 0:
            r.save_checkpoint(args.checkpoint)
    if args.checkpoint:
        r.save_checkpoint(args.checkpoint)
    write_png(args.output, r.image())
    print(f"wrote {args.output}")


def cmd_bench(args):
    import jax

    _enable_cache()
    r = _build(args)
    r.step()  # compile
    jax.block_until_ready(r.buffers.image)
    t0 = time.perf_counter()
    total = 0.0
    for _ in range(args.frames):
        r.step()
        total += r.last_rays
    jax.block_until_ready(r.buffers.image)
    dt = time.perf_counter() - t0
    spp = (1 + r.settings.sample_count) * args.frames
    print(
        json.dumps(
            {
                "metric": f"Mrays/sec @{args.size}",
                "value": round(total / dt / 1e6, 3),
                "unit": "Mrays/s",
                "frames": args.frames,
                "spp": spp,
                "wall_s_per_frame": round(dt / args.frames, 4),
            }
        )
    )


def cmd_orbit(args):
    """Scripted camera orbit with reset-on-move (BASELINE config #4)."""
    from ..camera import orbit_path
    from ..utils.image import write_png

    _enable_cache()
    r = _build(args)
    os.makedirs(args.output, exist_ok=True)
    per_frame = 1 + r.settings.sample_count
    for k, cam in enumerate(
        orbit_path(np.array([0.0, 1.0, -6.0]), 6.0, 1.0, args.frames)
    ):
        r.camera = cam
        r.reset()  # camera moved → accumulation restarts (store.ts:340-343)
        while r.counter * per_frame < args.spp:
            r.step()
        out = os.path.join(args.output, f"orbit_{k:03d}.png")
        write_png(out, r.image())
        print(f"wrote {out} (spp={r.counter * per_frame})")


def build_parser():
    p = argparse.ArgumentParser(prog="webgpu_raytracing_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--obj", default=DEFAULT_OBJ)
        sp.add_argument("--mtl", default=DEFAULT_MTL)
        sp.add_argument("--size", default="256x256")
        sp.add_argument("--spp", type=int, default=8)
        sp.add_argument("--sample-count", type=int, default=1)
        sp.add_argument("--bounces", type=int, default=4)
        sp.add_argument(
            "--env",
            default="procedural",
            choices=["procedural", "cubemap", "equirect", "black", "white"],
        )
        sp.add_argument("--env-file", default=None)
        sp.add_argument(
            "--env-importance", action="store_true",
            help="luminance importance sampling of the equirect env (MIS)",
        )
        sp.add_argument(
            "--projection",
            default="panini",
            choices=["fisheye", "panini", "perspective", "orthographic"],
        )
        sp.add_argument(
            "--tonemap",
            default="none",
            choices=["reinhard", "filmic", "aces", "lottes", "none"],
        )
        sp.add_argument("--reprojection-rate", type=int, default=0)
        sp.add_argument("--debug-bvh", action="store_true")
        sp.add_argument("--seed", type=int, default=0)

    sp = sub.add_parser("render", help="render to PNG")
    common(sp)
    sp.add_argument("-o", "--output", default="out.png")
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--checkpoint-every", type=int, default=16)
    sp.add_argument("--resume", default=None)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("bench", help="throughput benchmark")
    common(sp)
    sp.add_argument("--frames", type=int, default=4)
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("orbit", help="scripted camera orbit")
    common(sp)
    sp.add_argument("-o", "--output", default="orbit_out")
    sp.add_argument("--frames", type=int, default=8)
    sp.set_defaults(fn=cmd_orbit)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

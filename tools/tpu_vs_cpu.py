"""Bisect the TPU-vs-CPU frame divergence by config.

Every backend on TPU (Pallas plain/pairs AND the exact XLA clustered
path) diverges from the CPU-exact golden on the SAME ~78/2304 pixels at
48²·4spp — so the traversal kernel is exonerated and the source is
XLA:TPU lowering of some frame-math op (reciprocal/rsqrt refinement,
fusion) inside raygen/shading/sampling. This tool renders the SAME tiny
frame on TPU and on CPU (identical settings/seeds, clustered backend on
both so traversal is arithmetic-identical XLA code) and reports
mismatched pixel counts per config toggle, to localize which feature's
math diverges.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_vs_cpu.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SIZE = 48
CASES = {
    "full": {},
    "bounces1": {"bounces_depth": 1},
    "bounces2": {"bounces_depth": 2},
    "nopredictor": {"use_hit_predictor": False},
    "flat": {"shading_type": "FLAT"},
    "b2_nopred": {"bounces_depth": 2, "use_hit_predictor": False},
}

_CHILD = r"""
import os, sys, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_webgpu_raytracing_tpu")
import jax
platform, out, kwjson = sys.argv[1], sys.argv[2], sys.argv[3]
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from webgpu_raytracing_tpu.config import RenderSettings, ShadingType
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.renderer import Renderer
from test_reference_parity import synthetic_equirect

kw = json.loads(kwjson)
if "shading_type" in kw:
    kw["shading_type"] = ShadingType[kw["shading_type"]]
base = dict(width=%(size)d, height=%(size)d, environment="equirect",
            sample_count=1, bounces_depth=4, traversal="clustered")
base.update(kw)
settings = RenderSettings(**base)
scene = load_scene("/root/reference/assets/raytraced-scene.obj",
                   "/root/reference/assets/raytraced-scene.mtl")
r = Renderer(scene, settings, env_data=synthetic_equirect())
for seed in (12345, 67890):
    r.step(seed=seed)
np.savez(out, image=np.asarray(r.buffers.image),
         face=np.asarray(r.buffers.geo_face))
""" % {"size": SIZE}


def render(platform: str, out: str, kw: dict) -> None:
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_webgpu_raytracing_tpu",
        PYTHONPATH="/root/repo:/root/.axon_site",
    )
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, platform, out, json.dumps(kw)],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{platform} render failed: {r.stderr[-800:]}")


def main():
    import numpy as np

    only = sys.argv[1:]
    for name, kw in CASES.items():
        if only and name not in only:
            continue
        a_p, b_p = f"/tmp/tvc_{name}_tpu.npz", f"/tmp/tvc_{name}_cpu.npz"
        render("tpu", a_p, kw)
        render("cpu", b_p, kw)
        a, b = np.load(a_p), np.load(b_p)
        ia = a["image"][..., :3] / np.maximum(a["image"][..., 3:4], 1e-20)
        ib = b["image"][..., :3] / np.maximum(b["image"][..., 3:4], 1e-20)
        diff = np.abs(ia - ib).max(axis=-1)
        print(json.dumps({
            "case": name,
            "mismatched": int((diff > 1e-6).sum()),
            "big": int((diff > 1e-2).sum()),
            "rmse": round(float(np.sqrt(np.mean((ia - ib) ** 2))), 5),
            "face_mismatch": int((a["face"] != b["face"]).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()

"""On-chip parity evidence: the REAL TPU Pallas path (bf16x3 kernel +
exact top-2+robust adjudication) vs the checked-in WGSL-semantics golden
(tests/golden/wgsl_reference_48x48.npz) at config #2's operating point
(4 spp) — the north-star clause "≤ 1e-2 RMSE at equal spp" measured on
hardware, not under the interpreter.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/parity_tpu.py
"""

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_webgpu_raytracing_tpu"
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

from webgpu_raytracing_tpu.config import RenderSettings
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.renderer import Renderer
from test_reference_parity import synthetic_equirect


def main():
    gsize = int(os.environ.get("GOLDEN_SIZE", 48))
    backend = os.environ.get("PARITY_BACKEND", "pallas")
    # GOLDEN_SUFFIX=_16spp selects the extended 8-frame golden
    # (tools/extend_golden.py) — the VERDICT r4 #5 convergence row
    suffix = os.environ.get("GOLDEN_SUFFIX", "")
    golden = np.load(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "golden",
            f"wgsl_reference_{gsize}x{gsize}{suffix}.npz",
        )
    )
    g_img = golden["image"]
    size = g_img.shape[0]
    settings = RenderSettings(
        width=size, height=size, environment="equirect",
        sample_count=1, bounces_depth=4, traversal=backend,
    )
    # PARITY_OPTS="exact_pairs=1,chained_sort=0" style overrides
    for item in filter(None, os.environ.get("PARITY_OPTS", "").split(",")):
        name, _, val = item.partition("=")
        cur = getattr(settings, name)
        settings = settings.replace(
            **{name: type(cur)(int(val) if not isinstance(cur, str) else val)}
        )
    scene = load_scene(
        "/root/reference/assets/raytraced-scene.obj",
        "/root/reference/assets/raytraced-scene.mtl",
    )
    r = Renderer(scene, settings, env_data=synthetic_equirect())
    for seed in golden["seeds"]:
        r.step(seed=int(seed))
    ours = np.asarray(r.buffers.image)
    a = ours[..., :3] / np.maximum(ours[..., 3:4], 1e-20)
    b = g_img[..., :3] / np.maximum(g_img[..., 3:4], 1e-20)
    diff = np.abs(a - b).max(axis=-1)
    print(
        json.dumps(
            {
                "what": f"{backend}+adjudication vs WGSL-sim golden",
                "size": size,
                "spp": float(g_img[..., 3].mean()),
                "rmse": round(float(np.sqrt(np.mean((a - b) ** 2))), 5),
                "bit_identical": int((diff == 0).sum()),
                "pixels": int(diff.size),
                "mismatched": int((diff > 1e-6).sum()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

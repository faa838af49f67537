"""Cross-implementation parity: the framework vs the WGSL-semantics
simulator (validation/wgsl_sim.py — a scalar transliteration of the
reference megakernel, render.ts:1434-1509).

Two layers of evidence:

* a LIVE 12x12 run of the simulator against the framework's renderer on
  the bundled scene (same seeds, equal spp) — RMSE must beat the
  north-star bar of 1e-2 (BASELINE.md);
* the checked-in 48x48 golden (tools/make_reference_golden.py) against
  the renderer, same bar, more pixels.
"""

import os

import numpy as np
import pytest

from webgpu_raytracing_tpu.camera import Camera
from webgpu_raytracing_tpu.config import RenderSettings
from webgpu_raytracing_tpu.models.scene import load_scene
from webgpu_raytracing_tpu.renderer import Renderer


OBJ = "/root/reference/assets/raytraced-scene.obj"
MTL = "/root/reference/assets/raytraced-scene.mtl"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "wgsl_reference_48x48.npz")


def synthetic_equirect(h=64, w=128):
    """Deterministic stand-in for the reference's 4k EXR skybox (the asset
    isn't bundled in this environment): a smooth sky gradient with a bright
    sun patch, shared verbatim by both implementations — exercising the
    identical equirect nearest-texel fetch path (render.ts:932-940)."""
    ys = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    xs = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
    r = 0.4 + 0.5 * ys + 0.05 * np.sin(xs * 12.0)
    g = 0.5 + 0.4 * ys + 0.05 * np.cos(xs * 7.0)
    b = 0.8 + 0.2 * ys
    img = np.stack(
        [np.broadcast_to(c, (h, w)) for c in (r, g, b)], axis=-1
    ).astype(np.float32)
    sun = np.exp(
        -(((ys - 0.75) * 8.0) ** 2 + ((xs - 0.3) * 8.0) ** 2)
    ).astype(np.float32)
    return img + 20.0 * sun[..., None] * np.array([1.0, 0.9, 0.7], np.float32)

pytestmark = pytest.mark.skipif(
    not os.path.exists(OBJ), reason="reference assets unavailable"
)


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


# Bit-identity claims vs the scalar WGSL simulator pin chained_sort=False:
# chained segment sorting is PROVEN a pure per-lane reordering at the
# integrator level (tests/test_chained_sort.py, exact equality), but a
# different compiled frame graph lets XLA make different fusion/FMA
# choices in the unprotected parts of the color chain — ~1-ulp noise on a
# few % of pixels. These tests establish SEMANTIC equivalence with the
# reference, so they run the fusion-stable configuration; the production
# path's closeness is separately bounded by the RMSE assertions (which
# 1-ulp noise cannot move) and by tools/parity_tpu.py on hardware.
_PIN = {"chained_sort": False}


def _render_repo(size, seeds, env):
    settings = RenderSettings(
        width=size, height=size, environment="equirect",
        sample_count=1, bounces_depth=4, **_PIN,
    )
    scene = load_scene(OBJ, MTL)
    r = Renderer(scene, settings, env_data=env)
    for seed in seeds:
        r.step(seed=seed)
    return np.asarray(r.buffers.image)


def _normalized(img):
    return img[..., :3] / np.maximum(img[..., 3:4], 1e-20)


@pytest.fixture(scope="module")
def env():
    return synthetic_equirect()


def test_live_sim_vs_renderer_rmse(env):
    from webgpu_raytracing_tpu.validation.wgsl_sim import WGSLReference

    size, seeds = 12, [777]
    settings = RenderSettings(
        width=size, height=size, environment="equirect",
        sample_count=1, bounces_depth=4, **_PIN,
    )
    scene = load_scene(OBJ, MTL)
    sim = WGSLReference(scene, settings, env)
    sim.step(seeds[0], Camera().view_matrix())

    ours = _render_repo(size, seeds, env)
    # equal spp per pixel by construction
    np.testing.assert_array_equal(ours[..., 3], sim.image[..., 3])
    rmse = _rmse(_normalized(ours), _normalized(sim.image))
    assert rmse <= 1e-2, f"cross-implementation RMSE {rmse}"


@pytest.mark.parametrize(
    "mode",
    [
        {"projection_type": "PERSPECTIVE"},
        {"projection_type": "FISHEYE"},
        {"projection_type": "ORTHOGRAPHIC"},
        {"circle_of_confusion": 0.15, "focus_distance": 3.0},
        {"shading_type": "FLAT"},
        {"fov_orientation": "VERTICAL"},
    ],
    ids=["pinhole", "fisheye", "ortho", "thin-lens", "flat", "fov-vert"],
)
def test_live_sim_vs_renderer_rmse_modes(env, mode):
    """Cross-implementation parity beyond the default camera: each
    projection (render.ts:653-729) and the thin-lens DoF path
    (render.ts:695-702, 740-747) against the WGSL-semantics simulator."""
    from webgpu_raytracing_tpu.config import ProjectionType
    from webgpu_raytracing_tpu.validation.wgsl_sim import WGSLReference

    from webgpu_raytracing_tpu.config import FovOrientation, ShadingType

    kw = dict(mode)
    if "projection_type" in kw:
        kw["projection_type"] = ProjectionType[kw["projection_type"]]
    if "shading_type" in kw:
        kw["shading_type"] = ShadingType[kw["shading_type"]]
    if "fov_orientation" in kw:
        kw["fov_orientation"] = FovOrientation[kw["fov_orientation"]]
    size, seeds = 12, [4242 + 17 * k for k in range(4)]
    settings = RenderSettings(
        width=size, height=size, environment="equirect",
        sample_count=1, bounces_depth=4, **_PIN, **kw,
    )
    scene = load_scene(OBJ, MTL)
    sim = WGSLReference(scene, settings, env)
    r = Renderer(scene, settings, env_data=env)
    for seed in seeds:
        sim.step(seed, Camera().view_matrix())
        r.step(seed=seed)
    ours = np.asarray(r.buffers.image)
    np.testing.assert_array_equal(ours[..., 3], sim.image[..., 3])
    # Primary rays go through unjittered pixel centers in BOTH
    # implementations (render.ts:1464), so a silhouette-edge center whose
    # f32 intersection decision flips between the two repeats its flip
    # every frame and never averages out — on a 144-pixel crop one such
    # pixel alone breaks a global-RMSE bar that the 48x48 golden meets.
    # The honest per-mode assertion is the isolation claim itself:
    # decision flips hit at most ~1% of pixels, and everywhere else the
    # two implementations accumulate bit-identically.
    diff = (
        np.abs(_normalized(ours) - _normalized(sim.image)).max(axis=-1)
        > 1e-5
    )
    assert diff.mean() <= 0.02, f"{mode}: {diff.sum()} differing pixels"
    np.testing.assert_array_equal(
        np.asarray(ours)[~diff], sim.image[~diff],
        err_msg=f"{mode}: non-edge pixels must accumulate bit-identically",
    )


def test_golden_vs_renderer_rmse(env):
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated")
    z = np.load(GOLDEN)
    size = int(z["size"][0])
    ours = _render_repo(size, [int(s) for s in z["seeds"]], env)
    np.testing.assert_array_equal(ours[..., 3], z["image"][..., 3])
    rmse = _rmse(_normalized(ours), _normalized(z["image"]))
    assert rmse <= 1e-2, f"cross-implementation RMSE vs golden {rmse}"


def test_golden_vs_real_kernel(env):
    """The PRODUCTION kernel path (pallas_interpret = the real Mosaic
    kernel under the interpreter) at the r3 perf defaults — plain bf16x3
    single-best rounds, NO exact adjudication, source-face-duplicate
    exclusion — against the WGSL-semantics golden. Measured bit-identical
    when this landed (every decision the bf16x3 arithmetic made agreed
    with exact f32 on all 48²·4spp paths once self-face impostors were
    excluded); the assertion leaves headroom for a handful of true
    knife-edge flips so a future golden regeneration can't flake it,
    while still failing loudly on any systematic error class (the
    pre-exclusion failure measured RMSE 0.30 / 352 mismatched pixels).
    """
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated")
    z = np.load(GOLDEN)
    size = int(z["size"][0])
    settings = RenderSettings(
        width=size, height=size, environment="equirect",
        sample_count=1, bounces_depth=4, traversal="pallas_interpret",
        **_PIN,
    )
    assert not settings.exact_pairs, "test targets the plain-round default"
    scene = load_scene(OBJ, MTL)
    r = Renderer(scene, settings, env_data=env)
    for seed in z["seeds"]:
        r.step(seed=int(seed))
    ours = np.asarray(r.buffers.image)
    a, b = _normalized(ours), _normalized(z["image"])
    flipped = np.abs(a - b).max(axis=-1) > 1e-6
    mismatched = int(flipped.sum())
    rmse = _rmse(a, b)
    rmse_rest = _rmse(
        np.where(flipped[..., None], b, a), b
    )  # everything except the flipped pixels must be BITWISE clean
    # Three-part bar replacing the old `rmse <= 1e-3 and mismatched <= 5`
    # (r4): the deterministic trig/sqrt/product rewrites that close the
    # TPU↔CPU raygen divergence legitimately move XLA:CPU sampler draws
    # by 1 ulp (XLA:CPU trig is not correctly rounded; the det versions
    # are), which flips ONE knife-edge path on this golden (1/2304,
    # rmse 0.0073 — a single bright-path flip exceeds 1e-3 at 48² all
    # by itself). Decorrelated knife-edge flips are the anticipated
    # class; systematic error classes still fail loudly: the
    # pre-exclusion bug was 352 mismatched pixels (mismatched bar), and
    # any sub-threshold drift on agreeing pixels trips rmse_rest.
    assert rmse_rest <= 1e-7 and mismatched <= 5 and rmse <= 1e-2, (
        f"real-kernel parity regression: rmse {rmse} (rest {rmse_rest}), "
        f"{mismatched}/{a.shape[0] * a.shape[1]} mismatched"
    )

"""Small parity ops (interval K2, device mat4 inverse K13) + the
golden-image regression lock."""

import os

import numpy as np
import jax.numpy as jnp

from webgpu_raytracing_tpu.ops import interval
from webgpu_raytracing_tpu.ops.matrix import mat4_inverse

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_interval_semantics():
    a = jnp.asarray(np.array([0.0, 2.0, 5.0]))
    b = jnp.asarray(np.array([1.0, 3.0, 6.0]))
    # reference OR-quirk: almost always true
    assert bool(interval.overlap(0.0, 1.0, 2.0, 3.0))  # disjoint but True!
    assert not bool(interval.overlap_correct(0.0, 1.0, 2.0, 3.0))
    assert bool(interval.overlap_correct(0.0, 2.5, 2.0, 3.0))
    assert bool(interval.contains(0.0, 1.0, 1.0))
    assert not bool(interval.surrounds(0.0, 1.0, 1.0))  # strict
    np.testing.assert_allclose(
        np.asarray(interval.clamp(a, b, jnp.asarray([-1.0, 2.5, 9.0]))),
        [0.0, 2.5, 6.0],
    )


def test_mat4_inverse_matches_linalg():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(5, 4, 4)).astype(np.float32)
    m += np.eye(4, dtype=np.float32) * 3.0
    inv = np.asarray(mat4_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(inv, np.linalg.inv(m), rtol=1e-4, atol=1e-5)


def test_golden_image_regression():
    """Behavior lock: a fixed-seed 2-frame render of the mini scene must
    reproduce the blessed accumulation buffer exactly (CPU backend)."""
    from webgpu_raytracing_tpu.config import RenderSettings
    from webgpu_raytracing_tpu.models.scene import scene_from_facesets
    from webgpu_raytracing_tpu.models.test_models import (
        ground_plane,
        uv_sphere,
    )
    from webgpu_raytracing_tpu.renderer import Renderer

    scene = scene_from_facesets(
        [
            ("light", uv_sphere((0, 3, -4), 0.5, material_idx=1, lat=4, lon=6)),
            ("sphere", uv_sphere((0, 0, -4), 1.0, lat=6, lon=8)),
            ("plane", ground_plane(-1.5, 8.0)),
        ],
        np.array([[0.8, 0.4, 0.3], [0, 0, 0]], np.float32),
        np.array([[0, 0, 0], [6, 6, 6]], np.float32),
    )
    st = RenderSettings(
        width=32, height=32, bounces_depth=3, sample_count=1,
        environment="procedural", traversal="clustered",
    )
    r = Renderer(scene, st, base_seed=77)
    r.step()
    r.step()
    golden = np.load(os.path.join(GOLDEN, "mini_scene_2f.npz"))["image"]
    got = np.asarray(r.buffers.image)
    rmse = float(np.sqrt(np.mean((got - golden) ** 2)))
    assert rmse < 1e-5, rmse


def test_debug_bvh_wireframe_overlay():
    """K17: the debug wireframe rasterizes node boxes into the display
    image (render.ts:1517-1630)."""
    from webgpu_raytracing_tpu.config import ProjectionType, RenderSettings
    from webgpu_raytracing_tpu.models.scene import scene_from_facesets
    from webgpu_raytracing_tpu.models.test_models import uv_sphere
    from webgpu_raytracing_tpu.renderer import Renderer

    scene = scene_from_facesets(
        [("s", uv_sphere((0, 0, -4), 1.0, lat=6, lon=8))],
        np.ones((1, 3), np.float32) * 0.8,
        np.zeros((1, 3), np.float32),
    )
    st = RenderSettings(
        width=64, height=64, bounces_depth=2, sample_count=0,
        environment="black",
        projection_type=ProjectionType.PERSPECTIVE, fov=0.8,
    )
    r = Renderer(scene, st.replace(debug_bvh=True), base_seed=1)
    r.step()
    with_wire = r.image()
    r2 = Renderer(scene, st, base_seed=1)
    r2.step()
    without = r2.image()
    assert np.isfinite(with_wire).all()
    # the overlay must add visible energy along box edges
    assert with_wire.sum() > without.sum() + 1.0

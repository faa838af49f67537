"""resolution_scale / geometry_buffer_scale (store.ts:76-77,
render.ts:108-144, UI.tsx:184): scaled rendering with an upscaling blit,
and the G-buffer allocation multiplier with robust-access semantics."""

import numpy as np
import jax.numpy as jnp

from webgpu_raytracing_tpu.config import RenderSettings
from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import ground_plane, uv_sphere
from webgpu_raytracing_tpu.renderer import Renderer


def _mini_scene():
    return scene_from_facesets(
        [
            ("light", uv_sphere((0, 3, -4), 0.5, material_idx=1, lat=4, lon=6)),
            ("sphere", uv_sphere((0, 0, -4), 1.0, lat=6, lon=8)),
            ("plane", ground_plane(-1.5, 8.0)),
        ],
        np.array([[0.8, 0.4, 0.3], [0, 0, 0]], np.float32),
        np.array([[0, 0, 0], [6, 6, 6]], np.float32),
    )


BASE = RenderSettings(
    width=32, height=32, bounces_depth=2, sample_count=0,
    environment="procedural",
)


def test_resolution_scale_quarters_rays():
    """0.5x scale renders a quarter of the pixels — the perf knob the
    reference exposes in its UI (UI.tsx:184)."""
    scene = _mini_scene()
    full = Renderer(scene, BASE, base_seed=3)
    half = Renderer(scene, BASE.replace(resolution_scale=0.5), base_seed=3)
    full.step()
    half.step()
    assert half.buffers.image.shape == (16, 16, 4)
    assert half.last_rays * 4 == full.last_rays
    # the display image is upscaled back to the full size
    img = half.image()
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # content survives the downscale/upscale round trip (same scene,
    # top = sky-ish, not all-equal garbage)
    assert img.std() > 1e-3


def test_resolution_scale_settings_change_recreates_buffers():
    r = Renderer(_mini_scene(), BASE, base_seed=3)
    r.step()
    r.update_settings(resolution_scale=0.5)
    assert r.buffers.image.shape == (16, 16, 4)
    assert r.counter == 0  # reset-on-change (store.ts:197-199)
    r.step()
    assert r.image().shape == (32, 32, 3)


def test_geometry_buffer_scale_allocation_and_render():
    """geometry_buffer_scale sizes only the G-buffer (render.ts:144);
    0.5 halves its rows, rendering stays finite and deterministic with
    the predictor + reprojection reading the short buffer."""
    scene = _mini_scene()
    s = BASE.replace(
        geometry_buffer_scale=0.5,
        reprojection_rate=2,
        jitter_strength=1.0,
        use_hit_predictor=True,
    )
    r = Renderer(scene, s, base_seed=5)
    assert r.buffers.geo_face.shape == (16, 32)
    assert r.buffers.image.shape == (32, 32, 4)
    for _ in range(3):
        r.step()
    img = r.image()
    assert np.isfinite(img).all()
    r2 = Renderer(scene, s, base_seed=5)
    for _ in range(3):
        r2.step()
    np.testing.assert_array_equal(img, r2.image())
    # rows below the allocation never get G-buffer data
    assert (np.asarray(r.buffers.prev_geo_face) != -2).all()


def test_geometry_buffer_scale_above_one_is_unused_padding():
    """> 1 allocates more rows; the extra rows are never read (the
    reference's unused padding) so the image equals the gbs=1 image."""
    scene = _mini_scene()
    a = Renderer(scene, BASE, base_seed=9)
    b = Renderer(scene, BASE.replace(geometry_buffer_scale=2.0), base_seed=9)
    a.step()
    b.step()
    np.testing.assert_array_equal(a.image(), b.image())

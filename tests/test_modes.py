"""Mode-matrix coverage: blit views, shading types, projections, lens
shapes, tonemaps — each exercised through the full renderer pipeline."""

import numpy as np
import pytest

from webgpu_raytracing_tpu.config import (
    BlitView,
    LensShape,
    ProjectionType,
    RenderSettings,
    ShadingType,
    Tonemapping,
)
from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import ground_plane, uv_sphere
from webgpu_raytracing_tpu.renderer import Renderer


def _scene():
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
    width=16, height=16, bounces_depth=2, sample_count=0,
    environment="procedural",
)


@pytest.mark.parametrize(
    "proj",
    [
        ProjectionType.PERSPECTIVE,
        ProjectionType.PANINI,
        ProjectionType.FISHEYE,
        ProjectionType.ORTHOGRAPHIC,
    ],
)
def test_projections_render(proj):
    r = Renderer(_scene(), BASE.replace(projection_type=proj), base_seed=1)
    r.step()
    img = r.image()
    assert np.isfinite(img).all()
    assert img.std() > 0.01  # something visible


@pytest.mark.parametrize("shading", [ShadingType.FLAT, ShadingType.PHONG])
def test_shading_types(shading):
    r = Renderer(_scene(), BASE.replace(shading_type=shading), base_seed=1)
    r.step()
    assert np.isfinite(r.image()).all()


@pytest.mark.parametrize("lens", [LensShape.CIRCLE, LensShape.SQUARE])
def test_lens_shapes_with_dof(lens):
    st = BASE.replace(lens_shape=lens, circle_of_confusion=0.05)
    r = Renderer(_scene(), st, base_seed=1)
    r.step()
    assert np.isfinite(r.image()).all()


@pytest.mark.parametrize(
    "tm",
    [Tonemapping.REINHARD, Tonemapping.FILMIC, Tonemapping.ACES,
     Tonemapping.LOTTES, Tonemapping.NONE],
)
def test_tonemaps_through_blit(tm):
    r = Renderer(_scene(), BASE.replace(tonemapping=tm), base_seed=1)
    r.step()
    img = r.image()
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0


@pytest.mark.parametrize(
    "view", [BlitView.IMAGE, BlitView.PREV_IMAGE, BlitView.NORMALS,
             BlitView.DEPTH]
)
def test_blit_views(view):
    """Blit buffer selector (render.ts:194-218). prevImage shows the
    rotated history; depth views map to rgb/w like the reference (its
    depth branches are commented out)."""
    r = Renderer(_scene(), BASE.replace(blit_view=view), base_seed=1)
    r.step()
    r.step()
    img = r.image()
    assert np.isfinite(img).all()


def test_exposure_and_gamma_applied():
    a = Renderer(_scene(), BASE.replace(exposure=1.0), base_seed=1)
    b = Renderer(_scene(), BASE.replace(exposure=4.0), base_seed=1)
    a.step()
    b.step()
    assert b.image().mean() > a.image().mean()
    c = Renderer(_scene(), BASE.replace(gamma=2.2), base_seed=1)
    c.step()
    assert np.isfinite(c.image()).all()


def test_render_to_spp_helper():
    st = BASE.replace(sample_count=1)  # 2 samples per frame
    r = Renderer(_scene(), st, base_seed=1)
    r.render(spp=6)
    assert r.counter == 3
    buf = np.asarray(r.buffers.image)
    assert (buf[..., 3] == 6.0).all()

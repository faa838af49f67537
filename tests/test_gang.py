"""Miss-tail gang rounds (ops/cluster_pallas.py ``gang``): the heaviest
tiles by shortlist-union size run gang-of-K cluster rounds. Results must
match the exact oracle under exact_pairs (the adjudication erases the
coarser t-truncation the wider slot code introduces) and keep hit flags
without it."""

import numpy as np
import pytest
import jax.numpy as jnp

from webgpu_raytracing_tpu.config import F32_MAX, RenderSettings
from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import ground_plane, uv_sphere
from webgpu_raytracing_tpu.ops.cluster_pallas import (
    trace_closest_clustered_pallas,
)
from webgpu_raytracing_tpu.ops.traverse import trace_closest


@pytest.fixture(scope="module")
def gang_scene():
    scene = scene_from_facesets(
        [
            ("light", uv_sphere((0, 3, -4), 0.5, material_idx=1, lat=4, lon=6)),
            ("sphere", uv_sphere((0, 0, -4), 1.0, lat=10, lon=14)),
            ("plane", ground_plane(-1.5, 8.0)),
        ],
        np.array([[0.8, 0.4, 0.3], [0, 0, 0]], np.float32),
        np.array([[0, 0, 0], [6, 6, 6]], np.float32),
    )
    tables = scene.tables()
    rng = np.random.default_rng(11)
    n = 1024  # several tiles at tile=128, mixed hit/miss/dead lanes
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 2] = rng.uniform(0, 2, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.full((n,), F32_MAX, np.float32)
    t_max[::7] = 0.0  # dead lanes (the wavefront-compaction shape)
    return tables, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max)


@pytest.mark.parametrize("gang", [2, 4])
def test_gang_pairs_matches_oracle(gang_scene, gang):
    tables, o, d, t_max = gang_scene
    ref = trace_closest(o, d, t_max, tables)
    pk = trace_closest_clustered_pallas(
        o, d, t_max, tables, tile=128, interpret=True,
        exact_pairs=True, gang=gang, gang_frac=4,
    )
    np.testing.assert_array_equal(np.asarray(pk.face), np.asarray(ref.face))
    hits = np.asarray(ref.face) >= 0
    np.testing.assert_allclose(
        np.asarray(pk.t)[hits], np.asarray(ref.t)[hits], rtol=1e-6
    )


def test_gang_setting_renders_identically():
    """Full-frame render through the settings plumbing: trace_gang
    changes only candidate-evaluation order — with exact_pairs the image
    must be bit-identical to the ungated kernel."""
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
    base = RenderSettings(
        width=32, height=32, bounces_depth=2, sample_count=0,
        environment="procedural", traversal="pallas_interpret",
        trace_tile=128,
    )
    a = Renderer(scene, base, base_seed=3)
    b = Renderer(
        scene, base.replace(trace_gang=4, trace_gang_frac=2), base_seed=3
    )
    a.step()
    b.step()
    np.testing.assert_array_equal(a.image(), b.image())

"""Shadow-terminator any-hit check (ADVICE r2 #3).

The Pallas kernel's packed (t | slot) keys narrow hit acceptance by one
truncation bucket at the t_max boundary (ops/cluster_pallas.py:95-101):
a shadow-ray occluder whose t falls in the same 2^-sl_bits-relative
bucket as the light's own distance can read as unoccluded. These tests
pin down that the leak window is EXACTLY that knife edge — any occluder
even slightly inside the light distance is still seen — so no visible
light leak is possible from geometry that isn't touching the light.

Reference semantics: rayIntersectBVHAnyHit with interval (0, t_max)
(render.ts:468-480); a WGSL exact compare resolves the same knife edge
arbitrarily via f32 rounding of t itself.
"""

import numpy as np
import jax.numpy as jnp

from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import ground_plane, make_model
from webgpu_raytracing_tpu.ops.cluster_pallas import (
    trace_closest_clustered_pallas,
)
from webgpu_raytracing_tpu.ops.traverse import trace_any


def _occluder_quad(z: float, half: float = 4.0):
    """Two-triangle quad in the z=const plane, facing +z (single-sided:
    rays travelling -z hit the front face)."""
    v = np.array(
        [
            [-half, -half, z],
            [half, -half, z],
            [half, half, z],
            [-half, half, z],
        ],
        np.float32,
    )
    # winding chosen so Möller–Trumbore backface culling keeps -z rays
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return make_model(v, idx)


def _shadow_scene(z_occluder: float):
    return scene_from_facesets(
        [
            ("occluder", _occluder_quad(z_occluder)),
            ("floor", ground_plane(-6.0, 8.0)),
        ],
        np.ones((1, 3), np.float32) * 0.8,
        np.zeros((1, 3), np.float32),
    )


def _shadow_rays(rng_np, n=256, t_light=2.0):
    """Rays from a z=0 grid straight down -z toward a light at z=-t_light."""
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng_np.uniform(-2, 2, n)
    o[:, 1] = rng_np.uniform(-2, 2, n)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    tmax = np.full((n,), t_light, np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax)


def _kernel_occluded(o, d, tmax, tables, gang):
    hit = trace_closest_clustered_pallas(
        o, d, tmax, tables, tile=128, interpret=True, any_hit=True,
        gang=gang, gang_frac=1,
    )
    return np.asarray(hit.face) >= 0


def test_occluder_inside_light_distance_always_occludes(rng_np):
    """Occluders at 0.5x, 0.999x and 1-1e-4 of the light distance (all
    outside the truncation bucket) must occlude every shadow ray on the
    real kernel, with and without gang rounds."""
    t_light = 2.0
    for frac in (0.5, 0.999, 1.0 - 1e-4):
        scene = _shadow_scene(-frac * t_light)
        tables = scene.tables()
        o, d, tmax = _shadow_rays(rng_np, t_light=t_light)
        ref = np.asarray(trace_any(o, d, tmax, tables))
        assert ref.all(), "oracle sanity: every ray passes the occluder"
        for gang in (0, 4):
            got = _kernel_occluded(o, d, tmax, tables, gang)
            np.testing.assert_array_equal(got, ref), (frac, gang)


def test_knife_edge_leak_confined_to_truncation_bucket(rng_np):
    """An occluder INSIDE the same packed-key truncation bucket as t_max
    may read unoccluded — assert any divergence from the oracle is
    confined to rays whose true hit t shares t_max's truncated key
    (documented knife edge, cluster_pallas.py:95-101)."""
    t_light = 2.0
    # 2^-18 relative: inside the gang=4 bucket (sl_bits=9 -> ~2^-15)
    scene = _shadow_scene(-(1.0 - 2.0**-18) * t_light)
    tables = scene.tables()
    o, d, tmax = _shadow_rays(rng_np, t_light=t_light)
    ref = np.asarray(trace_any(o, d, tmax, tables))
    assert ref.all()
    for gang, sl_bits in ((0, 7), (4, 9)):
        got = _kernel_occluded(o, d, tmax, tables, gang)
        leaked = ref & ~got
        # the true t here IS the occluder distance along -z
        t_true = np.float32((1.0 - 2.0**-18) * t_light)
        key_t = np.float32(t_true).view(np.int32) >> sl_bits
        key_max = np.float32(t_light).view(np.int32) >> sl_bits
        if key_t != key_max:
            assert not leaked.any(), (gang, int(leaked.sum()))
        # else: leak allowed (knife edge) — nothing to assert beyond
        # the previous test's guarantee outside the bucket

"""Intersection + traversal correctness: Möller–Trumbore against hand
values, slab test, and BVH traversal vs brute force (the oracle the
reference never had)."""

import numpy as np
import jax.numpy as jnp

from webgpu_raytracing_tpu.config import F32_MAX
from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import (
    ground_plane,
    unit_cube_model,
    uv_sphere,
)
from webgpu_raytracing_tpu.ops.intersect import ray_aabb, ray_triangle
from webgpu_raytracing_tpu.ops.traverse import trace_any, trace_closest


def _tri_args(o, d, p0, e1, e2):
    f = lambda x: jnp.asarray(np.array(x, np.float32).reshape(1, 3))
    return f(o), f(d), f(p0), f(e1), f(e2)


def test_triangle_frontal_hit():
    # unit triangle in z=0 plane, CCW normal +z. A face is visible when the
    # ray direction opposes its normal (det = dot(d, -n) > 0), so a ray
    # from z=+1 looking -z hits the front.
    o, d, p0, e1, e2 = _tri_args(
        [0.2, 0.2, 1], [0, 0, -1], [0, 0, 0], [1, 0, 0], [0, 1, 0]
    )
    h = ray_triangle(o, d, p0, e1, e2, 0.0, F32_MAX)
    assert bool(h.hit[0])
    assert float(h.t[0]) == 1.0
    assert abs(float(h.u[0]) - 0.2) < 1e-6
    assert abs(float(h.v[0]) - 0.2) < 1e-6


def test_triangle_backface_culled():
    """det < EPSILON² rejects backfaces (render.ts:378-382): a ray
    traveling along the normal (+z) sees the back side → culled."""
    o, d, p0, e1, e2 = _tri_args(
        [0.2, 0.2, -1], [0, 0, 1], [0, 0, 0], [1, 0, 0], [0, 1, 0]
    )
    h = ray_triangle(o, d, p0, e1, e2, 0.0, F32_MAX)
    assert not bool(h.hit[0])


def test_triangle_outside_barycentric():
    o, d, p0, e1, e2 = _tri_args(
        [0.9, 0.9, 1], [0, 0, -1], [0, 0, 0], [1, 0, 0], [0, 1, 0]
    )
    h = ray_triangle(o, d, p0, e1, e2, 0.0, F32_MAX)
    assert not bool(h.hit[0])


def test_triangle_interval_strict():
    """intervalSurrounds is strict: t == t_max rejected (render.ts:401)."""
    o, d, p0, e1, e2 = _tri_args(
        [0.2, 0.2, 1], [0, 0, -1], [0, 0, 0], [1, 0, 0], [0, 1, 0]
    )
    h = ray_triangle(o, d, p0, e1, e2, 0.0, 1.0)
    assert not bool(h.hit[0])
    h2 = ray_triangle(o, d, p0, e1, e2, 0.0, 1.0 + 1e-5)
    assert bool(h2.hit[0])


def test_aabb_basic():
    o = jnp.asarray(np.array([[0, 0, -5]], np.float32))
    inv_d = 1.0 / jnp.asarray(np.array([[0, 0, 1]], np.float32))
    bmin = jnp.asarray(np.array([[-1, -1, -1]], np.float32))
    bmax = jnp.asarray(np.array([[1, 1, 1]], np.float32))
    hit, near = ray_aabb(o, inv_d, bmin, bmax, jnp.asarray([F32_MAX]))
    assert bool(hit[0])
    assert abs(float(near[0]) - 4.0) < 1e-6


def test_aabb_behind_ray_rejected():
    o = jnp.asarray(np.array([[0, 0, 5]], np.float32))
    inv_d = 1.0 / jnp.asarray(np.array([[0, 0, 1]], np.float32))
    bmin = jnp.asarray(np.array([[-1, -1, -1]], np.float32))
    bmax = jnp.asarray(np.array([[1, 1, 1]], np.float32))
    hit, _ = ray_aabb(o, inv_d, bmin, bmax, jnp.asarray([F32_MAX]))
    assert not bool(hit[0])


def _brute_force_closest(o, d, tri):
    """Reference oracle: test every triangle, keep the nearest hit."""
    r = o.shape[0]
    best_t = np.full(r, F32_MAX, np.float32)
    best_face = np.full(r, -1, np.int32)
    best_u = np.zeros(r, np.float32)
    best_v = np.zeros(r, np.float32)
    for fi in range(tri.shape[0]):
        row = jnp.broadcast_to(tri[fi], (r, 9))
        h = ray_triangle(
            o, d, row[:, 0:3], row[:, 3:6], row[:, 6:9], 0.0,
            jnp.asarray(best_t),
        )
        hit = np.asarray(h.hit)
        best_u = np.where(hit, np.asarray(h.u), best_u)
        best_v = np.where(hit, np.asarray(h.v), best_v)
        best_t = np.where(hit, np.asarray(h.t), best_t)
        best_face = np.where(hit, fi, best_face)
    return best_t, best_u, best_v, best_face


def _test_scene():
    sets = [
        ("sphere", uv_sphere((0, 0, -4), 1.0, lat=6, lon=8)),
        ("plane", ground_plane(-1.5, 8.0)),
        ("cube", unit_cube_model()),
    ]
    return scene_from_facesets(
        sets, np.ones((1, 3), np.float32) * 0.8, np.zeros((1, 3), np.float32)
    )


def test_traversal_matches_brute_force(rng_np):
    scene = _test_scene()
    tables = scene.tables()
    n = 512
    o = rng_np.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 2] = rng_np.uniform(0, 2, n)
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((n,), F32_MAX, jnp.float32)

    hit = trace_closest(oj, dj, tmax, tables)
    bt, bu, bv, bf = _brute_force_closest(oj, dj, tables.tri)

    np.testing.assert_array_equal(np.asarray(hit.face), bf)
    hits = bf >= 0
    np.testing.assert_allclose(
        np.asarray(hit.t)[hits], bt[hits], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hit.u)[hits], bu[hits], rtol=1e-4, atol=1e-6
    )
    assert hits.sum() > 20  # the test must actually exercise hits


def test_trace_any_matches_closest(rng_np):
    scene = _test_scene()
    tables = scene.tables()
    n = 256
    o = rng_np.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = jnp.full((n,), F32_MAX, jnp.float32)
    closest = trace_closest(jnp.asarray(o), jnp.asarray(d), tmax, tables)
    any_hit = trace_any(jnp.asarray(o), jnp.asarray(d), tmax, tables)
    np.testing.assert_array_equal(
        np.asarray(any_hit), np.asarray(closest.face) >= 0
    )


def test_trace_respects_tmax():
    scene = _test_scene()
    tables = scene.tables()
    o = jnp.asarray(np.array([[0, 0, 0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, -1]], np.float32))
    far = trace_closest(o, d, jnp.asarray([F32_MAX]), tables)
    assert int(far.face[0]) >= 0
    t = float(far.t[0])
    near = trace_closest(o, d, jnp.asarray([t * 0.5], dtype=jnp.float32), tables)
    assert int(near.face[0]) == -1


def test_inactive_lanes_do_no_work():
    scene = _test_scene()
    tables = scene.tables()
    o = jnp.asarray(np.array([[0, 0, 0], [0, 0, 0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, -1], [0, 0, -1]], np.float32))
    tmax = jnp.full((2,), F32_MAX, jnp.float32)
    active = jnp.asarray(np.array([True, False]))
    hit = trace_closest(o, d, tmax, tables, active=active)
    assert int(hit.face[0]) >= 0
    assert int(hit.face[1]) == -1

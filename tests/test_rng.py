"""RNG parity and sampler distribution tests.

The PCG hash (shaders/rng.ts:34-40) is re-derived here in pure Python
integer arithmetic as an independent oracle; the JAX implementation must
match it bit-for-bit. Sampler tests check ranges and first moments against
the analytic distributions (the pdf_inv family, rng.ts:133-167)."""

import numpy as np
import jax.numpy as jnp

from webgpu_raytracing_tpu.ops import rng

M32 = 0xFFFFFFFF


def pcg_ref(state: int):
    old = (state + 747796405 + 2891336453) & M32
    shift = ((old >> 28) + 4) & M32
    word = (((old >> shift) ^ old) * 277803737) & M32
    new = ((word >> 22) ^ word) & M32
    return new


def test_random_1u_matches_scalar_oracle():
    states = np.array([0, 1, 12345, 0xDEADBEEF, M32], dtype=np.uint32)
    out, new_state = rng.random_1u(jnp.asarray(states))
    expected = np.array([pcg_ref(int(s)) for s in states], dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(out), expected)
    np.testing.assert_array_equal(np.asarray(new_state), expected)


def test_sequence_matches_oracle():
    s = 42
    seq_ref = []
    for _ in range(10):
        s = pcg_ref(s)
        seq_ref.append(s)
    state = jnp.asarray(np.array([42], dtype=np.uint32))
    seq = []
    for _ in range(10):
        u, state = rng.random_1u(state)
        seq.append(int(np.asarray(u)[0]))
    assert seq == seq_ref


def test_random_1_range():
    state = jnp.asarray(np.arange(10_000, dtype=np.uint32))
    x, _ = rng.random_1(state)
    x = np.asarray(x)
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert abs(x.mean() - 0.5) < 0.02


def _draws(n, dims, seed=7):
    state = jnp.asarray(np.arange(n, dtype=np.uint32) * 2654435761 + seed)
    if dims == 2:
        t, _ = rng.random_2(state)
    else:
        t, _ = rng.random_3(state)
    return t


def test_sample_incircle_uniform():
    t = _draws(20_000, 2)
    p = np.asarray(rng.sample_incircle(t))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # mean radius of uniform disc = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 0.01
    assert abs(p.mean(axis=0)).max() < 0.02


def test_sample_sphere_uniform():
    t = _draws(20_000, 2)
    p = np.asarray(rng.sample_sphere(t))
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-4)
    assert abs(p.mean(axis=0)).max() < 0.03


def test_sample_hemisphere_faces_normal():
    t = _draws(5_000, 2)
    n = jnp.asarray(np.tile([0.0, 0.0, 1.0], (5_000, 1)).astype(np.float32))
    p = np.asarray(rng.sample_hemisphere(t, n))
    assert (p[:, 2] >= -1e-6).all()


def test_cosine_weighted_hemisphere_moments():
    t = _draws(40_000, 2)
    n = jnp.asarray(
        np.tile([0.0, 0.0, 1.0], (40_000, 1)).astype(np.float32)
    )
    p = np.asarray(rng.sample_cosine_weighted_hemisphere(t, n))
    # cosine-weighted: E[cos θ] = 2/3
    assert abs(p[:, 2].mean() - 2.0 / 3.0) < 0.01
    assert (p[:, 2] >= -1e-6).all()


def test_sample_intriangle_in_unit_triangle():
    t = _draws(10_000, 2)
    uv = np.asarray(rng.sample_intriangle(t))
    assert (uv >= 0).all()
    assert (uv.sum(axis=-1) <= 1.0 + 1e-6).all()
    # uniform over the triangle: E[u] = E[v] = 1/3
    assert abs(uv[:, 0].mean() - 1 / 3) < 0.01
    assert abs(uv[:, 1].mean() - 1 / 3) < 0.01


def test_masked_advance():
    state = jnp.asarray(np.array([1, 2, 3, 4], dtype=np.uint32))
    _, new = rng.random_1u(state)
    active = jnp.asarray(np.array([True, False, True, False]))
    merged = np.asarray(rng.masked_advance(state, new, active))
    expected = [pcg_ref(1), 2, pcg_ref(3), 4]
    np.testing.assert_array_equal(merged, np.array(expected, np.uint32))

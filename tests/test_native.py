"""Native runtime (C++ loader/BVH) equivalence tests: the ctypes path must
produce byte-identical results to the pure-Python reference path."""

import time

import numpy as np
import pytest

from webgpu_raytracing_tpu.models.bvh import build_bvh_python
from webgpu_raytracing_tpu.models.native import (
    build_bvh_native,
    get_lib,
    parse_obj_native,
)
from webgpu_raytracing_tpu.models.obj import parse_obj
from webgpu_raytracing_tpu.models.test_models import (
    ground_plane,
    unit_cube_model,
    uv_sphere,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


@pytest.mark.parametrize(
    "faceset",
    [
        unit_cube_model(),
        uv_sphere((1, -2, 5), 2.0, lat=10, lon=16),
        ground_plane(-1.0, 4.0),
    ],
    ids=["cube", "sphere", "plane"],
)
def test_bvh_native_matches_python(faceset):
    a = build_bvh_python(faceset)
    b = build_bvh_native(faceset)
    np.testing.assert_array_equal(a.node_min, b.node_min)
    np.testing.assert_array_equal(a.node_max, b.node_max)
    np.testing.assert_array_equal(a.right_idx, b.right_idx)
    np.testing.assert_array_equal(a.face0, b.face0)
    np.testing.assert_array_equal(a.face1, b.face1)
    np.testing.assert_array_equal(a.skip, b.skip)


def test_obj_native_matches_python(reference_assets):
    obj_path, _ = reference_assets
    with open(obj_path) as fh:
        py = parse_obj(fh.read())
    nat = parse_obj_native(obj_path)
    np.testing.assert_array_equal(py.vertices, nat.vertices)
    np.testing.assert_array_equal(py.normals, nat.normals)
    assert len(py.models) == len(nat.models)
    for pm, nm in zip(py.models, nat.models):
        assert pm.name == nm.name
        np.testing.assert_array_equal(pm.vertex_idx, nm.vertex_idx)
        np.testing.assert_array_equal(pm.normal_idx, nm.normal_idx)
        assert pm.material == nm.material


def test_bvh_native_large_and_faster():
    fs = uv_sphere((0, 0, 0), 1.0, lat=64, lon=128)  # ~16k faces
    t0 = time.perf_counter()
    nat = build_bvh_native(fs)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    py = build_bvh_python(fs)
    t_py = time.perf_counter() - t0
    np.testing.assert_array_equal(py.skip, nat.skip)
    # the native path is the 1M-triangle enabler; it should beat numpy
    # comfortably even at 16k faces
    assert t_nat < t_py, (t_nat, t_py)

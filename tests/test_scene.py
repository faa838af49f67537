"""Scene ingestion tests: MTL/OBJ parsing, two-sided face expansion, BVH
invariants (preorder layout, containment, coverage, threading)."""

import numpy as np
import pytest

from webgpu_raytracing_tpu.models.bvh import build_bvh, validate_bvh
from webgpu_raytracing_tpu.models.face import build_faces
from webgpu_raytracing_tpu.models.mtl import parse_mtl
from webgpu_raytracing_tpu.models.obj import parse_obj
from webgpu_raytracing_tpu.models.scene import (
    REFERENCE_SUBSET,
    load_scene,
    materials_from_mtl,
)
from webgpu_raytracing_tpu.models.test_models import (
    ground_plane,
    triangle_model,
    unit_cube_model,
    uv_sphere,
)

MTL_SNIPPET = """
# comment
newmtl Red
Ns 10.0
Ka 1 1 1
Kd 0.85 0.0 0.0
Ke 0 0 0
illum 1

newmtl Light
Kd 0.8 0.8 0.8
Ke 5 5 5
"""


def test_mtl_parse():
    mats = parse_mtl(MTL_SNIPPET)
    assert [m.name for m in mats] == ["Red", "Light"]
    assert mats[0].Kd == (0.85, 0.0, 0.0)
    assert mats[0].Ns == 10.0
    assert mats[0].illum == 1


def test_materials_light_special_case():
    """scene.ts:96-101: 'Light' forced to color 0 / emission (1,1,1)."""
    mats = parse_mtl(MTL_SNIPPET)
    color, emission, names = materials_from_mtl(mats)
    np.testing.assert_allclose(color[1], [0, 0, 0])
    np.testing.assert_allclose(emission[1], [1, 1, 1])
    np.testing.assert_allclose(color[0], [0.85, 0, 0])


OBJ_SNIPPET = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
o quad
usemtl Red
f 1//1 2//1 4//1 3//1
"""


def test_obj_parse_fan_triangulation():
    obj = parse_obj(OBJ_SNIPPET)
    assert len(obj.models) == 1
    m = obj.models[0]
    assert m.name == "quad"
    assert m.vertex_idx.shape == (2, 3)  # quad → 2 triangles
    assert m.material == ["Red", "Red"]
    np.testing.assert_array_equal(m.vertex_idx[0], [0, 1, 3])
    np.testing.assert_array_equal(m.vertex_idx[1], [0, 3, 2])


def test_build_faces_edge_vectors_and_backface():
    tris = np.array(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=np.float32
    )
    fs = build_faces(tris, None, np.zeros(1, np.int32), two_sided=True)
    assert len(fs) == 2
    # front face: e1 = p1-p0, e2 = p2-p0, n = +z
    np.testing.assert_allclose(fs.e1[0], [1, 0, 0])
    np.testing.assert_allclose(fs.e2[0], [0, 1, 0])
    np.testing.assert_allclose(fs.normal[0], [0, 0, 1])
    # backface interleaved right after: edges swapped, normals negated
    np.testing.assert_allclose(fs.e1[1], [0, 1, 0])
    np.testing.assert_allclose(fs.e2[1], [1, 0, 0])
    np.testing.assert_allclose(fs.normal[1], [0, 0, -1])
    np.testing.assert_allclose(fs.n0[1], -fs.n0[0])


def test_unit_cube_fixture_geometry():
    """The reference double-applies cubeModelMatrix (testModels.ts:54, 11)
    → scale 0.25 around z=-6."""
    fs = unit_cube_model()
    assert len(fs) == 12
    verts = np.concatenate(
        [fs.p0, fs.p0 + fs.e1, fs.p0 + fs.e2], axis=0
    )
    assert abs(verts[:, 2].mean() - (-6.0)) < 1e-5
    assert abs(verts[:, 0]).max() == pytest.approx(0.25, abs=1e-6)


def test_triangle_fixture():
    fs = triangle_model()
    assert len(fs) == 1
    np.testing.assert_allclose(fs.p0[0], [-0.5, -0.5, -2.0])


@pytest.mark.parametrize(
    "faceset",
    [
        unit_cube_model(),
        triangle_model(),
        uv_sphere((0, 0, -3), 1.0, lat=8, lon=12),
        ground_plane(-1.0, 5.0),
    ],
    ids=["cube", "tri", "sphere", "plane"],
)
def test_bvh_invariants(faceset):
    bvh = build_bvh(faceset)
    validate_bvh(bvh, faceset)
    # preorder: internal node's left child is the next node
    internal = bvh.right_idx >= 0
    assert (bvh.right_idx[internal] > np.nonzero(internal)[0]).all()
    # leaves hold 1-2 faces
    leaves = ~internal
    assert (bvh.face0[leaves] >= 0).all()


def test_bvh_root_contains_everything():
    fs = uv_sphere((2, -1, 5), 3.0, lat=10, lon=14)
    bvh = build_bvh(fs)
    verts = np.concatenate([fs.p0, fs.p0 + fs.e1, fs.p0 + fs.e2], axis=0)
    assert (verts >= bvh.node_min[0] - 1e-4).all()
    assert (verts <= bvh.node_max[0] + 1e-4).all()


def test_bvh_min_delta_padding():
    """bv.ts:54-61: axes thinner than 0.01 are padded."""
    fs = ground_plane(0.0, 1.0)  # flat in y
    bvh = build_bvh(fs)
    ext = bvh.node_max[0] - bvh.node_min[0]
    assert ext[1] >= 0.01 - 1e-7


def test_load_reference_scene(cornell_scene):
    s = cornell_scene
    assert len(s.models) == len(REFERENCE_SUBSET)
    assert s.models[0].name == "Light"  # model-0-is-light contract
    names = [m.name for m in s.models]
    assert names == [
        "Light",
        "Suzanne",
        "Floor",
        "TallBox",
        "left_wall",
        "Dodecahedron",
        "back_wall",
        "ceiling",
    ]
    # 22,278 triangles in the OBJ → each model two-sided
    total = sum(len(m.faces) for m in s.models)
    assert total % 2 == 0
    for m in s.models:
        validate_bvh(m.bvh, m.faces)


def test_scene_tables_threading(cornell_scene):
    t = cornell_scene.tables()
    n = t.n_nodes
    skip = np.asarray(t.node_meta[:, 0])
    assert (skip > np.arange(n)).all()
    assert (skip <= n).all()
    f0 = np.asarray(t.node_meta[:, 1])
    f1 = np.asarray(t.node_meta[:, 2])
    covered = np.concatenate([f0[f0 >= 0], f1[f1 >= 0]])
    assert len(np.unique(covered)) == t.n_faces

"""Stress-scene generator (BASELINE config #5: 1M-triangle scene).

Builds a grid of UV spheres plus a ground plane totalling approximately
the requested triangle count, with varied materials and one emissive
sphere as model 0 (the light contract). Generation is pure numpy; the
native BVH builder (runtime/loader.cpp) keeps build times in seconds at
the million-triangle scale."""

from __future__ import annotations

import numpy as np

from .scene import Scene, scene_from_facesets
from .test_models import ground_plane, uv_sphere


def stress_scene(n_triangles: int = 1_000_000, seed: int = 0) -> Scene:
    rng = np.random.default_rng(seed)
    # sphere tessellation: lat*lon quads ≈ 2*lat*lon tris
    lat, lon = 24, 48
    tris_per_sphere = 2 * lat * lon - 2 * lon
    n_spheres = max(1, (n_triangles - 2) // tris_per_sphere)
    side = int(np.ceil(np.sqrt(n_spheres)))

    mats_color = [(0.0, 0.0, 0.0)]
    mats_emission = [(8.0, 8.0, 8.0)]
    sets = [
        ("light", uv_sphere((0.0, float(side) + 4.0, 0.0), 1.5,
                            material_idx=0, lat=8, lon=12))
    ]
    k = 0
    for i in range(side):
        for j in range(side):
            if k >= n_spheres:
                break
            mats_color.append(tuple(rng.uniform(0.2, 0.9, 3)))
            mats_emission.append((0.0, 0.0, 0.0))
            center = (
                (i - side / 2) * 2.5 + rng.uniform(-0.3, 0.3),
                rng.uniform(0.8, 1.6),
                (j - side / 2) * 2.5 + rng.uniform(-0.3, 0.3),
            )
            sets.append(
                (
                    f"sphere_{k}",
                    uv_sphere(center, rng.uniform(0.5, 1.0),
                              material_idx=len(mats_color) - 1,
                              lat=lat, lon=lon),
                )
            )
            k += 1
    mats_color.append((0.7, 0.7, 0.7))
    mats_emission.append((0.0, 0.0, 0.0))
    sets.append(
        ("floor", ground_plane(0.0, side * 2.0,
                               material_idx=len(mats_color) - 1))
    )
    return scene_from_facesets(
        sets,
        np.array(mats_color, np.float32),
        np.array(mats_emission, np.float32),
    )

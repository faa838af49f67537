"""Live viewer: endpoints serve frames/stats, input events drive the
camera with reset-on-move semantics (index.tsx:19-28, controls.ts,
store.ts:192-344)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from webgpu_raytracing_tpu.config import RenderSettings
from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import ground_plane, uv_sphere
from webgpu_raytracing_tpu.renderer import Renderer


def _tiny_renderer():
    scene = scene_from_facesets(
        [
            ("light", uv_sphere((0, 4, -4), 0.8, material_idx=0, lat=6, lon=8)),
            ("plane", ground_plane(0.0, 10.0, material_idx=1)),
        ],
        np.array([[0, 0, 0], [0.7, 0.7, 0.7]], np.float32),
        np.array([[8, 8, 8], [0, 0, 0]], np.float32),
    )
    settings = RenderSettings(width=32, height=24, bounces_depth=2)
    return Renderer(scene, settings, base_seed=3)


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode())
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def test_viewer_serves_and_applies_input():
    from webgpu_raytracing_tpu.frontend.viewer import serve

    renderer = _tiny_renderer()
    t = threading.Thread(
        target=serve,
        kwargs=dict(renderer=renderer, port=18787, max_frames=500),
        daemon=True,
    )
    t.start()
    base = "http://127.0.0.1:18787"
    deadline = time.time() + 60
    png = b""
    while time.time() < deadline:
        try:
            png = _get(base + "/frame.png")
            if png:
                break
        except Exception:
            time.sleep(0.3)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    page = _get(base + "/")
    assert b"webgpu-raytracing-tpu" in page

    stats = json.loads(_get(base + "/stats.json"))
    assert stats["width"] == 32 and stats["height"] == 24
    assert stats["counter"] >= 1

    # camera look → rotation applied (then reset, like the store setters)
    q0 = np.array(renderer.camera.orientation, copy=True)
    _post(base + "/input", {"type": "look", "dx": 40.0, "dy": 0.0})
    deadline = time.time() + 30
    while time.time() < deadline:
        if not np.array_equal(np.array(renderer.camera.orientation), q0):
            break
        time.sleep(0.2)
    assert not np.array_equal(np.array(renderer.camera.orientation), q0)

    # key events route through Controls without error
    _post(base + "/input", {"type": "key", "key": "w", "down": True})
    _post(base + "/input", {"type": "key", "key": "w", "down": False})
    _post(base + "/input", {"type": "blur"})

    # settings panel: GET current values, POST changes (numeric + enum),
    # reject junk — the UI.tsx numeric/select-control analog
    spec = json.loads(_get(base + "/settings.json"))
    assert "fov" in spec and isinstance(spec["fov"]["value"], float)
    assert "options" in spec["tonemapping"]
    _post(base + "/input", {"type": "set", "name": "fov", "value": 1.25})
    _post(
        base + "/input",
        {"type": "set", "name": "tonemapping", "value": "aces"},
    )
    _post(base + "/input", {"type": "set", "name": "fov", "value": "junk"})
    _post(base + "/input", {"type": "set", "name": "width", "value": 1})
    # truthy junk must NOT flip a boolean; absurd floats must not kill
    # the loop (json parses 1e999 as Infinity -> OverflowError path)
    _post(
        base + "/input",
        {"type": "set", "name": "bilateral_filter", "value": "false"},
    )
    _post(
        base + "/input",
        {"type": "set", "name": "sample_count", "value": 1e999},
    )
    # both reference scale knobs are panel-settable (UI.tsx:170-187):
    # store.scale look divisor (controls.ts:56) + geometryBufferScale
    assert spec["scale"]["value"] == 1.0
    assert "geometry_buffer_scale" in spec
    _post(base + "/input", {"type": "set", "name": "scale", "value": 4.0})
    _post(
        base + "/input",
        {"type": "set", "name": "geometry_buffer_scale", "value": 2.0},
    )
    deadline = time.time() + 30
    while time.time() < deadline:
        if abs(renderer.settings.fov - 1.25) < 1e-6 and (
            renderer.settings.tonemapping.name == "ACES"
        ) and renderer.settings.geometry_buffer_scale == 2.0:
            break
        time.sleep(0.2)
    assert abs(renderer.settings.fov - 1.25) < 1e-6
    assert renderer.settings.geometry_buffer_scale == 2.0
    deadline = time.time() + 30
    spec2 = {}
    while time.time() < deadline:
        spec2 = json.loads(_get(base + "/settings.json"))
        if spec2["scale"]["value"] == 4.0:
            break
        time.sleep(0.2)
    assert spec2["scale"]["value"] == 4.0
    assert renderer.settings.tonemapping.name == "ACES"
    assert renderer.settings.width == 32  # non-panel field untouched
    assert renderer.settings.bilateral_filter is False  # junk rejected
    assert renderer.settings.sample_count == 1  # overflow ignored

    t.join(timeout=120)
    assert not t.is_alive()

"""Frontend/observability surface tests: CLI argument flows and the
metrics sink."""

import json
import os

import numpy as np
import pytest

from webgpu_raytracing_tpu.utils.timing import FrameMetrics, timed


def test_frame_metrics_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    m = FrameMetrics(path=path, smoothing=0.5)
    r1 = m.record(0.1, 1000.0, 2)
    r2 = m.record(0.2, 1000.0, 4)
    m.close()
    assert r1["frame"] == 1 and r2["frame"] == 2
    assert abs(r2["smoothed_ms"] - (0.5 * 100 + 0.5 * 200)) < 1e-6
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 2
    assert rows[1]["mrays_per_s"] == pytest.approx(0.005, rel=1e-3)


def test_timed_context(capsys):
    with timed("x"):
        pass
    out = capsys.readouterr().out
    row = json.loads(out)
    assert row["label"] == "x" and row["wall_s"] >= 0


def test_cli_render_and_compare(tmp_path):
    """End-to-end CLI: render a tiny analytic scene twice, compare."""
    from webgpu_raytracing_tpu.frontend.cli import main

    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    args = [
        "render", "--scene", "analytic", "--size", "16x16", "--spp", "1",
        "--bounces", "1", "--projection", "perspective", "--seed", "3",
        "--metrics", str(tmp_path / "m.jsonl"),
    ]
    main(args + ["-o", a])
    main(args + ["-o", b])
    assert os.path.exists(a)
    main(["compare", a, b])  # identical seeds → rmse 0
    from webgpu_raytracing_tpu.utils.image import read_image, rmse

    assert rmse(read_image(a), read_image(b)) == 0.0
    assert os.path.exists(str(tmp_path / "m.jsonl"))


def test_cli_missing_assets_message(tmp_path):
    from webgpu_raytracing_tpu.frontend.cli import main

    with pytest.raises(SystemExit, match="scene assets not found"):
        main([
            "render", "--obj", "/nonexistent.obj", "--mtl", "/nonexistent.mtl",
            "--size", "8x8", "--spp", "1",
        ])

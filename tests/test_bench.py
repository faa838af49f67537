"""bench.py is the driver's headline metric — smoke-test its full code
path (scene + cubemap env load, warmup, on-device ray accounting, JSON
output) at a tiny size on CPU so a refactor can't silently break it."""

import json
import os
import sys

import pytest

OBJ = "/root/reference/assets/raytraced-scene.obj"

pytestmark = pytest.mark.skipif(
    not os.path.exists(OBJ), reason="reference assets unavailable"
)


def test_bench_main_smoke(capsys):
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench

    # probe=False: the suite runs on CPU (forced via jax.config — the
    # env var still says 'axon'), and a probe subprocess would attach to
    # the real TPU, deadlocking any concurrent TPU session
    # full_spp_budget_s=0 keeps the smoke test at n_frames (the full
    # 256-spp accumulation is 128 frames — a measurement for the real
    # bench session, not a CPU smoke test)
    bench.main(
        width=64, height=48, n_frames=2, probe=False, full_spp_budget_s=0.0
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["unit"] == "Mrays/s"
    assert rec["value"] > 0
    assert rec["wall_clock_256spp_s"] > 0
    assert rec["vs_baseline"] == round(rec["value"] / 100.0, 4)
    assert rec["environment"] in ("cubemap", "procedural")

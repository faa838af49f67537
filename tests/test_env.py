"""Environment subsystem tests: importance-sampling distribution, MIS
unbiasedness (furnace equivalence), variance reduction on a sun env, and
the EXR/HDR decoders on synthesized files."""

import struct
import zlib

import numpy as np
import pytest
import jax.numpy as jnp

from webgpu_raytracing_tpu.config import ProjectionType, RenderSettings
from webgpu_raytracing_tpu.models.scene import scene_from_facesets
from webgpu_raytracing_tpu.models.test_models import uv_sphere
from webgpu_raytracing_tpu.ops.env_sample import (
    build_env_distribution,
    env_pdf,
    sample_env,
)
from webgpu_raytracing_tpu.renderer import Renderer
from webgpu_raytracing_tpu.utils.image import read_exr, read_hdr


def test_env_distribution_pdf_normalizes():
    """∫ pdf dω over the sphere ≈ 1 (texel sum of pdf·Δω)."""
    rng = np.random.default_rng(3)
    img = rng.random((32, 64, 3)).astype(np.float32) * 3.0
    dist = build_env_distribution(img)
    h, w = 32, 64
    theta = np.pi * (1.0 - (np.arange(h) + 0.5) / h)
    d_omega = np.sin(theta)[:, None] * (2.0 * np.pi**2 / (h * w))
    lum = np.asarray(dist.lum)
    pdf = lum / float(dist.total) * (h * w) / (2.0 * np.pi**2)
    assert abs((pdf * d_omega).sum() - 1.0) < 1e-3


def test_sample_env_histogram_matches_luminance():
    """Bright texels must be drawn proportionally more often."""
    img = np.ones((8, 16, 3), np.float32) * 0.1
    img[2, 5] = 100.0  # a sun
    dist = build_env_distribution(img)
    state = jnp.asarray(np.arange(20000, dtype=np.uint32) * 2654435761)
    d, rad, pdf, _ = sample_env(dist, state)
    # most draws should return the sun's radiance
    frac_sun = (np.asarray(rad)[:, 0] > 50).mean()
    assert frac_sun > 0.8, frac_sun
    # pdf of those draws should be high accordingly
    p = env_pdf(dist, d)
    np.testing.assert_allclose(
        np.asarray(p), np.asarray(pdf), rtol=1e-4, atol=1e-6
    )


def _furnace_scene():
    return scene_from_facesets(
        [("sphere", uv_sphere((0, 0, -4), 1.0, lat=16, lon=32))],
        np.array([[0.5, 0.5, 0.5]], np.float32),
        np.zeros((1, 3), np.float32),
    )


@pytest.mark.slow
def test_env_is_furnace_equivalence():
    """Uniform environment: IS-MIS result must equal plain BSDF sampling
    (unbiasedness of the estimator combination)."""
    img = np.ones((64, 128, 3), np.float32)
    dist = build_env_distribution(img)
    scene = _furnace_scene()
    base = RenderSettings(
        width=24, height=24, bounces_depth=8, sample_count=3,
        environment="equirect",
        projection_type=ProjectionType.PERSPECTIVE, fov=0.6,
        use_hit_predictor=False,
    )
    means = {}
    for is_on in (False, True):
        st = base.replace(env_importance_sampling=is_on)
        r = Renderer(
            scene, st,
            env_data=dist if is_on else jnp.asarray(img), base_seed=11,
        )
        for _ in range(20):
            r.step()
        buf = np.asarray(r.buffers.image)
        raw = buf[..., :3] / np.maximum(buf[..., 3:], 1)
        gf = np.asarray(r.buffers.geo_face)
        means[is_on] = raw[gf >= 0].mean()
        assert abs(means[is_on] - 0.5) < 0.035, means


@pytest.mark.slow
def test_env_nee_depth_limit_unbiased():
    """env_nee_depth (config #3 perf knob): limiting env-NEE to the
    first vertex must leave the furnace estimator unbiased — deeper
    vertices fall back to BSDF sampling with MIS weight 1 (the
    prev_bsdf_pdf sentinel), each vertex's strategy mix independent."""
    img = np.ones((64, 128, 3), np.float32)
    dist = build_env_distribution(img)
    scene = _furnace_scene()
    st = RenderSettings(
        width=24, height=24, bounces_depth=8, sample_count=3,
        environment="equirect", env_importance_sampling=True,
        env_nee_depth=1,
        projection_type=ProjectionType.PERSPECTIVE, fov=0.6,
        use_hit_predictor=False,
    )
    r = Renderer(scene, st, env_data=dist, base_seed=11)
    for _ in range(20):
        r.step()
    buf = np.asarray(r.buffers.image)
    raw = buf[..., :3] / np.maximum(buf[..., 3:], 1)
    gf = np.asarray(r.buffers.geo_face)
    mean = raw[gf >= 0].mean()
    assert abs(mean - 0.5) < 0.035, mean


@pytest.mark.slow
def test_env_is_finds_sun_energy():
    """A tiny bright sun: at low spp, BSDF sampling essentially never
    hits the sun texel while the importance sampler lands on it almost
    every draw — the IS image must capture substantially more energy,
    and do so consistently across seeds (low relative spread)."""
    img = np.ones((32, 64, 3), np.float32) * 0.01
    img[8, 20] = 2000.0  # sun well above the horizon (+y-ish)
    dist = build_env_distribution(img)
    scene = _furnace_scene()
    base = RenderSettings(
        width=16, height=16, bounces_depth=3, sample_count=1,
        environment="equirect",
        projection_type=ProjectionType.PERSPECTIVE, fov=0.6,
        use_hit_predictor=False,
    )
    means = {False: [], True: []}
    for is_on in (False, True):
        st = base.replace(env_importance_sampling=is_on)
        for seed in (5, 6, 7):
            r = Renderer(
                scene, st,
                env_data=dist if is_on else jnp.asarray(img),
                base_seed=seed,
            )
            for _ in range(6):
                r.step()
            buf = np.asarray(r.buffers.image)
            raw = buf[..., :3] / np.maximum(buf[..., 3:], 1)
            gf = np.asarray(r.buffers.geo_face)
            means[is_on].append(raw[gf >= 0].mean())
    m_is = np.mean(means[True])
    m_no = np.mean(means[False])
    assert m_is > 3.0 * m_no, (means, "IS must capture the sun")
    spread = np.std(means[True]) / m_is
    assert spread < 0.25, (means, "IS estimate must be stable")


# --- decoders (scene.ts:336-346 equivalents) ---


def _write_minimal_exr(path, img):
    """Synthesize an uncompressed scanline EXR (float32 RGB)."""
    h, w = img.shape[0], img.shape[1]

    def attr(name, atype, data):
        return (
            name.encode() + b"\x00" + atype.encode() + b"\x00"
            + struct.pack("<i", len(data)) + data
        )

    chans = b""
    for cname in ("B", "G", "R"):  # alphabetical
        chans += cname.encode() + b"\x00" + struct.pack("<iiii", 2, 0, 1, 1)
    chans += b"\x00"
    header = b"\x76\x2f\x31\x01" + struct.pack("<i", 2)
    header += attr("channels", "chlist", chans)
    header += attr("compression", "compression", b"\x00")  # NONE
    header += attr(
        "dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1)
    )
    header += attr(
        "displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1)
    )
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr(
        "screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0)
    )
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    # offset table + scanline blocks
    line_bytes = 8 + 3 * w * 4
    table_start = len(header)
    data_start = table_start + 8 * h
    offsets = [data_start + y * line_bytes for y in range(h)]
    body = b"".join(struct.pack("<q", o) for o in offsets)
    for y in range(h):
        block = struct.pack("<ii", y, 3 * w * 4)
        for cname, ci in (("B", 2), ("G", 1), ("R", 0)):
            block += img[y, :, ci].astype("<f4").tobytes()
        body += block
    with open(path, "wb") as fh:
        fh.write(header + body)


def test_read_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((6, 9, 3)).astype(np.float32) * 4.0
    p = str(tmp_path / "t.exr")
    _write_minimal_exr(p, img)
    out = read_exr(p)
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_read_hdr_roundtrip(tmp_path):
    # synthesize a flat (non-RLE) Radiance file
    rng = np.random.default_rng(1)
    img = (rng.random((4, 8, 3)) * 2.0).astype(np.float32)
    # encode RGBE
    maxc = img.max(axis=2)
    e = np.ceil(np.log2(np.maximum(maxc, 1e-30))).astype(np.int32) + 1
    scale = 2.0 ** (e - 8)
    rgbe = np.zeros((4, 8, 4), np.uint8)
    for c in range(3):
        rgbe[..., c] = np.clip(img[..., c] / scale, 0, 255).astype(np.uint8)
    rgbe[..., 3] = (e + 128).astype(np.uint8)
    p = str(tmp_path / "t.hdr")
    with open(p, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(b"-Y 4 +X 8\n")
        fh.write(rgbe.tobytes())
    out = read_hdr(p)
    # RGBE quantizes to 8 bits/mantissa
    np.testing.assert_allclose(out, img, rtol=0.02, atol=0.02)


def _write_zip_exr(path, img):
    """Synthesize a ZIPS-compressed (1 line/block) EXR to cover the
    cumulative un-delta reconstruction path."""
    h, w = img.shape[0], img.shape[1]

    def attr(name, atype, data):
        return (
            name.encode() + b"\x00" + atype.encode() + b"\x00"
            + struct.pack("<i", len(data)) + data
        )

    chans = b""
    for cname in ("B", "G", "R"):
        chans += cname.encode() + b"\x00" + struct.pack("<iiii", 2, 0, 1, 1)
    chans += b"\x00"
    header = b"\x76\x2f\x31\x01" + struct.pack("<i", 2)
    header += attr("channels", "chlist", chans)
    header += attr("compression", "compression", b"\x02")  # ZIPS
    header += attr(
        "dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1)
    )
    header += attr(
        "displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1)
    )
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    blocks = []
    for y in range(h):
        raw = b"".join(
            img[y, :, ci].astype("<f4").tobytes() for ci in (2, 1, 0)
        )
        arr = np.frombuffer(raw, np.uint8).astype(np.int64)
        # EXR zip pre-processing: interleave-split then delta-encode
        half = (len(arr) + 1) // 2
        split = np.empty_like(arr)
        split[:half] = arr[0::2]
        split[half:] = arr[1::2]
        enc = split.copy()
        enc[1:] = (split[1:] - split[:-1] + 128) % 256
        blocks.append(zlib.compress(enc.astype(np.uint8).tobytes()))

    table_start = len(header)
    data_start = table_start + 8 * h
    offsets, body, off = [], b"", data_start
    for y, blk in enumerate(blocks):
        offsets.append(off)
        body += struct.pack("<ii", y, len(blk)) + blk
        off += 8 + len(blk)
    table = b"".join(struct.pack("<q", o) for o in offsets)
    with open(path, "wb") as fh:
        fh.write(header + table + body)


def test_read_exr_zip_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.random((5, 7, 3)).astype(np.float32) * 3.0
    p = str(tmp_path / "z.exr")
    _write_zip_exr(p, img)
    out = read_exr(p)
    np.testing.assert_allclose(out, img, rtol=1e-6)

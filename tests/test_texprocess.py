"""Texture processing: BC codecs, DDS/HDR containers, alpha-coverage mips,
processed-texture cache (reference: TextureProcessingManager +
TextureFactory file formats)."""

import numpy as np
import pytest

from basicrenderer_tpu.models import texprocess as tp
from basicrenderer_tpu.models.textures import TextureRegistry


def _gradient_rgba(h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 255 / (w - 1)),
        (yy * 255 / (h - 1)),
        ((xx + yy) * 255 / (h + w - 2)),
        np.full((h, w), 255.0)], -1)
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_bc1_flat_blocks_exact():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = (255, 0, 0)
    img[4:] = (0, 64, 192)
    out = tp.bc1_decode(tp.bc1_encode(img), 8, 8)
    # Flat blocks survive up to 565 quantization of the single color.
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_bc1_gradient_quality():
    img = _gradient_rgba()[..., :3]
    out = tp.bc1_decode(tp.bc1_encode(img), 32, 32)
    rmse = np.sqrt(np.mean((out.astype(float) - img.astype(float)) ** 2))
    assert rmse < 12.0, rmse          # ~26 dB PSNR floor for range-fit BC1


def test_bc4_alpha_roundtrip():
    a = _gradient_rgba()[..., 1]      # smooth channel
    out = tp.bc4_decode(tp.bc4_encode(a), 32, 32)
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 16
    # Two-value blocks are exact (a0/a1 endpoints hit them).
    bi = np.zeros((4, 4), np.uint8)
    bi[:2] = 255
    assert np.array_equal(tp.bc4_decode(tp.bc4_encode(bi), 4, 4), bi)


def test_bc3_rgba_roundtrip():
    img = _gradient_rgba()
    img[..., 3] = np.where(np.mgrid[0:32, 0:32][0] < 16, 255, 40)
    out = tp.bc3_decode(tp.bc3_encode(img), 32, 32)
    rmse = np.sqrt(np.mean((out.astype(float) - img.astype(float)) ** 2))
    assert rmse < 12.0


def test_dds_roundtrip_all_formats(tmp_path):
    img = _gradient_rgba(16, 32)
    for fourcc, tol in ((None, 0), ("DXT1", 14), ("DXT5", 14)):
        p = str(tmp_path / f"t_{fourcc}.dds")
        tp.save_dds(p, img, fourcc=fourcc)
        with open(p, "rb") as f:
            back = tp.load_dds(f.read())
        assert back.shape == (16, 32, 4)
        d = np.abs(back.astype(int) - img.astype(int))
        if fourcc is None:
            assert d.max() == 0
        else:
            assert np.sqrt(np.mean(d[..., :3] ** 2.0)) <= tol


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((16, 32, 3)) * 40.0).astype(np.float32)
    img[0, 0] = 0.0
    p = str(tmp_path / "env.hdr")
    tp.save_hdr(p, img)
    with open(p, "rb") as f:
        back = tp.load_hdr(f.read())
    # RGBE is a SHARED-exponent format: a channel's absolute error is
    # bounded by the pixel's max channel / 256 (half a mantissa step +
    # rounding), not by its own magnitude.
    bound = img.max(-1, keepdims=True) / 256.0 + 1e-4
    assert np.all(np.abs(back - img) <= bound)


def test_hdr_rle_decode():
    """New-style RLE scanlines (what third-party writers emit)."""
    w, h = 16, 2
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 128
    rgbe[..., 3] = 129                # value 0.5-ish
    rgbe[1, :, 0] = np.arange(w)      # literal-span component
    buf = b"#?RADIANCE\n\n" + f"-Y {h} +X {w}\n".encode()
    for y in range(h):
        buf += bytes([2, 2, 0, w])
        for c in range(4):
            row = rgbe[y, :, c]
            if np.all(row == row[0]):
                buf += bytes([128 + w, int(row[0])])       # one run
            else:
                buf += bytes([w]) + row.tobytes()          # one literal span
    out = tp.load_hdr(buf)
    assert out.shape == (h, w, 3)
    expect = rgbe[..., 0].astype(np.float32) * np.ldexp(
        1.0, rgbe[..., 3].astype(np.int32) - 136)
    np.testing.assert_allclose(out[..., 0], expect, rtol=1e-6)


def test_decode_image_bytes_dispatch(tmp_path):
    img = _gradient_rgba(16, 16)
    p = str(tmp_path / "a.dds")
    tp.save_dds(p, img)
    with open(p, "rb") as f:
        assert tp.decode_image_bytes(f.read()).shape == (16, 16, 4)
    p2 = str(tmp_path / "b.hdr")
    tp.save_hdr(p2, np.ones((8, 8, 3), np.float32) * 0.25)
    with open(p2, "rb") as f:
        u8 = tp.decode_image_bytes(f.read())
    assert u8.shape == (8, 8, 4) and abs(int(u8[0, 0, 0]) - 64) <= 2


def test_alpha_coverage_mips():
    """Foliage-style sparse alpha keeps its MASK coverage down the mip
    chain instead of thinning out (reference: TextureProcessingManager's
    alpha-tested mip scaling)."""
    r = 64
    rng = np.random.default_rng(2)
    alpha = (rng.random((r, r)) < 0.3).astype(np.float32)  # 30% coverage
    img = np.concatenate([np.full((r, r, 3), 0.4, np.float32),
                          alpha[..., None]], -1)
    cutoff = 0.5
    fixed = TextureRegistry(resolution=r)
    fixed.add(img, srgb=False, alpha_cutoff=cutoff)
    plain = TextureRegistry(resolution=r)
    plain.add(img, srgb=False)

    def mip_coverage(reg, mip):
        level = reg.images[0]
        for _ in range(mip):
            level = reg._downsample(level, level.shape[0], 0)
        return float(np.mean(level[..., 3] > cutoff))

    ref = float(np.mean(alpha > cutoff))
    cov_fixed = mip_coverage(fixed, 3)
    cov_plain = mip_coverage(plain, 3)
    assert cov_plain < ref * 0.55            # the defect being fixed
    assert abs(cov_fixed - ref) < 0.12       # coverage preserved
    # And the pyramid builds without error with the fix active.
    fixed.pyramid(capacity=1)


def test_processed_cache_hit_identical(tmp_path):
    import io
    from PIL import Image
    img = _gradient_rgba(64, 48)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    data = buf.getvalue()
    cache = tp.ProcessedTextureCache(str(tmp_path / "ptc"))
    a = tp.process_for_registry(data, True, 32, cache=cache)
    assert cache.misses == 1 and cache.hits == 0
    b = tp.process_for_registry(data, True, 32, cache=cache)
    assert cache.hits == 1
    np.testing.assert_array_equal(a, b)   # hit == miss (BC round-trip both)
    # Data textures skip BC (kept raw).
    c = tp.process_for_registry(data, False, 32, cache=cache)
    d = tp.process_for_registry(data, False, 32, cache=cache)
    np.testing.assert_array_equal(c, d)


def test_gltf_imports_dds_texture(tmp_path):
    """A glTF referencing a DDS image loads through the native reader."""
    import json
    from basicrenderer_tpu.models.importers import load_gltf
    from basicrenderer_tpu.models.materials import MaterialRegistry
    from basicrenderer_tpu.models.mesh import MeshRegistry
    from basicrenderer_tpu.scene.scene import Scene

    img = _gradient_rgba(32, 32)
    tp.save_dds(str(tmp_path / "tex.dds"), img, fourcc="DXT5")
    tri = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}},
            "alphaMode": "MASK", "alphaCutoff": 0.4}],
        "textures": [{"source": 0}],
        "images": [{"uri": "tex.dds"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5125, "count": 3,
             "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 12}],
        "buffers": [{"uri": "geo.bin", "byteLength": 48}],
    }
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint32)
    (tmp_path / "geo.bin").write_bytes(pos.tobytes() + idx.tobytes())
    (tmp_path / "tri.gltf").write_text(json.dumps(tri))

    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    reg = TextureRegistry(resolution=32)
    load_gltf(str(tmp_path / "tri.gltf"), sc, meshes, mats, textures=reg)
    assert len(reg) == 1
    assert reg.alpha_cutoffs[0] == pytest.approx(0.4)
    m = mats.materials[-1]
    assert m.base_color_texture == 0 and m.alpha_cutoff == pytest.approx(0.4)


def test_hdr_power_of_two_exact(tmp_path):
    """Exact powers of two must round-trip exactly (frexp exponent keeps
    the dominant mantissa in [128, 256); the old ceil(log2) form clipped
    mantissa 256 -> 255, a systematic ~0.4% darkening)."""
    img = np.zeros((2, 4, 3), np.float32)
    img[..., 0] = [[1.0, 2.0, 0.5, 4.0], [8.0, 0.25, 1.0, 16.0]]
    p = str(tmp_path / "pow2.hdr")
    tp.save_hdr(p, img)
    with open(p, "rb") as f:
        back = tp.load_hdr(f.read())
    np.testing.assert_allclose(back[..., 0], img[..., 0], rtol=1e-7)


def test_dds_non_multiple_of_4(tmp_path):
    """Third-party DDS files with non-multiple-of-4 dims decode via ceil
    block counts + crop instead of crashing."""
    img = _gradient_rgba(24, 40)
    p = str(tmp_path / "full.dds")
    tp.save_dds(p, img, fourcc="DXT5")
    with open(p, "rb") as f:
        data = bytearray(f.read())
    # Patch header dims down to 22x38 (blocks still cover 24x40).
    import struct
    data[12:20] = struct.pack("<II", 22, 38)
    out = tp.load_dds(bytes(data))
    assert out.shape == (22, 38, 4)
    ref = tp.load_dds(open(p, "rb").read())[:22, :38]
    assert np.array_equal(out, ref)


def test_processed_cache_corrupt_entry(tmp_path):
    """A truncated cache file is a miss, then gets overwritten."""
    c = tp.ProcessedTextureCache(str(tmp_path))
    img = _gradient_rgba(16, 16)
    key = c.key(b"fake-bytes", True, 16)
    stored = c.store(key, img, srgb=True)
    # Corrupt the file.
    with open(c._path(key), "wb") as f:
        f.write(b"PK\x03\x04 truncated")
    assert c.load(key) is None
    again = c.store(key, img, srgb=True)
    assert np.array_equal(c.load(key), again) and np.array_equal(
        again, stored)

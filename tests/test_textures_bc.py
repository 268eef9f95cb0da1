"""BC3 compressed-at-rest atlas: encode/decode round trip through the
block-window sampler matches the RGBA8 atlas within BC quantization."""

import numpy as np
import jax.numpy as jnp

from basicrenderer_tpu.models.textures import TextureRegistry
from basicrenderer_tpu.models.texprocess import bc3_encode, bc3_decode
from basicrenderer_tpu.ops import textures as tex_ops


def _registry():
    tex = TextureRegistry(resolution=64)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 63.0
    grad = np.stack([xx, yy, 0.5 * (xx + yy)], -1)
    tex.add((grad * 255).astype(np.uint8), srgb=True)
    tex.checkerboard()
    return tex


def _sample(strips, flags, fmt, uv, kernel=False, interpret=False):
    K = 1
    h, w = uv.shape[:2]
    tids = jnp.zeros((K, h, w), jnp.int32)
    return tex_ops.sample_pyramid_blocked_planes(
        jnp.asarray(strips), jnp.asarray(flags), tids,
        jnp.asarray(uv[..., 0]), jnp.asarray(uv[..., 1]), h, w, 1,
        kernel=kernel, interpret=interpret, fmt=fmt)


def _uv(h=32, w=128, scale=1.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([xx / w * scale, yy / h * scale], -1)


def test_bc3_decode_rows_matches_numpy_decoder():
    """The jnp lane decoder must match texprocess.bc3_decode bit-exactly."""
    rng = np.random.default_rng(3)
    band = rng.integers(0, 256, (8, 128, 4), np.uint8)
    blocks = bc3_encode(band)
    ref = bc3_decode(blocks, 8, 128)                    # (8, 128, 4) u8
    rows = np.ascontiguousarray(blocks).view('<u4').reshape(2, 128)
    dec = np.asarray(tex_ops.bc3_decode_rows(
        jnp.asarray(rows[None])))[0]                    # (8, 128) u32
    got = np.stack([(dec >> s) & 0xFF for s in (0, 8, 16, 24)],
                   -1).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_bc3_atlas_matches_rgba8_within_quantization():
    tex = _registry()
    s8, f8 = tex.strip_pyramid(fmt="rgba8")
    sb, fb = tex.strip_pyramid(fmt="bc3")
    assert sb.shape[0] * 4 < s8.shape[0]               # >= 4x smaller
    np.testing.assert_array_equal(f8, fb)
    uv = _uv(scale=1.0)
    a = np.asarray(_sample(s8, f8, "rgba8", uv))
    b = np.asarray(_sample(sb, fb, "bc3", uv))
    # Smooth-gradient layer: BC3 range-fit error is small.
    err = np.abs(a - b)[..., :3]
    assert err.mean() < 0.02 and err.max() < 0.2, (err.mean(), err.max())


def test_bc3_kernel_interpret_matches_xla_path():
    tex = _registry()
    sb, fb = tex.strip_pyramid(fmt="bc3")
    uv = _uv(scale=2.3)                                 # wraps + mips
    a = np.asarray(_sample(sb, fb, "bc3", uv, kernel=False))
    b = np.asarray(_sample(sb, fb, "bc3", uv, kernel=True, interpret=True))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def test_bc3_memory_reduction_factor():
    tex = _registry()
    s8, _ = tex.strip_pyramid(fmt="rgba8")
    sb, _ = tex.strip_pyramid(fmt="bc3")
    assert s8.nbytes / sb.nbytes >= 4.0

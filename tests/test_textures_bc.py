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
    assert sb.shape[0] * 4 <= s8.shape[0]              # >= 4x smaller
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


def test_bc3_frame_e2e_matches_rgba8():
    """Full frame with a BC3 atlas vs RGBA8 atlas: same scene, small
    pixel error (BC quantization only)."""
    import jax
    from basicrenderer_tpu.graph.framedata import (FrameConfig, FrameParams,
                                                   make_view)
    from basicrenderer_tpu.graph.frame import build_frame_fn
    from basicrenderer_tpu.models import procedural
    from basicrenderer_tpu.models.materials import Material, MaterialRegistry
    from basicrenderer_tpu.models.mesh import MeshRegistry
    from basicrenderer_tpu.scene.bridge import (BridgeCapacities,
                                                SceneRenderBridge)
    from basicrenderer_tpu.scene.scene import Scene

    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = _registry()
    # The checkerboard layer: 2-color blocks are exact under BC1's range
    # fit, so the frame RMSE isolates pipeline correctness. (The gradient
    # layer's planar colors are BC1's worst case — its error bound is
    # covered by test_bc3_atlas_matches_rgba8_within_quantization.)
    plane = meshes.add(procedural.make_plane(8.0, 2))
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          base_color_texture=1))
    sc = Scene()
    sc.create_renderable(plane, m)
    sc.create_directional_light(direction=(-0.4, -1, -0.3), intensity=3.0)
    sc.set_camera(position=(3, 2.5, 4), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=8, max_materials=4, max_lights=4)
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    imgs = {}
    for fmt in ("rgba8", "bc3"):
        bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex,
                                   tex_format=fmt)
        buffers = bridge.build_scene_buffers()
        cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                          max_pairs=1 << 12, use_pallas_raster=False,
                          enable_textures=True, tex_channels=("base",),
                          tex_format=fmt)
        out = jax.jit(build_frame_fn(cfg))(buffers, vd,
                                           FrameParams.default())
        imgs[fmt] = np.asarray(out["image"]).astype(np.float32) / 255.0
    rmse = float(np.sqrt(np.mean((imgs["rgba8"] - imgs["bc3"]) ** 2)))
    assert rmse < 5e-3, rmse

"""Texture registry + packed mip-pyramid sampling + frame integration."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.models.textures import TextureRegistry
from basicrenderer_tpu.ops.textures import (
    infer_resolution, layer_words, mip_layout, sample_pyramid)
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _uv_grid(H, W):
    u = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5) / W
    v = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5) / H
    return jnp.stack([u, v], -1)


def test_registry_and_pyramid_layout():
    reg = TextureRegistry(resolution=64)
    tid = reg.checkerboard(squares=4)
    t2 = reg.add(np.full((32, 48, 3), 128, np.uint8))
    pyr, flags = reg.pyramid()
    sizes, offsets = mip_layout(64)
    assert sizes == (64, 32, 16, 8, 4)
    assert pyr.shape == (2, layer_words(64))
    assert infer_resolution(pyr.shape[1]) == 64
    assert flags[t2] == 1 and flags[tid] == 0  # checker stored linear
    # sRGB roundtrip: 128/255 stored sRGB8, decodes to ~0.216 linear.
    word = int(pyr[t2, 0])
    assert word & 0xFF == 128
    # Coarsest mip of the uniform texture is still uniform 128.
    assert int(pyr[t2, offsets[-1]]) & 0xFF == 128


def test_sample_pyramid_checker_and_mips():
    reg = TextureRegistry(resolution=64)
    tid = reg.checkerboard(a=(1, 0, 0), b=(0, 0, 1), squares=2)
    pyr, flags = reg.pyramid()
    pyr, flags = jnp.asarray(pyr), jnp.asarray(flags)
    H = W = 32
    tex_id = jnp.full((H, W), tid, jnp.int32)
    uv = _uv_grid(H, W)
    out = np.asarray(sample_pyramid(pyr, flags, tex_id, uv, 1, "nearest"))
    assert out[4, 4, 0] > 0.9 and out[4, 4, 2] < 0.1   # top-left red
    assert out[4, 28, 2] > 0.9 and out[4, 28, 0] < 0.1
    # id -1 -> white
    out2 = np.asarray(sample_pyramid(pyr, flags,
                                     jnp.full((H, W), -1, jnp.int32), uv, 1))
    assert (out2 == 1.0).all()
    # Minified UVs (big derivatives) hit a coarse mip: a FINE checker
    # averages toward purple there, so red/blue separation shrinks.
    fine = reg.checkerboard(a=(1, 0, 0), b=(0, 0, 1), squares=16)
    pyr2, flags2 = (jnp.asarray(x) for x in reg.pyramid())
    fine_id = jnp.full((H, W), fine, jnp.int32)
    uv_min = uv * 16.0
    hi = np.asarray(sample_pyramid(pyr2, flags2, fine_id, uv, 1, "bilinear"))
    lo = np.asarray(sample_pyramid(pyr2, flags2, fine_id, uv_min, 1,
                                   "bilinear"))
    sep_hi = np.abs(hi[..., 0] - hi[..., 2]).mean()
    sep_lo = np.abs(lo[..., 0] - lo[..., 2]).mean()
    assert sep_lo < sep_hi * 0.5, (sep_lo, sep_hi)


def test_bilinear_interpolates_between_texels():
    reg = TextureRegistry(resolution=4)
    img = np.zeros((4, 4, 4), np.float32)
    img[:, 2:] = 1.0   # left black / right white (linear data)
    tid = reg.add(img, srgb=False)
    pyr, flags = reg.pyramid()
    H = W = 16
    uv = _uv_grid(H, W)
    out = np.asarray(sample_pyramid(jnp.asarray(pyr), jnp.asarray(flags),
                                    jnp.full((H, W), tid, jnp.int32),
                                    uv, 1, "bilinear"))
    row = out[8, :, 0]
    assert row.min() < 0.05 and row.max() > 0.95
    mid = row[(row > 0.3) & (row < 0.7)]
    assert len(mid) >= 2   # smooth ramp, not a hard step


def test_textured_frame():
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard(a=(1, 1, 1), b=(0.05, 0.05, 0.05), squares=8)
    plane = meshes.add(procedural.make_plane(8.0, 1))
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          roughness=0.9, base_color_texture=checker))
    sc = Scene()
    sc.create_renderable(plane, m)
    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0, 6, 0.1), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=4,
                            max_materials=4, max_lights=2, max_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=256, use_pallas_raster=False,
                      enable_textures=True, texture_downscale=1)
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32)
    vis = np.asarray(out["vis"])
    cov = vis > 0
    assert cov.mean() > 0.5
    # Checkerboard visible: covered pixels split into bright + dark modes.
    lum = img[..., 0][cov]
    bright = (lum > lum.mean()).mean()
    assert 0.2 < bright < 0.8
    assert lum.std() > 25


def test_metallic_roughness_emissive_channels():
    """MR texture (G=rough, B=metal) and emissive texture must reach the
    G-buffer through the frame's texture pass."""
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=16)
    mr_img = np.zeros((16, 16, 4), np.float32)
    mr_img[..., 1] = 0.25   # roughness factor via texture
    mr_img[..., 2] = 1.0    # fully metallic
    mr_id = tex.add(mr_img, srgb=False)
    em_img = np.zeros((16, 16, 4), np.float32)
    em_img[..., 0] = 1.0    # red emissive
    em_id = tex.add(em_img, srgb=True)
    plane = meshes.add(procedural.make_plane(8.0, 1))
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          roughness=1.0, metallic=1.0,
                          emissive=np.array([2, 2, 2], np.float32),
                          metallic_roughness_texture=mr_id,
                          emissive_texture=em_id))
    sc = Scene()
    sc.create_renderable(plane, m)
    sc.create_directional_light(direction=(0, -1, 0), intensity=1.0)
    sc.set_camera(position=(0, 6, 0.1), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=4,
                            max_materials=4, max_lights=2, max_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=64, height=64, tile_h=16, tile_w=128,
                      max_pairs=256, use_pallas_raster=False,
                      enable_textures=True, texture_downscale=1)
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32)
    vis = np.asarray(out["vis"]) > 0
    # Emissive red dominates (metal albedo white, but emissive 2*red).
    px = img[vis]
    assert px[:, 0].mean() > px[:, 2].mean() + 20


def test_normal_mapping_perturbs_shading():
    """A bumpy normal map on a flat plane must modulate lighting where a
    flat normal would shade uniformly."""
    from basicrenderer_tpu.ops.textures import apply_normal_map

    reg = TextureRegistry(resolution=64)
    # Normal map: stripes tilting left/right in tangent space.
    r = 64
    xs = np.arange(r)
    tilt = np.where((xs // 8) % 2 == 0, 0.35, -0.35)
    nm = np.zeros((r, r, 3), np.float32)
    nm[..., 0] = tilt[None, :]
    nm[..., 2] = np.sqrt(1 - tilt[None, :] ** 2)
    tid = reg.add(nm * 0.5 + 0.5, srgb=False)
    pyr, flags = reg.pyramid()
    pyr, flags = jnp.asarray(pyr), jnp.asarray(flags)

    H = W = 32
    normal = jnp.zeros((H, W, 3), jnp.float32).at[..., 1].set(1.0)  # flat up
    uv = _uv_grid(H, W)
    # World pos: XZ plane spanning [0,8]^2, y=0 — consistent with uv.
    wp = jnp.stack([uv[..., 0] * 8.0, jnp.zeros((H, W)), uv[..., 1] * 8.0], -1)
    ntex = jnp.full((H, W), tid, jnp.int32)
    out = np.asarray(apply_normal_map(normal, wp, uv, pyr, flags, ntex,
                                      downscale=1, filter="nearest"))
    # Normals tilt in +-X alternating; y stays dominant.
    assert out[16, 2:30, 0].std() > 0.1
    assert (out[..., 1] > 0.8).mean() > 0.9
    # id -1 leaves normals unchanged.
    out2 = np.asarray(apply_normal_map(normal, wp, uv, pyr, flags,
                                       jnp.full((H, W), -1, jnp.int32)))
    np.testing.assert_allclose(out2, np.asarray(normal), atol=1e-6)


def test_blocked_sampler_matches_reference():
    """The block-window MXU sampler must match the per-pixel gather sampler
    on a magnified view (both resolve to mip 0, bilinear)."""
    from basicrenderer_tpu.ops.textures import sample_pyramid_blocked

    reg = TextureRegistry(resolution=64)
    rng = np.random.default_rng(7)
    img = rng.random((64, 64, 4)).astype(np.float32)
    t0 = reg.add(img, srgb=False)
    t1 = reg.checkerboard(a=(1, 0, 0), b=(0, 0, 1), squares=4)
    pyr, flags = (jnp.asarray(x) for x in reg.pyramid())
    strips, sflags = (jnp.asarray(x) for x in reg.strip_pyramid())

    H = W = 64
    uv = _uv_grid(H, W) * 0.45 + 0.05      # magnified: ~0.45 texel/px
    tid0 = jnp.full((H, W), t0, jnp.int32)
    tid1 = jnp.full((H, W), t1, jnp.int32)
    ref0 = np.asarray(sample_pyramid(pyr, flags, tid0, uv, 1, "bilinear"))
    ref1 = np.asarray(sample_pyramid(pyr, flags, tid1, uv, 1, "bilinear"))
    out = np.asarray(sample_pyramid_blocked(
        strips, sflags, jnp.stack([tid0, tid1]), uv, 1, "bilinear"))
    assert out.shape == (2, H, W, 4)
    np.testing.assert_allclose(out[0], ref0, atol=0.02)
    np.testing.assert_allclose(out[1], ref1, atol=0.02)
    # Nearest filter too.
    refn = np.asarray(sample_pyramid(pyr, flags, tid0, uv, 1, "nearest"))
    outn = np.asarray(sample_pyramid_blocked(
        strips, sflags, tid0[None], uv, 1, "nearest"))
    np.testing.assert_allclose(outn[0], refn, atol=0.02)
    # Two materials meeting INSIDE blocks: both layers must sample
    # correctly (the second-layer pass; pre-fix the minority side fell
    # back to white).
    xsplit = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    tid_mix = jnp.where(xsplit < 37, tid0, tid1)
    ref_mix = np.where((np.asarray(xsplit) < 37)[..., None], ref0, ref1)
    out_mix = np.asarray(sample_pyramid_blocked(
        strips, sflags, tid_mix[None], uv, 1, "bilinear"))
    np.testing.assert_allclose(out_mix[0], ref_mix, atol=0.02)


def test_blocked_sampler_minified_and_untextured():
    from basicrenderer_tpu.ops.textures import sample_pyramid_blocked

    reg = TextureRegistry(resolution=64)
    t1 = reg.checkerboard(a=(1, 0, 0), b=(0, 0, 1), squares=16)
    strips, sflags = (jnp.asarray(x) for x in reg.strip_pyramid())
    H = W = 64
    uv = _uv_grid(H, W) * 16.0             # heavy minification
    tid = jnp.full((H, W), t1, jnp.int32)
    out = np.asarray(sample_pyramid_blocked(strips, sflags, tid[None], uv))
    # Fine checker averages toward purple at coarse mips.
    assert np.abs(out[0, ..., 0] - out[0, ..., 2]).mean() < 0.4
    assert np.isfinite(out).all()
    # Untextured -> white.
    out2 = np.asarray(sample_pyramid_blocked(
        strips, sflags, jnp.full((1, H, W), -1, jnp.int32), uv))
    assert (out2 == 1.0).all()


def test_textured_frame_planes_path_ds2():
    """texture_downscale=2 rides the channels-planes sampler path; the
    checker must still resolve (vs the ds1 reference)."""
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard(a=(1, 1, 1), b=(0.05, 0.05, 0.05), squares=8)
    plane = meshes.add(procedural.make_plane(8.0, 1))
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          roughness=0.9, base_color_texture=checker))
    sc = Scene()
    sc.create_renderable(plane, m)
    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0, 6, 0.1), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=4,
                            max_materials=4, max_lights=2, max_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    import dataclasses
    cfg1 = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                       max_pairs=256, use_pallas_raster=False,
                       enable_textures=True, texture_downscale=1)
    cfg2 = dataclasses.replace(cfg1, texture_downscale=2)
    vd = make_view(view, proj, pos)
    img1 = np.asarray(jax.jit(build_frame_fn(cfg1))(
        buffers, vd, FrameParams.default())["image"]).astype(np.float32)
    img2 = np.asarray(jax.jit(build_frame_fn(cfg2))(
        buffers, vd, FrameParams.default())["image"]).astype(np.float32)
    # ds2 is a softened version of ds1 — structurally similar.
    assert np.abs(img1 - img2).mean() < 12, np.abs(img1 - img2).mean()
    lum = img2[..., 0]
    assert lum.std() > 25   # checker still visible at ds2

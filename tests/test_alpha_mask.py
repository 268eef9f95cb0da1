"""Alpha-cutoff (MASK) materials: texture alpha punches holes and the
surface BEHIND shows through (reference: alpha-tested PSOs in the
vis-buffer raster)."""

import dataclasses

import numpy as np
import jax

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.models.textures import TextureRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _scene():
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    # Alpha checkerboard: left half opaque white, right half alpha=0.
    img = np.ones((64, 64, 4), np.float32)
    img[:, 32:, 3] = 0.0
    cut_tex = tex.add(img, srgb=False)
    leaf = mats.add(Material(
        base_color=np.array([0.1, 0.8, 0.1, 1], np.float32), roughness=0.8,
        alpha_cutoff=0.5, base_color_texture=cut_tex))
    blue = mats.add(Material(base_color=np.array([0.1, 0.1, 0.9, 1],
                                                 np.float32), roughness=0.8))
    quad = meshes.add(procedural.make_plane(4.0, 1))
    sc = Scene()
    # Blue backdrop behind a masked "leaf" quad, camera above looking down.
    sc.create_renderable(quad, blue, position=(0, 0, 0))
    sc.create_renderable(quad, leaf, position=(0, 1.5, 0))
    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0, 6, 0.05), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=4,
                            max_materials=4, max_lights=2, max_clusters=8,
                            max_geom_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 10, use_pallas_raster=False,
                  enable_clod=True, max_visible_clusters=8,
                  enable_textures=True, texture_downscale=1,
                  enable_alpha_mask=True, mask_clusters=8)


def test_mask_punches_through_to_backdrop():
    buffers, vd = _scene()
    out = jax.jit(build_frame_fn(CFG))(buffers, vd, FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32)
    # One half shows the green leaf, the other the blue backdrop.
    left = img[40:88, 10:60].reshape(-1, 3).mean(0)
    right = img[40:88, 68:118].reshape(-1, 3).mean(0)
    greens = sorted([left, right], key=lambda c: c[1] - c[2])
    blue_side, green_side = greens[0], greens[1]
    assert green_side[1] > green_side[2] + 20, (left, right)
    assert blue_side[2] > blue_side[1] + 20, (left, right)


def test_mask_off_renders_leaf_fully_opaque():
    buffers, vd = _scene()
    cfg = dataclasses.replace(CFG, enable_alpha_mask=False)
    out = jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32)
    # Without the mask pass the leaf quad renders opaque everywhere, so
    # fewer backdrop-blue pixels survive than with masking on.
    on = jax.jit(build_frame_fn(CFG))(buffers, vd, FrameParams.default())
    img_on = np.asarray(on["image"]).astype(np.float32)

    def blue_px(im):
        return ((im[..., 2] > im[..., 1] + 20) & (im[..., 2] > 60)).sum()

    assert blue_px(img) < blue_px(img_on) * 0.7, \
        (blue_px(img), blue_px(img_on))


def _stacked_scene():
    """Blue backdrop, masked RED leaf (hole on the LEFT half), masked
    GREEN leaf above it (hole on the RIGHT half): through the green hole
    the red leaf is the correct surface, not the backdrop."""
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    img_g = np.ones((64, 64, 4), np.float32)
    img_g[:, 32:, 3] = 0.0                     # green: hole right
    img_r = np.ones((64, 64, 4), np.float32)
    img_r[:, :32, 3] = 0.0                     # red: hole left
    gtex = tex.add(img_g, srgb=False)
    rtex = tex.add(img_r, srgb=False)
    green = mats.add(Material(
        base_color=np.array([0.1, 0.8, 0.1, 1], np.float32), roughness=0.8,
        alpha_cutoff=0.5, base_color_texture=gtex))
    red = mats.add(Material(
        base_color=np.array([0.9, 0.1, 0.1, 1], np.float32), roughness=0.8,
        alpha_cutoff=0.5, base_color_texture=rtex))
    blue = mats.add(Material(base_color=np.array([0.1, 0.1, 0.9, 1],
                                                 np.float32), roughness=0.8))
    quad = meshes.add(procedural.make_plane(4.0, 1))
    sc = Scene()
    sc.create_renderable(quad, blue, position=(0, 0, 0))
    sc.create_renderable(quad, red, position=(0, 1.0, 0))
    sc.create_renderable(quad, green, position=(0, 1.5, 0))
    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0, 6, 0.05), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=4,
                            max_materials=4, max_lights=2, max_clusters=8,
                            max_geom_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


def test_masked_behind_masked_two_peels():
    """mask_peels=2 reveals the red masked leaf through the green leaf's
    cutoff hole; a single peel wrongly falls through to the backdrop
    (reference: the deep-visibility masked tiers, CLodCommon.h:82-86)."""
    buffers, vd = _stacked_scene()
    right = (slice(40, 88), slice(68, 118))
    one = jax.jit(build_frame_fn(CFG))(buffers, vd, FrameParams.default())
    img1 = np.asarray(one["image"]).astype(np.float32)
    r1 = img1[right].reshape(-1, 3).mean(0)
    assert r1[2] > r1[0] + 20, r1             # single peel: blue leaks
    cfg2 = dataclasses.replace(CFG, mask_peels=2)
    two = jax.jit(build_frame_fn(cfg2))(buffers, vd, FrameParams.default())
    img2 = np.asarray(two["image"]).astype(np.float32)
    r2 = img2[right].reshape(-1, 3).mean(0)
    assert r2[0] > r2[2] + 20, r2             # two peels: red shows
    # The green (left) half is identical in both.
    left = (slice(40, 88), slice(10, 60))
    np.testing.assert_allclose(img1[left], img2[left], atol=1)

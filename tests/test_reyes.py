"""Reyes micro-tessellation (ops/reyes.py; reference: Reyes*.cpp
split/dice + displacement).

Contracts: the barycentric dice grid tiles the parent exactly (crack-free
by construction); an enabled displaced plane visibly changes the render
without opening holes; geometry without displacement materials is
untouched bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.models.textures import TextureRegistry
from basicrenderer_tpu.ops.reyes import _bary_grid
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def test_bary_grid_tiles_parent():
    for D in (2, 3, 4):
        g = _bary_grid(D)
        assert g.shape == (D * D, 3, 3)
        # Valid barycentrics.
        assert np.allclose(g.sum(-1), 1.0, atol=1e-6)
        assert (g >= -1e-6).all()
        # Micro areas (in barycentric space) sum to the parent's 1.0 and
        # every micro triangle keeps the parent's orientation.
        p = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
        v = g @ p                                       # (D^2, 3, 2)
        e1 = v[:, 1] - v[:, 0]
        e2 = v[:, 2] - v[:, 0]
        a2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]  # signed 2*area
        assert (a2 > 0).all()
        assert np.isclose(a2.sum(), 1.0, atol=1e-5)


def _rig(displacement: float):
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    # Height field: half the texture raised (R channel).
    r = tex.resolution
    yy, xx = np.mgrid[0:r, 0:r]
    h = (xx > r // 2).astype(np.float32)
    height = tex.add(np.dstack([h, h * 0, h * 0]), srgb=False)
    plane = meshes.add(procedural.make_plane(4.0, 2))
    m = mats.add(Material(
        base_color=np.array([0.8, 0.8, 0.8, 1], np.float32), roughness=0.6,
        displacement_scale=displacement, displacement_texture=height))
    sc = Scene()
    sc.create_renderable(plane, m)
    sc.create_directional_light(direction=(-0.4, -1, -0.3), intensity=3.0)
    sc.set_camera(position=(0, 2.2, 3.2), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 12, max_triangles=1 << 12,
                            max_objects=4, max_materials=4, max_lights=4,
                            max_clusters=1 << 8, max_geom_clusters=1 << 8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


CFG = dict(width=256, height=256, tile_h=16, tile_w=128, max_pairs=1 << 14,
           enable_clod=True, max_visible_clusters=256,
           use_pallas_raster=False)


def test_reyes_displaces_without_holes():
    buffers, vd = _rig(displacement=0.5)
    params = FrameParams.default()
    flat = jax.jit(build_frame_fn(FrameConfig(**CFG)))(buffers, vd, params)
    reyes = jax.jit(build_frame_fn(FrameConfig(
        **CFG, enable_reyes=True, reyes_tris=256, reyes_dice=4,
        reyes_px=16.0)))(buffers, vd, params)
    img_f = np.asarray(flat["image"]).astype(np.int32)
    img_r = np.asarray(reyes["image"]).astype(np.int32)
    # Displacement visibly changes shading/silhouette.
    assert np.abs(img_f - img_r).mean() > 0.5
    # No holes: everywhere the flat plane covered (away from the
    # silhouette band), the diced surface still covers. Coverage can only
    # GROW inside the parent footprint modulo displaced silhouettes, so
    # compare interior coverage counts.
    cov_f = np.asarray(flat["depth_padded"]) > 0
    cov_r = np.asarray(reyes["depth_padded"]) > 0
    lost = cov_f & ~cov_r
    # Displacement legitimately SHIFTS silhouettes (bands of lost pixels
    # bordering background); micro-tessellation CRACKS are lost pixels
    # fully enclosed by the new surface. Flag only the enclosed ones.
    enclosed = (np.roll(cov_r, 2, 0) & np.roll(cov_r, -2, 0)
                & np.roll(cov_r, 2, 1) & np.roll(cov_r, -2, 1))
    holes = (lost & enclosed).sum()
    assert holes == 0, f"{holes} crack pixels inside the diced surface"


def test_reyes_without_displacement_is_identity():
    buffers, vd = _rig(displacement=0.0)
    params = FrameParams.default()
    flat = jax.jit(build_frame_fn(FrameConfig(**CFG)))(buffers, vd, params)
    reyes = jax.jit(build_frame_fn(FrameConfig(
        **CFG, enable_reyes=True, reyes_tris=256, reyes_dice=4,
        reyes_px=16.0)))(buffers, vd, params)
    np.testing.assert_array_equal(np.asarray(flat["image"]),
                                  np.asarray(reyes["image"]))


def test_reyes_split_stage_no_holes():
    """The split tier (reyes_split_tris > 0): huge parents take a 4-way
    midpoint split before dicing (reference: the Reyes split ping-pong,
    CLodExtension.cpp:366). split_factor=1.0 forces EVERY eligible parent
    through the split path; the finer micro surface must still be
    crack-free and still displace."""
    buffers, vd = _rig(displacement=0.5)
    params = FrameParams.default()
    flat = jax.jit(build_frame_fn(FrameConfig(**CFG)))(buffers, vd, params)
    reyes = jax.jit(build_frame_fn(FrameConfig(
        **CFG, enable_reyes=True, reyes_tris=256, reyes_dice=4,
        reyes_px=16.0, reyes_split_tris=64,
        reyes_split_factor=1.0)))(buffers, vd, params)
    img_f = np.asarray(flat["image"]).astype(np.int32)
    img_r = np.asarray(reyes["image"]).astype(np.int32)
    assert np.abs(img_f - img_r).mean() > 0.5
    cov_f = np.asarray(flat["depth_padded"]) > 0
    cov_r = np.asarray(reyes["depth_padded"]) > 0
    lost = cov_f & ~cov_r
    enclosed = (np.roll(cov_r, 2, 0) & np.roll(cov_r, -2, 0)
                & np.roll(cov_r, 2, 1) & np.roll(cov_r, -2, 1))
    holes = (lost & enclosed).sum()
    assert holes == 0, f"{holes} crack pixels inside the split surface"


def test_reyes_split_without_displacement_is_identity():
    """Split + dice of an undisplaced surface reproduces the flat render
    bit-for-bit — the 4 children + D^2 grid tile parents exactly."""
    buffers, vd = _rig(displacement=0.0)
    params = FrameParams.default()
    flat = jax.jit(build_frame_fn(FrameConfig(**CFG)))(buffers, vd, params)
    reyes = jax.jit(build_frame_fn(FrameConfig(
        **CFG, enable_reyes=True, reyes_tris=256, reyes_dice=4,
        reyes_px=16.0, reyes_split_tris=64,
        reyes_split_factor=1.0)))(buffers, vd, params)
    np.testing.assert_array_equal(np.asarray(flat["image"]),
                                  np.asarray(reyes["image"]))

"""Golden-image corpus at 512x512 covering the feature matrix (VERDICT r2:
the 2-image 128^2 corpus couldn't catch per-subsystem drift).

One shared scene exercises LOD clusters, textures, alpha-MASK foliage,
transparency, and three light types; each golden renders one feature
config. Regenerate intentionally-changed goldens with
    BRTPU_UPDATE_GOLDENS=1 python -m pytest tests/test_goldens_512.py
"""

import dataclasses
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_goldens import _check  # noqa: E402

from basicrenderer_tpu.graph.framedata import (FrameConfig, FrameParams,
                                               make_view)
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import clusters, procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.models.textures import TextureRegistry
from basicrenderer_tpu.ops import vsm as vsm_ops
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.utils import math3d

QX90 = np.asarray(math3d.quat_from_axis_angle((1, 0, 0), np.pi / 2))

W = H = 512
BASE = dict(width=W, height=H, tile_h=16, tile_w=128, max_pairs=1 << 15,
            enable_clod=True, max_visible_clusters=1024,
            use_pallas_raster=False)


@pytest.fixture(scope="module")
def rig():
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard(a=(1, 1, 1), b=(0.15, 0.15, 0.15), squares=8)
    # Alpha-MASK foliage: checker pattern in the ALPHA channel.
    r = tex.resolution
    yy, xx = np.mgrid[0:r, 0:r]
    hole = (((yy * 4 // r) + (xx * 4 // r)) % 2).astype(np.float32)
    leaf_img = np.dstack([np.full((r, r), 0.2, np.float32),
                          np.full((r, r), 0.7, np.float32),
                          np.full((r, r), 0.2, np.float32), hole])
    leaf = tex.add(leaf_img, srgb=False)
    sphere = meshes.add(clusters.to_mesh_data(clusters.build_cluster_lod(
        procedural.make_uv_sphere(0.8, rings=24, sectors=48))))
    plane = meshes.add(procedural.make_plane(8.0, 2))
    cube = meshes.add(procedural.make_cube(0.7))
    quad = meshes.add(procedural.make_plane(1.2, 1))
    floor_m = mats.add(Material(
        base_color=np.array([0.7, 0.7, 0.72, 1], np.float32),
        roughness=0.25, metallic=0.1, base_color_texture=checker))
    gold_m = mats.add(Material(
        base_color=np.array([0.9, 0.6, 0.25, 1], np.float32),
        roughness=0.35, metallic=0.8))
    glass_m = mats.add(Material(
        base_color=np.array([0.4, 0.6, 0.9, 0.45], np.float32),
        roughness=0.1, alpha_blend=True))
    leaf_m = mats.add(Material(
        base_color=np.array([1, 1, 1, 1], np.float32), roughness=0.7,
        alpha_cutoff=0.5, base_color_texture=leaf))
    sc = Scene()
    sc.create_renderable(plane, floor_m)
    sc.create_renderable(sphere, gold_m, position=(0, 0.8, 0))
    sc.create_renderable(cube, 0, position=(-1.4, 0.35, 0.6))
    sc.create_renderable(quad, glass_m, position=(0.9, 0.7, 1.2),
                         rotation=QX90)
    sc.create_renderable(quad, leaf_m, position=(-0.6, 0.7, 1.6),
                         rotation=QX90)
    sc.create_directional_light(direction=(-0.5, -1, -0.35), intensity=2.5)
    sc.create_point_light(position=(1.5, 1.8, -0.5),
                          color=(1.0, 0.4, 0.2), intensity=6.0)
    sc.create_spot_light(position=(-2.0, 2.5, 1.5),
                         direction=(0.6, -1, -0.4), intensity=8.0,
                         outer_cone=0.5)
    sc.set_camera(position=(2.6, 2.0, 3.2), target=(0, 0.6, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 15, max_triangles=1 << 15,
                            max_objects=16, max_materials=8, max_lights=8,
                            max_clusters=1 << 10, max_geom_clusters=1 << 10)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    bridge.build_voxel_scene(n=32)   # voxel RT pyramid (g512_voxel_rt)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos), FrameParams.default()


def _render(rig, steps=1, **flags):
    buffers, vd, params = rig
    cfg = FrameConfig(**{**BASE, **flags})
    frame = jax.jit(build_frame_fn(cfg))
    kwargs = {}
    if cfg.enable_vsm:
        kwargs["vsm_state"] = vsm_ops.init_state()
    if cfg.enable_occlusion or cfg.enable_taa:
        kwargs["prev_depth"] = jnp.zeros(
            (cfg.padded_height, cfg.padded_width), jnp.float32)
    if cfg.enable_taa:
        kwargs["taa_history"] = None
    out = frame(buffers, vd, params, **kwargs)
    for _ in range(steps - 1):
        if cfg.enable_vsm:
            kwargs["vsm_state"] = out["vsm_state"]
        if cfg.enable_occlusion or cfg.enable_taa:
            kwargs["prev_depth"] = out["depth_padded"]
        if cfg.enable_taa:
            kwargs["taa_history"] = out["taa_out"]
        out = frame(buffers, vd, params, **kwargs)
    return np.asarray(out["image"])


def test_g512_clod_textured_ibl(rig):
    _check("g512_clod_textured_ibl", _render(
        rig, enable_textures=True, texture_downscale=1, enable_ibl=True,
        tex_channels=("base", "normal", "mr")))


def test_g512_vsm_converged(rig):
    _check("g512_vsm", _render(rig, steps=4, enable_vsm=True))


def test_g512_ssr(rig):
    _check("g512_ssr", _render(rig, enable_ssr=True, ssr_downscale=2))


def test_g512_oit(rig):
    _check("g512_oit", _render(rig, enable_oit=True))


def test_g512_alpha_mask(rig):
    _check("g512_alpha_mask", _render(rig, enable_alpha_mask=True,
                                      enable_textures=True,
                                      texture_downscale=1))


def test_g512_clustered_lights(rig):
    _check("g512_clustered", _render(rig, enable_clustered=True))


def test_g512_gtao_bloom(rig):
    _check("g512_gtao_bloom", _render(rig, enable_gtao=True,
                                      enable_bloom=True,
                                      enable_auto_exposure=True))


def test_g512_occlusion_two_phase(rig):
    _check("g512_occlusion", _render(rig, steps=3, enable_occlusion=True))


def test_g512_taa_static(rig):
    _check("g512_taa", _render(rig, steps=3, enable_taa=True))


def test_g512_voxel_rt(rig):
    from basicrenderer_tpu.models.voxels import static_level_offsets
    _check("g512_voxel_rt", _render(
        rig, enable_voxel_rt=True, enable_ibl=True, voxel_n=32,
        voxel_level_offsets=static_level_offsets(32)))


@pytest.fixture(scope="module")
def openpbr_rig():
    """Glass (transmission), skin (subsurface), brushed metal (anisotropy)
    spheres over a checkered floor — the OpenPBR extension surface
    (reference: PerMaterialOpenPBRCB, ShaderBuffers.h:277-334)."""
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard(a=(1, 1, 1), b=(0.15, 0.15, 0.15), squares=8)
    sphere = meshes.add(clusters.to_mesh_data(clusters.build_cluster_lod(
        procedural.make_uv_sphere(0.8, rings=24, sectors=48))))
    plane = meshes.add(procedural.make_plane(8.0, 2))
    floor_m = mats.add(Material(
        base_color=np.array([0.7, 0.7, 0.72, 1], np.float32),
        roughness=0.3, base_color_texture=checker))
    glass_m = mats.add(Material(
        base_color=np.array([1, 1, 1, 1], np.float32), roughness=0.05,
        transmission_weight=1.0,
        transmission_color=np.array([0.4, 0.9, 0.5], np.float32), ior=1.5))
    skin_m = mats.add(Material(
        base_color=np.array([0.85, 0.62, 0.52, 1], np.float32),
        roughness=0.55, subsurface_weight=0.8,
        subsurface_color=np.array([1.0, 0.35, 0.25], np.float32),
        subsurface_radius=0.6))
    brushed_m = mats.add(Material(
        base_color=np.array([0.9, 0.9, 0.92, 1], np.float32),
        roughness=0.35, metallic=1.0, anisotropy_strength=0.85,
        anisotropy_rotation=0.6))
    sc = Scene()
    sc.create_renderable(plane, floor_m)
    sc.create_renderable(sphere, glass_m, position=(-1.6, 0.8, 0))
    sc.create_renderable(sphere, skin_m, position=(0, 0.8, -0.4))
    sc.create_renderable(sphere, brushed_m, position=(1.6, 0.8, 0))
    sc.create_directional_light(direction=(-0.5, -1, -0.35), intensity=2.5)
    sc.create_point_light(position=(0.0, 2.2, 2.0),
                          color=(1.0, 0.9, 0.8), intensity=5.0)
    sc.set_camera(position=(0.4, 2.0, 4.2), target=(0, 0.7, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 15, max_triangles=1 << 15,
                            max_objects=16, max_materials=8, max_lights=8,
                            max_clusters=1 << 10, max_geom_clusters=1 << 10)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos), FrameParams.default()


def test_g512_openpbr_ext(openpbr_rig):
    _check("g512_openpbr", _render(
        openpbr_rig, enable_textures=True, texture_downscale=1,
        enable_oit=True, oit_layers=2, enable_transmission=True,
        enable_sss=True, enable_aniso=True, enable_ibl=True))

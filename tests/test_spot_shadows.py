"""Shadow-casting spot lights: per-light shadow views + shadowed
full-screen shade, excluded from the tiled loop (reference: LightManager
per-light shadow cameras)."""

import dataclasses

import numpy as np
import jax

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _scene(cast_shadows=True):
    meshes, mats = MeshRegistry(), MaterialRegistry()
    cube = meshes.add(procedural.make_cube(0.8))
    plane = meshes.add(procedural.make_plane(12.0, 4))
    white = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                              roughness=0.9))
    sc = Scene()
    sc.create_renderable(plane, white)
    sc.create_renderable(cube, white, position=(0, 0.8, 0))
    # A single spot light above, slightly offset, shining down on the cube.
    sc.create_spot_light(position=(1.5, 5.0, 1.0), direction=(-0.3, -1, -0.2),
                         intensity=60.0, range=12.0, inner_cone=0.5,
                         outer_cone=0.9, cast_shadows=cast_shadows)
    sc.set_camera(position=(4, 4, 5), target=(0, 0.5, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=8, max_materials=4, max_lights=8,
                            max_clusters=16, max_geom_clusters=16)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 12, use_pallas_raster=False,
                  enable_clod=True, max_visible_clusters=16,
                  enable_clustered=True, max_shadow_lights=1,
                  spot_shadow_resolution=256, shadow_clusters=16)


def test_spot_shadow_darkens_occluded_ground():
    buffers, vd = _scene(True)
    params = FrameParams.default()
    out = jax.jit(build_frame_fn(CFG))(buffers, vd, params)
    img = np.asarray(out["image"]).astype(np.float32)
    # Same scene with shadows off for this light: slot -1 -> tiled path.
    b2, _ = _scene(False)
    cfg0 = dataclasses.replace(CFG, max_shadow_lights=0)
    base = np.asarray(jax.jit(build_frame_fn(cfg0))(
        b2, vd, params)).astype(object) if False else np.asarray(
        jax.jit(build_frame_fn(cfg0))(b2, vd, params)["image"]).astype(
            np.float32)
    ratio = (img.mean(-1) + 1) / (base.mean(-1) + 1)
    vis = np.asarray(out["vis"])
    shadowed = (ratio < 0.7) & (vis > 0)
    # The cube blocks the spot -> a shadow region on the ground.
    assert shadowed.sum() > 30, shadowed.sum()
    # Most lit surface unchanged (the spot still lights the rest).
    assert (ratio[(vis > 0)] > 0.8).mean() > 0.5


def test_point_light_cube_shadow():
    """A shadow-casting POINT light: the cube blocks light from reaching
    the ground beneath it (6-face cube map, face-selected sampling)."""
    meshes, mats = MeshRegistry(), MaterialRegistry()
    cube = meshes.add(procedural.make_cube(0.8))
    plane = meshes.add(procedural.make_plane(12.0, 4))
    white = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                              roughness=0.9))
    sc = Scene()
    sc.create_renderable(plane, white)
    sc.create_renderable(cube, white, position=(0, 1.0, 0))
    sc.create_point_light(position=(1.2, 3.5, 0.8), intensity=60.0,
                          range=14.0, cast_shadows=True)
    sc.set_camera(position=(4, 4, 5), target=(0, 0.5, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=8, max_materials=4, max_lights=8,
                            max_clusters=16, max_geom_clusters=16)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    cfg = dataclasses.replace(CFG, max_shadow_lights=0, max_shadow_cubes=1,
                              point_shadow_resolution=128)
    params = FrameParams.default()
    out = jax.jit(build_frame_fn(cfg))(buffers, vd, params)
    img = np.asarray(out["image"]).astype(np.float32)
    cfg0 = dataclasses.replace(cfg, max_shadow_cubes=0)
    base = np.asarray(jax.jit(build_frame_fn(cfg0))(
        buffers, vd, params)["image"]).astype(np.float32)
    ratio = (img.mean(-1) + 1) / (base.mean(-1) + 1)
    vis = np.asarray(out["vis"])
    shadowed = (ratio < 0.7) & (vis > 0)
    assert shadowed.sum() > 30, shadowed.sum()
    assert (ratio[(vis > 0)] > 0.8).mean() > 0.5

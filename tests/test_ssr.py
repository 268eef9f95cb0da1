"""Screen-space reflections: mirror-floor scene shows the cube's
reflection below it; rough floors don't reflect.

Reference analogue: SSSR composite (RenderGraphBuildHelper.h:532-585)."""

import dataclasses

import numpy as np
import jax
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _mirror_scene(floor_roughness):
    meshes, mats = MeshRegistry(), MaterialRegistry()
    cube = meshes.add(procedural.make_cube(1.0))
    # Fine subdivision: triangles crossing the near plane are
    # guard-band rejected (no clipping yet), so big floor tris
    # would vanish near the camera.
    plane = meshes.add(procedural.make_plane(20.0, 16))
    mirror = mats.add(Material(
        base_color=np.array([0.9, 0.9, 0.9, 1], np.float32),
        metallic=1.0, roughness=floor_roughness))
    red = mats.add(Material(base_color=np.array([0.9, 0.05, 0.05, 1],
                                                np.float32),
                            emissive=np.array([3.0, 0.1, 0.1], np.float32)))
    sc = Scene()
    sc.create_renderable(plane, mirror)
    sc.create_renderable(cube, red, position=(0, 1.2, 0))
    sc.create_directional_light(direction=(-0.3, -1.0, -0.2), intensity=2.0)
    sc.set_camera(position=(0, 1.6, 6), target=(0, 0.6, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 11, max_triangles=1 << 11,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=16)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 12, use_pallas_raster=False,
                  enable_ssr=True, ssr_downscale=1, ssr_steps=16,
                  ssr_thickness=0.08)


def _red_on_floor(img, vis, buffers):
    """Mean (R - B) over floor pixels below the cube (the reflection zone)."""
    img = img.astype(np.float32)
    floor = vis > 0
    # Floor pixels are the lower part of the frame (camera looks down the
    # -z axis; the cube sits above y=0.7 rows).
    zone = np.zeros_like(floor)
    zone[64:104, 52:80] = True
    sel = floor & zone
    assert sel.sum() > 100
    return (img[..., 0][sel] - img[..., 2][sel]).mean()


def test_mirror_floor_reflects_red_cube():
    buffers, vd = _mirror_scene(0.05)
    out = jax.jit(build_frame_fn(CFG))(buffers, vd, FrameParams.default())
    img = np.asarray(out["image"])
    vis = np.asarray(out["vis"])
    red_on = _red_on_floor(img, vis, buffers)

    off = dataclasses.replace(CFG, enable_ssr=False)
    out0 = jax.jit(build_frame_fn(off))(buffers, vd, FrameParams.default())
    red_off = _red_on_floor(np.asarray(out0["image"]), np.asarray(out0["vis"]),
                            buffers)
    assert red_on > red_off + 8, (red_on, red_off)


def test_rough_floor_does_not_reflect():
    buffers, vd = _mirror_scene(0.9)
    out = jax.jit(build_frame_fn(CFG))(buffers, vd, FrameParams.default())
    img = np.asarray(out["image"])
    vis = np.asarray(out["vis"])
    red_on = _red_on_floor(img, vis, buffers)
    off = dataclasses.replace(CFG, enable_ssr=False)
    out0 = jax.jit(build_frame_fn(off))(buffers, vd, FrameParams.default())
    red_off = _red_on_floor(np.asarray(out0["image"]), np.asarray(out0["vis"]),
                            buffers)
    assert abs(red_on - red_off) < 4

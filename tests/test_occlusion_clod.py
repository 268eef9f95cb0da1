"""Cluster-granular two-phase HZB occlusion on the virtualized-geometry path.

Reference analogue: phase-1/phase-2 cluster culling with replay buffers
(computeCulling.hlsl, CLodExtension.cpp:1474-1514). The contract tested here:
occlusion culling must reduce rasterized pair count on an occlusion-heavy
scene while producing a BIT-IDENTICAL image to the single-phase render.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _wall_scene():
    """A wall close to the camera hides a dense field of spheres behind it."""
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    wall = meshes.add(procedural.make_cube(1.0))
    sphere = meshes.add(procedural.make_uv_sphere(0.5, rings=12, sectors=24))
    red = mats.add(Material(name="red",
                            base_color=np.array([0.8, 0.1, 0.1, 1], np.float32)))
    blue = mats.add(Material(name="blue",
                             base_color=np.array([0.1, 0.2, 0.8, 1], np.float32)))
    sc = Scene()
    # Wall spans the whole view at z=2 (camera at z=6 looking at origin).
    sc.create_renderable(wall, red, position=(0, 0, 2), scale=(12, 12, 0.2))
    # Hidden field behind the wall.
    for i in range(6):
        for j in range(6):
            sc.create_renderable(sphere, blue,
                                 position=((i - 2.5) * 1.5, (j - 2.5) * 1.5, -3))
    sc.create_directional_light(direction=(-0.3, -1, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 0, 6), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 13, max_triangles=1 << 13,
                            max_objects=64, max_materials=8, max_lights=4,
                            max_clusters=256)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 14, use_pallas_raster=False,
                  enable_clod=True, max_visible_clusters=256,
                  max_phase2_clusters=64)


def test_two_phase_reduces_pairs_and_matches_single_phase():
    buffers, vd = _wall_scene()
    params = FrameParams.default()

    base = jax.jit(build_frame_fn(CFG))(buffers, vd, params)
    img_base = np.asarray(base["image"])
    pairs_base = int(base["num_pairs"])

    occfg = dataclasses.replace(CFG, enable_occlusion=True)
    frame = jax.jit(build_frame_fn(occfg))
    # Frame 0: zero prev-depth (everything passes) = warmup, fills depth.
    zero_depth = jnp.zeros((occfg.padded_height, occfg.padded_width),
                           jnp.float32)
    out0 = frame(buffers, vd, params, zero_depth)
    np.testing.assert_array_equal(np.asarray(out0["image"]), img_base)
    # Frame 1: previous depth now holds the wall -> spheres culled.
    out1 = frame(buffers, vd, params, out0["depth_padded"])
    pairs_occ = int(out1["num_pairs"])
    assert pairs_occ < pairs_base * 0.6, \
        f"occlusion saved too little: {pairs_occ} vs {pairs_base}"
    np.testing.assert_array_equal(np.asarray(out1["image"]), img_base)
    assert int(out1["cluster_overflow"]) == 0


def test_disocclusion_recovers_via_phase2():
    """Seed prev-depth with a FULL-SCREEN near occluder (everything phase-1
    culled), then render: phase 2 must re-test against the fresh HZB and
    restore the full image."""
    buffers, vd = _wall_scene()
    params = FrameParams.default()
    # Full disocclusion pushes the ENTIRE cut through phase 2, so the replay
    # budget must cover it here (in production a small budget amortizes the
    # recovery over a few frames, surfaced by cluster_overflow).
    occfg = dataclasses.replace(CFG, enable_occlusion=True,
                                max_phase2_clusters=256)
    frame = jax.jit(build_frame_fn(occfg))
    base = jax.jit(build_frame_fn(CFG))(buffers, vd, params)

    # Bogus near-plane prev depth: reverse-Z 0.999 occludes everything.
    near = jnp.full((occfg.padded_height, occfg.padded_width), 0.999,
                    jnp.float32)
    out = frame(buffers, vd, params, near)
    # Phase 1 rasters nothing; phase 2 sees an empty fresh HZB and re-rasters
    # everything the budget allows.
    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  np.asarray(base["image"]))

"""Tiled many-light culling + shading: the clustered path must match the
brute-force full-screen light loop, and the Pallas kernel must match its
jnp twin."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def build_many_light_scene(n_lights=60):
    rng = np.random.default_rng(5)
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    plane = meshes.add(procedural.make_plane(20.0, 4))
    sphere = meshes.add(procedural.make_uv_sphere(0.6, 8, 16))
    m = mats.add(Material(base_color=np.array([0.7, 0.7, 0.7, 1], np.float32),
                          roughness=0.5))
    sc = Scene()
    sc.create_renderable(plane, m)
    for i in range(6):
        sc.create_renderable(sphere, m, position=(i * 2.0 - 5, 0.6, 0))
    for _ in range(n_lights):
        p = rng.uniform(-8, 8, 3)
        p[1] = rng.uniform(0.5, 3)
        col = rng.uniform(0.2, 1.0, 3)
        sc.create_point_light(position=p, color=col, intensity=5.0,
                              range=rng.uniform(2, 6))
    sc.set_camera(position=(0, 6, 12), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 12, max_triangles=1 << 12,
                            max_objects=16, max_materials=8, max_lights=128)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    return sc, bridge


def _render(cfg):
    sc, bridge = build_many_light_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    return jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())


BASE = dict(width=128, height=128, tile_h=16, tile_w=128,
            max_pairs=1 << 12, use_pallas_raster=False)


def test_tiled_lighting_matches_bruteforce():
    out_brute = _render(FrameConfig(**BASE, enable_clustered=False))
    out_tiled = _render(FrameConfig(**BASE, enable_clustered=True,
                                    max_lights_per_cluster=64))
    assert int(out_tiled["light_overflow"]) == 0
    hdr_b = np.asarray(out_brute["hdr"])
    hdr_t = np.asarray(out_tiled["hdr"])
    np.testing.assert_allclose(hdr_t, hdr_b, rtol=2e-3, atol=2e-3)


def test_tiled_lighting_overflow_reported():
    out = _render(FrameConfig(**BASE, enable_clustered=True,
                              max_lights_per_cluster=4))
    assert int(out["light_overflow"]) > 0


def test_tiled_shade_pallas_interpret_matches_ref():
    from basicrenderer_tpu.ops import lighting
    sc, bridge = build_many_light_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    cfg = FrameConfig(**BASE, enable_clustered=True, max_lights_per_cluster=32)
    rng = np.random.default_rng(0)
    Hp, Wp = cfg.padded_height, cfg.padded_width
    depth_p = jnp.asarray(rng.uniform(0.01, 0.2, (Hp, Wp)).astype(np.float32))
    payload, counts, _ = lighting.cull_lights_tiles(
        depth_p, buffers.lights, buffers.num_lights, vd, cfg)
    shade_in = jnp.asarray(
        rng.standard_normal((lighting.SHADE_IN_CHANNELS, Hp, Wp)).astype(np.float32))
    # Normalize the normal channels + make valid 0/1.
    n = shade_in[0:3]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=0, keepdims=True), 1e-6)
    shade_in = shade_in.at[0:3].set(n).at[11].set(
        (shade_in[11] > 0).astype(jnp.float32))
    a = lighting.tiled_shade_ref(shade_in, payload, counts, vd.cam_pos, cfg)
    b = lighting.tiled_shade_pallas(shade_in, payload, counts, vd.cam_pos, cfg,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)

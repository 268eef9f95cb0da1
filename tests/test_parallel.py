"""Multi-chip tile sharding: the sharded path wraps the SAME frame body as
the single-device path (graph/frame._render_body), so outputs must match the
single-device frame on a virtual 8-device CPU mesh — including the
full-featured flagship config (clod + shadows + clustered + IBL + GTAO +
bloom + TAA + auto-exposure)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.parallel.tile_sharding import build_sharded_frame_fn

from tests.test_frame_e2e import build_test_scene


def _frame_inputs(width=128, height=128):
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=width / height)
    vd = make_view(view, proj, pos)
    return buffers, vd, FrameParams.default()


def _assert_match(out_s, out_1):
    np.testing.assert_array_equal(np.asarray(out_s["vis"]), np.asarray(out_1["vis"]))
    np.testing.assert_allclose(np.asarray(out_s["depth"]), np.asarray(out_1["depth"]),
                               rtol=1e-5, atol=1e-6)
    img_s = np.asarray(out_s["image"]).astype(np.int32)
    img_1 = np.asarray(out_1["image"]).astype(np.int32)
    # Same passes, same math; allow 1 ulp of uint8 rounding from fusion
    # differences across the shard boundary collectives.
    assert np.abs(img_s - img_1).max() <= 1
    assert (img_s != img_1).mean() < 0.01


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_frame_matches_single_device():
    n = 8
    config = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False)
    assert config.tiles_y % n == 0
    buffers, vd, params = _frame_inputs()

    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    sharded = jax.jit(build_sharded_frame_fn(config, mesh))
    out_s = sharded(buffers, vd, params)

    single = jax.jit(build_frame_fn(config))
    out_1 = single(buffers, vd, params)
    _assert_match(out_s, out_1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_full_feature_frame_matches_single_device():
    """The flagship config: virtualized geometry + CSM + clustered lights +
    IBL + GTAO + bloom + auto-exposure, sharded vs single-chip."""
    n = 8
    config = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False,
                         enable_clod=True, max_visible_clusters=128,
                         enable_shadows=True, num_cascades=2,
                         shadow_resolution=128,
                         enable_clustered=True, max_lights_per_cluster=8,
                         enable_ibl=True, enable_gtao=True,
                         enable_bloom=True, enable_auto_exposure=True)
    buffers, vd, params = _frame_inputs()

    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    out_s = jax.jit(build_sharded_frame_fn(config, mesh))(buffers, vd, params)
    out_1 = jax.jit(build_frame_fn(config))(buffers, vd, params)
    _assert_match(out_s, out_1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_taa_history_feedback():
    """Row-sharded TAA history feeds back across frames (frames-in-flight)."""
    n = 8
    config = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False,
                         enable_taa=True)
    buffers, vd, params = _frame_inputs()
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    frame = jax.jit(build_sharded_frame_fn(config, mesh))
    out1 = frame(buffers, vd, params)
    out2 = frame(buffers, vd, params, None, out1["taa_out"])
    img = np.asarray(out2["image"])
    assert img.shape == (128, 128, 3) and img.std() > 10


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sharded_frame_other_mesh_sizes():
    n = 4
    config = FrameConfig(width=128, height=64, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False)
    buffers, vd, params = _frame_inputs(128, 64)
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    out = jax.jit(build_sharded_frame_fn(config, mesh))(buffers, vd, params)
    assert np.asarray(out["image"]).shape == (64, 128, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_vsm_matches_single_device():
    """Virtual shadow maps under tile sharding: the VSM page cache is
    replicated state threaded across frames; two sharded steps must match
    two single-device steps exactly (pages render identically on every
    shard; only the screen-space sample is row-local)."""
    from basicrenderer_tpu.ops import vsm as vsm_ops
    n = 8
    config = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False,
                         enable_clod=True, max_visible_clusters=128,
                         enable_vsm=True, shadow_clusters=64)
    buffers, vd, params = _frame_inputs()
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    sharded = jax.jit(build_sharded_frame_fn(config, mesh))
    single = jax.jit(build_frame_fn(config))
    out_s = sharded(buffers, vd, params, vsm_state=vsm_ops.init_state())
    out_1 = single(buffers, vd, params, vsm_state=vsm_ops.init_state())
    # Second frame consumes the converged page cache.
    out_s = sharded(buffers, vd, params, vsm_state=out_s["vsm_state"])
    out_1 = single(buffers, vd, params, vsm_state=out_1["vsm_state"])
    _assert_match(out_s, out_1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_streaming_feedback_matches_single_device():
    """Geometry-streaming feedback (touched_groups) and sampler feedback
    (tex_wanted) must survive sharding: out_specs derive from the body's
    actual output tree, and tex_wanted is pmin-reduced across shards."""
    from basicrenderer_tpu.models import procedural
    from basicrenderer_tpu.models.materials import Material, MaterialRegistry
    from basicrenderer_tpu.models.mesh import MeshRegistry
    from basicrenderer_tpu.models.textures import TextureRegistry
    from basicrenderer_tpu.scene.bridge import (BridgeCapacities,
                                                SceneRenderBridge)
    from basicrenderer_tpu.scene.scene import Scene

    n = 8
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard()
    from basicrenderer_tpu.models import clusters
    lod = clusters.build_cluster_lod(
        procedural.make_uv_sphere(1.0, rings=24, sectors=48),
        use_cache=False)
    sphere = meshes.add(clusters.to_mesh_data(lod))
    red = mats.add(Material(base_color=np.array([0.8, 0.2, 0.2, 1],
                                                np.float32),
                            base_color_texture=checker))
    sc = Scene()
    sc.create_renderable(sphere, red, position=(0, 1, 0))
    sc.create_directional_light(direction=(-0.4, -1, -0.3), intensity=3.0)
    sc.set_camera(position=(3, 2.5, 4), target=(0, 1, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 14, max_triangles=1 << 14,
                            max_objects=8, max_materials=8, max_lights=4,
                            max_clusters=512, max_geom_clusters=256,
                            max_groups=256)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    params = FrameParams.default()

    # 256 px tall / 8 shards / texture_downscale 2 -> 16 ds-rows per shard
    # = exactly one sampler pixel-block row: the 16x16 block grouping then
    # matches the single-chip grouping and parity is exact (with other
    # shapes block regrouping at seams shifts per-block mip choices — a
    # graceful blur difference, never wrong memory).
    config = FrameConfig(width=128, height=256, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False,
                         enable_clod=True, max_visible_clusters=64,
                         enable_streaming=True,
                         enable_textures=True, tex_channels=("base",),
                         enable_texture_streaming=True)
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    out_s = jax.jit(build_sharded_frame_fn(config, mesh))(buffers, vd, params)
    out_1 = jax.jit(build_frame_fn(config))(buffers, vd, params)
    assert "touched_groups" in out_s and "tex_wanted" in out_s
    np.testing.assert_allclose(np.asarray(out_s["touched_groups"]),
                               np.asarray(out_1["touched_groups"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_s["tex_wanted"]),
                                  np.asarray(out_1["tex_wanted"]))
    _assert_match(out_s, out_1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_oit_matches_single_device():
    """OIT K-peeling sharded vs single-chip (transparent cube over a
    plane)."""
    from basicrenderer_tpu.models import procedural
    from basicrenderer_tpu.models.materials import Material, MaterialRegistry
    from basicrenderer_tpu.models.mesh import MeshRegistry
    from basicrenderer_tpu.scene.bridge import (BridgeCapacities,
                                                SceneRenderBridge)
    from basicrenderer_tpu.scene.scene import Scene

    n = 8
    meshes, mats = MeshRegistry(), MaterialRegistry()
    cube = meshes.add(procedural.make_cube(1.0))
    plane = meshes.add(procedural.make_plane(10.0, 2))
    gray = mats.add(Material(base_color=np.array([0.5, 0.5, 0.5, 1],
                                                 np.float32), roughness=0.9))
    glass = mats.add(Material(base_color=np.array([0.4, 0.6, 0.9, 0.45],
                                                  np.float32),
                              alpha_blend=True, roughness=0.1))
    sc = Scene()
    sc.create_renderable(plane, gray)
    sc.create_renderable(cube, glass, position=(0, 0.6, 0))
    sc.create_directional_light(direction=(-0.4, -1, -0.3), intensity=3.0)
    sc.set_camera(position=(3, 2.5, 4), target=(0, 0.5, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=16, max_materials=8, max_lights=4)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    params = FrameParams.default()

    config = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False,
                         enable_clod=True, max_visible_clusters=64,
                         enable_oit=True, oit_layers=2, oit_clusters=32)
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    out_s = jax.jit(build_sharded_frame_fn(config, mesh))(buffers, vd, params)
    out_1 = jax.jit(build_frame_fn(config))(buffers, vd, params)
    assert "oit_overflow" in out_s
    _assert_match(out_s, out_1)

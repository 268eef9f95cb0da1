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

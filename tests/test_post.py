"""Post stack: bloom, auto-exposure, GTAO, TAA unit + integration tests."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.ops import post

from tests.test_frame_e2e import build_test_scene

BASE = dict(width=128, height=128, tile_h=16, tile_w=128,
            max_pairs=1 << 12, use_pallas_raster=False)


def test_bloom_spreads_bright_pixels():
    hdr = jnp.zeros((64, 128, 3), jnp.float32).at[32, 64].set(100.0)
    out = np.asarray(post.bloom(hdr, jnp.float32(1.0), jnp.float32(1.0)))
    # Neighbors of the bright pixel gained energy.
    assert out[32, 60].sum() > 0.01
    assert out[20, 64].sum() > 0.001
    # Dark background far away stays dark-ish.
    assert out[5, 5].sum() < out[32, 63].sum()


def test_auto_exposure_normalizes_brightness():
    dim = jnp.full((64, 128, 3), 0.02, jnp.float32)
    bright = jnp.full((64, 128, 3), 2.0, jnp.float32)
    e_dim = float(post.auto_exposure(dim))
    e_bright = float(post.auto_exposure(bright))
    assert e_dim > 1.0 > e_bright
    # Exposed average should land near the target gray.
    assert abs(0.02 * e_dim - 0.18) / 0.18 < 0.3
    assert abs(2.0 * e_bright - 0.18) / 0.18 < 0.3


def test_gtao_darkens_corners():
    """A step edge in depth should produce occlusion near the step."""
    H, W = 64, 128
    # Left half at distance 10 (lin), right half at 9 — a 1-unit step that
    # sits inside the AO radius falloff window.
    depth = jnp.full((H, W), 0.01, jnp.float32).at[:, 64:].set(0.1 / 9.0)
    normal = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    view = make_view(np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32),
                     np.zeros(3, np.float32))
    ao = np.asarray(post.gtao(depth, normal, view, jnp.float32(0.1),
                              jnp.float32(0.5), jnp.float32(1.0), jnp.int32(0)))
    # Far side next to the closer wall is occluded; far-field is not.
    assert ao[32, 60] < ao[32, 5] - 0.05
    assert ao.min() >= 0.0 and ao.max() <= 1.0


def test_taa_resolve_converges():
    cur = jnp.ones((16, 32, 3), jnp.float32)
    hist = jnp.zeros((16, 32, 3), jnp.float32)
    out = post.taa_resolve(cur, hist, jnp.float32(0.1))
    # Neighborhood clamp: history (0) clamps to min of current (1) => 1.
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
    # Non-uniform current -> clamp window [0, 2]; history 0.5 survives and
    # blends toward current.
    cur2 = jnp.zeros((16, 32, 3), jnp.float32).at[::2].set(2.0)
    hist2 = jnp.full((16, 32, 3), 0.5, jnp.float32)
    out2 = post.taa_resolve(cur2, hist2, jnp.float32(0.25))
    expect = 0.25 * float(cur2.mean()) + 0.75 * 0.5
    assert abs(float(out2.mean()) - expect) < 0.1


def test_frame_with_full_post_stack():
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    cfg = FrameConfig(**BASE, enable_bloom=True, enable_gtao=True,
                      enable_taa=True, enable_auto_exposure=True)
    f = jax.jit(build_frame_fn(cfg))
    params = FrameParams.default()
    out1 = f(buffers, vd, params)
    img1 = np.asarray(out1["image"])
    assert img1.std() > 10
    # Second frame with history.
    out2 = f(buffers, vd, params, None, out1["taa_out"])
    img2 = np.asarray(out2["image"])
    assert img2.shape == img1.shape


def test_taau_upscaling_renders_and_converges():
    """Render 128x64, present 256x128 via TAAU (reference:
    UpscalingManager render-low/present-high)."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_frame_e2e import build_test_scene
    from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
    from basicrenderer_tpu.graph.frame import build_frame_fn
    from basicrenderer_tpu.ops import post as post_ops

    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=2.0)
    cfg = FrameConfig(width=128, height=64, tile_h=16, tile_w=128,
                      max_pairs=1 << 12, use_pallas_raster=False,
                      enable_taa=True, output_width=256, output_height=128)
    frame = jax.jit(build_frame_fn(cfg))
    params = FrameParams.default()
    hist = None
    img = None
    for i in range(6):
        jx, jy = post_ops.taa_jitter(i)
        pj = proj.copy()
        pj[0] += (2.0 * jx / cfg.width) * pj[3]
        pj[1] += (2.0 * jy / cfg.height) * pj[3]
        out = frame(buffers, make_view(view, pj, pos), params,
                    taa_history=hist)
        hist = out["taa_out"]
        img = np.asarray(out["image"])
    assert img.shape == (128, 256, 3)
    assert hist.shape == (128, 256, 3)
    assert img.std() > 10   # a real scene, not a constant

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


def _gtao_scene(H=96, W=128, eye=(5.0, 3.0, 5.0), wall=True):
    """Analytic floor (y=0) + optional wall (x=0) depth/normal images.
    Per-pixel ray vs plane intersection gives exact depth in the same
    reverse-Z projection the renderer uses."""
    from basicrenderer_tpu.utils import math3d
    view = math3d.np_look_at(np.array(eye, np.float32),
                             np.array([2.0, 0.0, 0.0], np.float32),
                             np.array([0.0, 1.0, 0.0], np.float32))
    proj = math3d.np_perspective(1.2, W / H, 0.1, 100.0)
    vp = proj @ view
    inv = np.linalg.inv(vp)
    sx = (np.arange(W, dtype=np.float32) + 0.5) / W * 2.0 - 1.0
    sy = 1.0 - (np.arange(H, dtype=np.float32) + 0.5) / H * 2.0
    gx, gy = np.meshgrid(sx, sy)
    pt = inv @ np.stack([gx, gy, np.full_like(gx, 0.5),
                         np.ones_like(gx)]).reshape(4, -1)
    pt = (pt[:3] / pt[3]).reshape(3, H, W)
    o = np.array(eye, np.float32)[:, None, None]
    d = pt - o
    d = d / np.linalg.norm(d, axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_floor = np.where(d[1] < -1e-6, -o[1] / d[1], np.inf)
        t_wall = np.where(d[0] < -1e-6, -o[0] / d[0],
                          np.inf) if wall else np.full_like(t_floor, np.inf)
    use_wall = t_wall < t_floor
    t = np.where(use_wall, t_wall, t_floor)
    t = np.where(np.isfinite(t), t, 1e4)
    P = o + d * t
    clip = vp @ np.concatenate([P, np.ones((1, H, W))]).reshape(4, -1)
    depth = (clip[2] / clip[3]).reshape(H, W).astype(np.float32)
    normal = np.zeros((H, W, 3), np.float32)
    normal[..., 0] = np.where(use_wall, 1.0, 0.0)
    normal[..., 1] = np.where(use_wall, 0.0, 1.0)
    vd = make_view(view, proj, np.array(eye, np.float32))
    return jnp.asarray(depth), jnp.asarray(normal), vd, use_wall, P


def test_gtao_darkens_corners():
    """Floor+wall corner: floor pixels near the wall are occluded, the
    open floor is not."""
    depth, normal, vd, use_wall, P = _gtao_scene()
    ao = np.asarray(post.gtao(depth, normal, vd, jnp.float32(0.1),
                              jnp.float32(0.5), jnp.float32(1.0),
                              jnp.int32(0)))
    assert ao.min() >= 0.0 and ao.max() <= 1.0
    floor = ~use_wall
    near_corner = floor & (P[0] > 0.1) & (P[0] < 0.8)
    open_floor = floor & (P[0] > 4.0) & (P[0] < 8.0)
    assert near_corner.sum() > 50 and open_floor.sum() > 50
    assert ao[near_corner].mean() < ao[open_floor].mean() - 0.08
    # The open floor is essentially unoccluded.
    assert ao[open_floor].mean() > 0.85


def test_gtao_depends_on_normal():
    """Same depth, different normals => different AO (the cosine-weighted
    arc integral consumes the surface normal; guards the round-3 bug where
    the `normal` argument was silently ignored)."""
    depth, normal, vd, use_wall, P = _gtao_scene(wall=False)
    ao_up = np.asarray(post.gtao(depth, normal, vd, jnp.float32(0.1),
                                 jnp.float32(0.5), jnp.float32(1.0),
                                 jnp.int32(0)))
    tilted = np.zeros_like(np.asarray(normal))
    tilted[..., 0] = np.sqrt(0.5)
    tilted[..., 1] = np.sqrt(0.5)
    ao_tilt = np.asarray(post.gtao(depth, jnp.asarray(tilted), vd,
                                   jnp.float32(0.1), jnp.float32(0.5),
                                   jnp.float32(1.0), jnp.int32(0)))
    floor = ~use_wall & (P[0] > 2.0) & (P[0] < 8.0)
    # A flat floor with its true normal is open; the same floor claiming a
    # 45-degree normal has half its tangent hemisphere below the horizon.
    assert ao_up[floor].mean() > ao_tilt[floor].mean() + 0.05


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

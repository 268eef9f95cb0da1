"""Near-plane clipping (reference: fixed-function HW clipping; TPU path
clips against w = eps in raster_setup.clip_near_tris, replacing the old
guard-band rejection that holed out close-up floors/walls)."""

import numpy as np
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.ops import raster_setup
from basicrenderer_tpu.utils import math3d


def test_clip_one_vertex_behind():
    """One vertex behind the camera plane -> two output triangles whose new
    vertices sit exactly on w = eps."""
    eps = 1e-3
    # Corner rows: [clip4] only (L=4).
    g0 = jnp.asarray([[-1.0, -1.0, 0.5, 2.0]])
    g1 = jnp.asarray([[1.0, -1.0, 0.5, 2.0]])
    g2 = jnp.asarray([[0.0, 1.0, 0.5, -1.0]])      # behind
    valid = jnp.asarray([True])
    h0, h1, h2, ev, src, ovf = raster_setup.clip_near_tris(
        g0, g1, g2, valid, cap=4, eps=eps)
    ev = np.asarray(ev)
    assert ev[0] and ev[4]          # two-inside case -> 2 triangles
    assert int(ovf) == 0
    ws = np.asarray(jnp.stack([h0[:, 3], h1[:, 3], h2[:, 3]]))
    # All live corners are at w > 0; clipped corners at ~eps.
    live_ws = ws[:, ev]
    assert (live_ws > 0).all()
    assert np.isclose(live_ws.min(), eps, atol=1e-6)


def test_clip_two_vertices_behind():
    eps = 1e-3
    g0 = jnp.asarray([[0.0, 1.0, 0.5, 2.0]])       # inside
    g1 = jnp.asarray([[-1.0, -1.0, 0.5, -1.0]])    # behind
    g2 = jnp.asarray([[1.0, -1.0, 0.5, -0.5]])     # behind
    valid = jnp.asarray([True])
    h0, h1, h2, ev, src, ovf = raster_setup.clip_near_tris(
        g0, g1, g2, valid, cap=4, eps=eps)
    ev = np.asarray(ev)
    assert ev[0] and not ev[4]      # one-inside case -> 1 triangle
    ws = np.asarray(jnp.stack([h0[0, 3], h1[0, 3], h2[0, 3]]))
    assert (ws > 0).all()
    assert np.isclose(sorted(ws)[0], eps, atol=1e-6)


def test_clip_all_inside_or_outside_noop():
    g0 = jnp.asarray([[0.0, 0.0, 0.5, 1.0], [0.0, 0.0, 0.5, -1.0]])
    g1 = jnp.asarray([[0.0, 0.0, 0.5, 1.0], [0.0, 0.0, 0.5, -2.0]])
    g2 = jnp.asarray([[0.0, 0.0, 0.5, 1.0], [0.0, 0.0, 0.5, -3.0]])
    valid = jnp.asarray([True, True])
    *_h, ev, src, ovf = raster_setup.clip_near_tris(g0, g1, g2, valid, cap=4)
    assert not np.asarray(ev).any()
    assert int(ovf) == 0


def _floor_scene():
    """A single huge floor quad passing UNDER the camera: its near corners
    are behind the camera plane, so without clipping both triangles are
    guard-band rejected and the floor vanishes."""
    verts = np.array([
        [-50.0, -1.0, -50.0],
        [50.0, -1.0, -50.0],
        [50.0, -1.0, 50.0],
        [-50.0, -1.0, 50.0],
    ], np.float32)
    tris = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    return verts, tris


def _raster_floor(near_clip_tris):
    verts, tris = _floor_scene()
    W, H = 128, 64
    cfg = FrameConfig(width=W, height=H, tile_h=32, tile_w=128,
                      max_pairs=1 << 10, max_tiles_per_tri=4,
                      max_big_tris=128, near_clip_tris=near_clip_tris,
                      use_pallas_raster=False)
    view = math3d.np_look_at(np.array([0.0, 0.5, 0.0]),
                             np.array([0.0, 0.0, -5.0]),
                             np.array([0.0, 1.0, 0.0]))
    proj = math3d.np_perspective(1.2, W / H, 0.1, None)
    vd = make_view(view, proj, np.array([0.0, 0.5, 0.0]))
    clip = jnp.asarray(
        np.concatenate([verts, np.ones((4, 1), np.float32)], 1)
        @ np.asarray(vd.viewproj).T)
    lanes, bbox, valid, ovf = raster_setup.triangle_setup_packed(
        clip, jnp.asarray(tris), jnp.asarray([True, True]), cfg,
        None, None, None)
    pairs = raster_setup.bin_pairs(lanes, bbox, valid, cfg)
    from basicrenderer_tpu.ops.raster_ref import raster_tiles_ref
    depth, vis = raster_tiles_ref(pairs, cfg)
    return np.asarray(vis[:H, :W]), int(ovf)


def test_floor_holes_without_clipping():
    vis, _ = _raster_floor(0)
    # Guard-band rejection drops the whole floor.
    assert (vis > 0).mean() < 0.05


def test_floor_renders_with_clipping():
    vis, ovf = _raster_floor(64)
    assert ovf == 0
    # The bottom half of the frame looks down at the floor: it must be
    # covered wall-to-wall (no holes at any distance).
    bottom = vis[40:, :]
    assert (bottom > 0).mean() > 0.98, (bottom > 0).mean()

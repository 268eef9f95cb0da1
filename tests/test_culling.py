"""Culling: frustum, HZB build, occlusion test, two-phase frame integration."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.ops import culling
from basicrenderer_tpu.utils import math3d

from tests.test_frame_e2e import build_test_scene


def _view(eye=(0, 0, 5), target=(0, 0, 0), w=128, h=128):
    v = math3d.np_look_at(eye, target, [0, 1, 0])
    p = math3d.np_perspective(np.pi / 3, w / h, 0.1, 100.0)
    return jnp.asarray(p) @ jnp.asarray(v)


def test_hzb_is_conservative_min():
    depth = jnp.zeros((64, 128), jnp.float32).at[10:20, 30:60].set(0.8)
    mips = culling.build_hzb(depth, levels=4)
    assert len(mips) == 4
    # mips[0] is 1/2 res (HZB_FIRST_LEVEL=1). Any block containing an
    # uncovered pixel must report 0 (farthest): block (4,15) = rows 8-9,
    # cols 30-31 — rows 8-9 are uncovered.
    assert float(mips[0][4, 15]) == 0.0
    # A fully covered block keeps 0.8 (rows 12-13, cols 32-33).
    assert abs(float(mips[0][6, 16]) - 0.8) < 1e-6
    assert mips[3].shape == (4, 8)


def test_occlusion_small_sphere_behind_wall():
    vp = _view()
    W = H = 128
    # Full-screen "wall" 2m from the camera: reverse-Z = near/dist = 0.05.
    wall = jnp.full((H, W), 0.05, jnp.float32)
    mips = culling.build_hzb(wall, levels=4)
    centers = jnp.array([[0, 0, -20.0], [0, 0, 4.0]], jnp.float32)  # far, near
    radii = jnp.array([0.5, 0.2], jnp.float32)
    bbox, zn, behind = culling.project_sphere_bounds(vp, centers, radii, W, H)
    vis = culling.occlusion_test_hzb(mips, bbox, zn, behind, W, H)
    vis = np.asarray(vis)
    assert not vis[0]  # far sphere hidden behind the near wall
    assert vis[1]      # sphere nearer than the wall passes


def test_occlusion_empty_hzb_everything_visible():
    vp = _view()
    W = H = 128
    empty = jnp.zeros((H, W), jnp.float32)
    mips = culling.build_hzb(empty, levels=4)
    centers = jnp.array([[0, 0, -20.0]], jnp.float32)
    radii = jnp.array([0.5], jnp.float32)
    bbox, zn, behind = culling.project_sphere_bounds(vp, centers, radii, W, H)
    vis = culling.occlusion_test_hzb(mips, bbox, zn, behind, W, H)
    assert bool(vis[0])


def test_frustum_culling_reduces_pairs():
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    # Camera looking AWAY from the scene: everything frustum-culled.
    view = math3d.np_look_at([0, 1, 20], [0, 1, 40], [0, 1, 0])
    proj = math3d.np_perspective(np.pi / 3, 1.0, 0.1, None)
    vd = make_view(view, proj, np.array([0, 1, 20], np.float32))
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 12, use_pallas_raster=False,
                      enable_culling=True)
    out = jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())
    assert int(out["num_pairs"]) == 0
    assert (np.asarray(out["vis"]) == 0).all()


def test_two_phase_occlusion_frame_matches_single_phase():
    """With an empty previous depth (nothing occludes), the two-phase frame
    must produce the same visibility as the single-phase frame."""
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    params = FrameParams.default()

    base = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                       max_pairs=1 << 12, use_pallas_raster=False)
    occ = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 12, use_pallas_raster=False,
                      enable_occlusion=True, hzb_levels=4)
    out1 = jax.jit(build_frame_fn(base))(buffers, vd, params)
    prev = jnp.zeros((occ.padded_height, occ.padded_width), jnp.float32)
    out2 = jax.jit(build_frame_fn(occ))(buffers, vd, params, prev)
    np.testing.assert_array_equal(np.asarray(out2["vis"]), np.asarray(out1["vis"]))
    np.testing.assert_array_equal(np.asarray(out2["image"]), np.asarray(out1["image"]))

    # Second frame fed with the real depth: static scene => identical again.
    out3 = jax.jit(build_frame_fn(occ))(buffers, vd, params, out2["depth_padded"])
    np.testing.assert_array_equal(np.asarray(out3["vis"]), np.asarray(out1["vis"]))

"""Motion-vector TAA: motion field correctness, tile warp parity, and the
no-ghosting behavioral oracle (a moving object must not leave a trail).

Reference analogue: the motion-vector tagging the reference feeds its
upscalers (UpscalingManager.h:23-80)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, make_view
from basicrenderer_tpu.ops import motion as motion_ops
from basicrenderer_tpu.ops.raster_setup import OBJ_COMBO
from basicrenderer_tpu.ops.taa_warp import warp_history_ref, warp_history_tiles
from basicrenderer_tpu.utils import math3d


def _cam(offset):
    """Camera at x=offset looking down -z; returns (view, proj, pos)."""
    proj = math3d.np_perspective(1.0, 2.0, 0.1, None)
    pos = np.array([offset, 0.0, 5.0])
    v = math3d.np_look_at(pos, np.array([offset, 0.0, 0.0]),
                          np.array([0.0, 1.0, 0.0]))
    return v, proj, pos


def test_motion_field_camera_translation():
    """A laterally translating camera produces uniform horizontal motion of
    the expected sign and magnitude on a constant-depth wall."""
    W, H = 256, 128
    cfg = FrameConfig(width=W, height=H)
    v_prev, proj, _ = _cam(0.0)
    v_cur, _, pos = _cam(0.5)
    vp_prev = proj @ v_prev
    view = make_view(v_cur, proj, pos)
    # Depth image: a wall at z_ndc = 0.02 (reverse-Z, far-ish).
    depth = jnp.full((H, W), 0.02, jnp.float32)
    combo = jnp.zeros((H, W), jnp.float32)   # object 0, material 0
    du, dv, valid, ds = motion_ops.motion_field(
        depth, combo, view, jnp.asarray(vp_prev, jnp.float32),
        jnp.zeros((motion_ops.MAX_MOVING, 4, 4), jnp.float32),
        jnp.full((motion_ops.MAX_MOVING,), -1, jnp.int32), cfg)
    du = np.asarray(du)
    valid = np.asarray(valid)
    assert valid.all()
    # Camera moved +x, so the world (and its pixels) moved -x on screen:
    # history position of a pixel is to the RIGHT (du > 0).
    center = du[du.shape[0] // 2, du.shape[1] // 2]
    assert center > 1.0, center
    # Uniform field for a constant-depth wall.
    assert np.std(du[2:-2, 2:-2]) < 0.2


def test_motion_field_moving_object():
    """A moving object's pixels get the object's motion, not the camera's."""
    W, H = 256, 128
    cfg = FrameConfig(width=W, height=H)
    v0, proj, pos = _cam(0.0)
    vp = proj @ v0
    view = make_view(v0, proj, pos)
    depth = jnp.full((H, W), 0.05, jnp.float32)
    # Left half: object 3 (moving); right half: object 0 (static).
    combo = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) < W // 2,
        jnp.float32(3 * OBJ_COMBO), 0.0)
    # Object 3 moved +0.5 world x since last frame: prev = cur - 0.5x.
    prev_model = np.eye(4, dtype=np.float32)
    prev_model[0, 3] = -0.5
    rel = np.zeros((motion_ops.MAX_MOVING, 4, 4), np.float32)
    ids = np.full((motion_ops.MAX_MOVING,), -1, np.int32)
    rel[0] = vp @ prev_model
    ids[0] = 3
    du, dv, valid, ds = motion_ops.motion_field(
        depth, combo, view, jnp.asarray(vp, jnp.float32),
        jnp.asarray(rel), jnp.asarray(ids), cfg)
    du = np.asarray(du)
    w2 = du.shape[1] // 2
    # Static half: zero motion. Moving half: negative du (object moved +x,
    # so its surface WAS left of where it is now).
    assert np.abs(du[:, w2 + 2:]).max() < 1e-3
    assert du[du.shape[0] // 2, w2 // 2] < -1.0


def test_warp_kernel_matches_ref():
    rng = np.random.default_rng(7)
    H, W, C = 64, 256, 3
    th, tw = 32, 128
    hist = jnp.asarray(rng.random((H, W, C)).astype(np.float32))
    T = (H // th) * (W // tw)
    dy = jnp.asarray(rng.uniform(-10, 10, T).astype(np.float32))
    dx = jnp.asarray(rng.uniform(-30, 30, T).astype(np.float32))
    a = np.asarray(warp_history_ref(hist, dy, dx, th, tw))
    b = np.asarray(warp_history_tiles(hist, dy, dx, th, tw, interpret=True))
    assert np.abs(a - b).max() < 1e-5


def test_warp_identity():
    rng = np.random.default_rng(3)
    hist = jnp.asarray(rng.random((64, 256, 3)).astype(np.float32))
    z = jnp.zeros((4,), jnp.float32)
    out = np.asarray(warp_history_ref(hist, z, z, 32, 128))
    assert np.abs(out - np.asarray(hist)).max() < 1e-6


def test_taa_no_ghost_moving_object():
    """Behavioral oracle: a bright cube moving across a dark floor must not
    leave a ghost trail in the TAA output at its vacated position."""
    from basicrenderer_tpu.models.materials import Material
    from basicrenderer_tpu.models.procedural import make_cube, make_plane
    from basicrenderer_tpu.renderer import Renderer
    from basicrenderer_tpu.scene.bridge import BridgeCapacities
    from basicrenderer_tpu.scene.components import Position
    from basicrenderer_tpu.scene.scene import Scene

    # Small capacities: the Renderer's defaults budget for million-triangle
    # scenes and dominate CPU test time (the frame cost scales with
    # CAPACITY, not content — the whole fixed-shape design).
    r = Renderer(caps=BridgeCapacities(
        max_vertices=1 << 10, max_triangles=1 << 10, max_objects=8,
        max_materials=4, max_lights=4, max_clusters=32))
    scene = Scene()
    r.settings.set("maxTrianglePairs", 1 << 12)
    r.settings.set("renderResolution", (256, 128))
    r.settings.set("enableTAA", True)
    r.settings.set("taaBlend", 0.1)
    r.settings.set("enableBloom", False)
    r.settings.set("enableShadows", False)
    r.settings.set("enableClusteredLighting", False)
    r.settings.set("enableIBL", False)
    cube = r.meshes.add(make_cube())
    plane = r.meshes.add(make_plane(30.0))
    bright = r.materials.add(Material(base_color=(0.1, 0.1, 0.1, 1.0),
                                      emissive=(8.0, 8.0, 8.0)))
    dark = r.materials.add(Material(base_color=(0.02, 0.02, 0.02, 1.0)))
    scene.create_renderable(plane, dark, position=(0, -1.0, 0))
    e = scene.create_renderable(cube, bright, position=(-2.0, 0.0, 0.0))
    scene.set_camera(position=(0, 1.5, 8), target=(0, 0, 0), aspect=2.0)
    scene.create_directional_light(direction=(-0.3, -1.0, -0.2),
                                   intensity=0.5)
    r.set_current_scene(scene)

    xs = np.linspace(-2.0, 2.0, 7)
    for x in xs:
        scene.world.set(e, Position(np.array([x, 0.0, 0.0], np.float32)))
        r.update(1 / 60)
        out = r.render()
    img = np.asarray(out["hdr"])
    # The cube started at x=-2 (left of center) and ended at x=+2. Sample a
    # horizontal band at cube height on the vacated LEFT side: with ghosting
    # the trail leaves bright residue; with motion-vector reject it is dark.
    H, W = img.shape[:2]
    band = img[int(H * 0.45):int(H * 0.55), int(W * 0.12):int(W * 0.30)]
    trail = float(band.max())
    assert trail < 1.0, f"ghost trail luminance {trail}"
    # And the cube itself is bright at its final position (sanity).
    right = img[int(H * 0.3):int(H * 0.7), int(W * 0.55):int(W * 0.95)]
    assert float(right.max()) > 4.0

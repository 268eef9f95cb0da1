"""Skinning + animation: two-bone cylinder bends; palette math; clip sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.models import animation, procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshData, MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.utils import math3d


def make_two_bone_cylinder(height=2.0, segs=8, rings=9):
    """Cylinder along +Y, bone0 at base, bone1 at mid-height."""
    ys = np.linspace(0, height, rings)
    ang = np.linspace(0, 2 * np.pi, segs, endpoint=False)
    pos, jnts, wts = [], [], []
    for y in ys:
        for a in ang:
            pos.append([0.3 * np.cos(a), y, 0.3 * np.sin(a)])
            # Weight: below mid -> bone0, above -> blend to bone1.
            w1 = np.clip((y - height * 0.25) / (height * 0.5), 0, 1)
            jnts.append([0, 1, 0, 0])
            wts.append([1 - w1, w1, 0, 0])
    idx = []
    for r in range(rings - 1):
        for s in range(segs):
            a = r * segs + s
            b = r * segs + (s + 1) % segs
            c = a + segs
            d = b + segs
            idx += [[a, c, b], [b, c, d]]
    mesh = MeshData(np.array(pos, np.float32), None, None,
                    np.array(idx, np.int32),
                    joints=np.array(jnts, np.int32),
                    weights=np.array(wts, np.float32))
    mesh.normals = np.zeros((len(pos), 3), np.float32)
    mesh.normals[:, 0] = 1.0
    mesh.uvs = np.zeros((len(pos), 2), np.float32)
    return mesh


def make_two_bone_skeleton(height=2.0):
    parents = np.array([-1, 0], np.int32)
    inv_bind = np.stack([np.eye(4, dtype=np.float32),
                         np.asarray(math3d.translation([0, -height / 2, 0]))])
    rest_pos = np.array([[0, 0, 0], [0, height / 2, 0]], np.float32)
    rest_rot = np.tile(np.array([0, 0, 0, 1], np.float32), (2, 1))
    rest_scale = np.ones((2, 3), np.float32)
    return animation.Skeleton(parents, inv_bind, rest_pos, rest_rot, rest_scale)


def test_rest_palette_is_identity():
    sk = make_two_bone_skeleton()
    pal = animation.rest_palette(sk)
    for j in range(2):
        np.testing.assert_allclose(pal[j], np.eye(4), atol=1e-6)


def test_clip_sampling_interpolates():
    sk = make_two_bone_skeleton()
    q90 = np.asarray(math3d.quat_from_axis_angle([0, 0, 1], np.pi / 2))
    clip = animation.AnimationClip("bend", [
        animation.Channel(1, "rotation",
                          np.array([0.0, 1.0], np.float32),
                          np.stack([np.array([0, 0, 0, 1], np.float32), q90]))])
    pal0 = clip.skinning_palette(sk, 0.0)
    np.testing.assert_allclose(pal0[1], np.eye(4), atol=1e-5)
    pal1 = clip.skinning_palette(sk, 1.0 - 1e-4)
    # Bone1 fully bent: a point at the top of the cylinder moves sideways.
    p = pal1[1] @ np.array([0, 2.0, 0, 1.0])
    assert p[0] < -0.5  # rotated toward -X
    pal_half = clip.skinning_palette(sk, 0.5)
    p_half = pal_half[1] @ np.array([0, 2.0, 0, 1.0])
    assert p[0] < p_half[0] < 0  # monotone interpolation


def test_skinned_render_deforms():
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    mesh = make_two_bone_cylinder()
    mid = meshes.add(mesh)
    sk = make_two_bone_skeleton()

    from basicrenderer_tpu.models.animation import SkeletonRegistry
    reg = SkeletonRegistry()
    sk_id = reg.add(sk)
    q90 = np.asarray(math3d.quat_from_axis_angle([0, 0, 1], np.pi / 2))
    clip = animation.AnimationClip("bend", [
        animation.Channel(1, "rotation", np.array([0.0, 1.0], np.float32),
                          np.stack([np.array([0, 0, 0, 1], np.float32), q90]))])
    reg.add_clip(sk_id, clip)
    reg.play(sk_id, 0)

    sc = Scene()
    sc.create_renderable(mid, 0, skeleton_id=sk_id)
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=4, max_materials=4, max_lights=2,
                            max_clusters=64, max_joints=16)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, skeletons=reg)
    sc.propagate_transforms()
    buffers = bridge.build_scene_buffers()
    assert bridge.packed.skin_instances

    from basicrenderer_tpu.ops.skinning import apply_skinning
    # t=0: bind pose (identity palette).
    s0 = apply_skinning(buffers, buffers.joint_palette,
                        buffers.vert_joints, buffers.vert_weights)
    nv = mesh.num_vertices
    np.testing.assert_allclose(np.asarray(s0.positions[:nv]),
                               mesh.positions, atol=1e-5)
    # t=1: bent 90 degrees — top ring moved sideways.
    buffers1 = bridge.update_dynamic(buffers, t=1.0 - 1e-4)
    s1 = apply_skinning(buffers1, buffers1.joint_palette,
                        buffers1.vert_joints, buffers1.vert_weights)
    top = np.asarray(s1.positions[:nv])[-8:]
    assert top[:, 0].mean() < -0.5      # moved toward -X
    assert abs(top[:, 1].mean() - 1.0) < 0.3  # pivoted around mid-height


def test_cubicspline_channel():
    """glTF CUBICSPLINE Hermite evaluation (reference: AnimationClip.h
    cubic interpolation): smooth easing with zero tangents — the midpoint
    matches the Hermite smoothstep blend, NOT the linear lerp; endpoint
    values land exactly."""
    from basicrenderer_tpu.models.animation import Channel, _sample_channel
    times = np.array([0.0, 1.0], np.float32)
    # Two keys [in, value, out]: zero tangents -> pure smoothstep in t.
    vals = np.array([[0, 0, 0], [0, 0, 0], [0, 0, 0],
                     [0, 0, 0], [2, 0, 0], [0, 0, 0]], np.float32)
    ch = Channel(0, "translation", times, vals, "CUBICSPLINE")
    np.testing.assert_allclose(_sample_channel(ch, 0.0), [0, 0, 0])
    np.testing.assert_allclose(_sample_channel(ch, 1.0), [2, 0, 0])
    # Smoothstep(0.25) = 3f^2-2f^3 = 0.15625 -> x = 0.3125 (lerp gives .5)
    np.testing.assert_allclose(_sample_channel(ch, 0.25)[0], 0.3125,
                               atol=1e-6)
    # Non-zero out-tangent at key 0 bends the start: dp/dt(0) = tangent.
    vals2 = vals.copy()
    vals2[2] = [4, 0, 0]
    ch2 = Channel(0, "translation", times, vals2, "CUBICSPLINE")
    eps = 1e-3
    d = (_sample_channel(ch2, eps)[0] - _sample_channel(ch2, 0.0)[0]) / eps
    assert abs(d - 4.0) < 0.05, d


def test_clip_blending_and_crossfade():
    """Two-clip blends mix joint-local TRS (slerped rotations); play(fade=)
    cross-fades from the previous state (SkeletonManager controllers)."""
    from basicrenderer_tpu.models.animation import (
        AnimationClip, Channel, SkeletonRegistry, Skeleton)
    sk = Skeleton(parents=np.array([-1], np.int32),
                  inverse_bind=np.eye(4, dtype=np.float32)[None],
                  rest_pos=np.zeros((1, 3), np.float32),
                  rest_rot=np.array([[0, 0, 0, 1]], np.float32),
                  rest_scale=np.ones((1, 3), np.float32))
    t2 = np.array([0.0, 10.0], np.float32)

    def move_clip(x):
        return AnimationClip("m", [Channel(
            0, "translation", t2,
            np.array([[x, 0, 0], [x, 0, 0]], np.float32))])

    reg = SkeletonRegistry()
    sid = reg.add(sk)
    a = reg.add_clip(sid, move_clip(0.0))
    b = reg.add_clip(sid, move_clip(4.0))
    reg.set_blend(sid, a, b, 0.25)
    pal = reg.palette(sid, 1.0)
    np.testing.assert_allclose(pal[0][:3, 3], [1.0, 0, 0], atol=1e-6)
    # Cross-fade: at half the fade window the pose is the midpoint.
    reg.set_blend(sid, a, b, 0.0)          # pose at x=0
    reg.play(sid, b, t0=2.0, fade=1.0)     # fade to x=4 starting t=2
    pal_mid = reg.palette(sid, 2.5)
    np.testing.assert_allclose(pal_mid[0][:3, 3], [2.0, 0, 0], atol=1e-6)
    pal_end = reg.palette(sid, 3.5)        # fade done
    np.testing.assert_allclose(pal_end[0][:3, 3], [4.0, 0, 0], atol=1e-6)

"""Unit tests for basicrenderer_tpu.utils.math3d."""

import numpy as np
import jax.numpy as jnp

from basicrenderer_tpu.utils import math3d as m3


def test_perspective_reverse_z_mapping():
    proj = np.asarray(m3.perspective(np.pi / 3, 1.0, 0.1, 100.0, reverse_z=True))
    for z_view, expect in ((-0.1, 1.0), (-100.0, 0.0)):
        p = proj @ np.array([0, 0, z_view, 1.0])
        assert abs(p[2] / p[3] - expect) < 1e-5
        assert p[3] > 0  # w = -z_view


def test_perspective_infinite_far():
    proj = np.asarray(m3.perspective(np.pi / 3, 16 / 9, 0.1, None))
    p_near = proj @ np.array([0, 0, -0.1, 1.0])
    assert abs(p_near[2] / p_near[3] - 1.0) < 1e-5
    p_far = proj @ np.array([0, 0, -1e6, 1.0])
    assert abs(p_far[2] / p_far[3]) < 1e-4


def test_look_at_places_eye_at_origin():
    eye = np.array([3.0, 4.0, 5.0])
    v = np.asarray(m3.look_at(eye, [0, 0, 0], [0, 1, 0]))
    p = v @ np.append(eye, 1.0)
    assert np.allclose(p[:3], 0, atol=1e-5)
    # Target should be straight ahead (-Z)
    t = v @ np.array([0, 0, 0, 1.0])
    assert t[2] < 0 and abs(t[0]) < 1e-5 and abs(t[1]) < 1e-5


def test_quat_roundtrip_rotation():
    q = np.asarray(m3.quat_from_axis_angle([0, 1, 0], np.pi / 2))
    R = np.asarray(m3.quat_to_matrix(q))
    p = R[:3, :3] @ np.array([1.0, 0, 0])
    # +X rotated 90deg about +Y -> -Z
    assert np.allclose(p, [0, 0, -1], atol=1e-6)


def test_quat_mul_composition():
    qa = np.asarray(m3.quat_from_axis_angle([0, 1, 0], 0.3))
    qb = np.asarray(m3.quat_from_axis_angle([0, 1, 0], 0.5))
    qc = np.asarray(m3.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    qd = np.asarray(m3.quat_from_axis_angle([0, 1, 0], 0.8))
    assert np.allclose(np.abs(np.dot(qc, qd)), 1.0, atol=1e-6)


def test_compose_trs_order():
    # Scale applied first, then rotation, then translation.
    m = np.asarray(m3.compose_trs([1, 0, 0],
                                  m3.quat_from_axis_angle([0, 0, 1], np.pi / 2),
                                  [2, 1, 1]))
    p = m @ np.array([1.0, 0, 0, 1.0])
    # scale -> (2,0,0); rotate 90 about z -> (0,2,0); translate -> (1,2,0)
    assert np.allclose(p[:3], [1, 2, 0], atol=1e-5)


def test_frustum_sphere_culling():
    view = m3.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, 1.0, 0.1, 100.0)
    planes = m3.frustum_planes(jnp.asarray(proj) @ jnp.asarray(view))
    centers = jnp.array([[0, 0, 0], [0, 0, 200.0], [50, 0, 0], [0, 0, 4.85]], jnp.float32)
    radii = jnp.array([1.0, 1.0, 1.0, 0.01], jnp.float32)
    vis = np.asarray(m3.sphere_in_frustum(planes, centers, radii))
    assert vis[0]          # at origin, visible
    assert not vis[1]      # behind camera
    assert not vis[2]      # far off to the side
    assert vis[3]          # just inside near plane


def test_aabb_in_frustum():
    view = m3.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, 1.0, 0.1, 100.0)
    planes = m3.frustum_planes(jnp.asarray(proj) @ jnp.asarray(view))
    mins = jnp.array([[-1, -1, -1], [100, 100, 100]], jnp.float32)
    maxs = jnp.array([[1, 1, 1], [101, 101, 101]], jnp.float32)
    vis = np.asarray(m3.aabb_in_frustum(planes, mins, maxs))
    assert vis[0] and not vis[1]


def test_orthographic_reverse_z():
    proj = np.asarray(m3.orthographic(-10, 10, -10, 10, 1.0, 50.0, reverse_z=True))
    near = proj @ np.array([0, 0, -1.0, 1.0])
    far = proj @ np.array([0, 0, -50.0, 1.0])
    assert abs(near[2] - 1.0) < 1e-5
    assert abs(far[2]) < 1e-5

"""Core 3D math: matrices, quaternions, cameras, projections, frusta.

TPU-native rebuild of the reference's math utilities (reference:
BasicRenderer/include/Utilities/MathUtils.h and DirectXMath usage throughout
Renderer.cpp / ViewManager.cpp). Conventions:

- Right-handed world space, column-vector semantics: ``p' = M @ p``.
- Matrices are 4x4 float32 jnp arrays; points are (..., 3) or (..., 4).
- Clip space matches D3D: z in [0, 1] after perspective divide (the reference
  is a DX12 renderer; matching its clip conventions keeps pixel-RMSE parity).
- Reverse-Z is used for the depth buffer (near=1, far=0) like the reference's
  CLod path, which improves f32 depth precision.

Everything here is traceable (pure jnp) so camera math can live inside the
jitted frame program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Matrix builders (host or traced)
# ---------------------------------------------------------------------------

def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def translation(t) -> jnp.ndarray:
    t = jnp.asarray(t, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(t)


def scaling(s) -> jnp.ndarray:
    s = jnp.asarray(s, jnp.float32)
    s = jnp.broadcast_to(s, (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def rotation_x(angle) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], jnp.float32
    )


def rotation_y(angle) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array(
        [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], jnp.float32
    )


def rotation_z(angle) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array(
        [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32
    )


def quat_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)  # (x, y, z, w)


def quat_from_axis_angle(axis, angle) -> jnp.ndarray:
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / (jnp.linalg.norm(axis) + 1e-20)
    half = jnp.asarray(angle, jnp.float32) * 0.5
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half).reshape(1)])


def quat_mul(a, b) -> jnp.ndarray:
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_to_matrix(q) -> jnp.ndarray:
    """(..., 4) xyzw quaternion -> (..., 4, 4) rotation matrix."""
    q = jnp.asarray(q, jnp.float32)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-20), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([one - (yy + zz), xy - wz, xz + wy, zero], -1),
        jnp.stack([xy + wz, one - (xx + zz), yz - wx, zero], -1),
        jnp.stack([xz - wy, yz + wx, one - (xx + yy), zero], -1),
        jnp.stack([zero, zero, zero, one], -1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_slerp(a, b, t):
    """Spherical linear interpolation between xyzw quaternions."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(d < 0, -b, b)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    # Fall back to lerp for nearly-parallel quats.
    use_lerp = sin_theta < 1e-5
    w_a = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w_b = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    out = w_a * a + w_b * b
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-20)


def compose_trs(translation_v, rotation_q, scale_v) -> jnp.ndarray:
    """Translation * Rotation * Scale -> 4x4 (matches the reference's
    Transform composition, BasicScene Components.h Position/Rotation/Scale)."""
    r = quat_to_matrix(rotation_q)
    s = jnp.asarray(scale_v, jnp.float32)
    s = jnp.broadcast_to(s, r.shape[:-2] + (3,))
    m = r.at[..., :3, :3].set(r[..., :3, :3] * s[..., None, :])
    return m.at[..., :3, 3].set(jnp.asarray(translation_v, jnp.float32))


def decompose_normal_matrix(model: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transpose of the upper 3x3 (for normals); batched."""
    m3 = model[..., :3, :3]
    return jnp.linalg.inv(m3).swapaxes(-1, -2)


# ---------------------------------------------------------------------------
# Cameras / projections
# ---------------------------------------------------------------------------

def look_at(eye, target, up) -> jnp.ndarray:
    """Right-handed view matrix (world -> view, looking down -Z)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = target - eye
    f = f / (jnp.linalg.norm(f) + 1e-20)
    r = jnp.cross(f, up)
    r = r / (jnp.linalg.norm(r) + 1e-20)
    u = jnp.cross(r, f)
    m = jnp.stack(
        [
            jnp.concatenate([r, -jnp.dot(r, eye)[None]]),
            jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
            jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
            jnp.array([0, 0, 0, 1], jnp.float32),
        ]
    )
    return m


def perspective(fov_y, aspect, near, far, reverse_z: bool = True) -> jnp.ndarray:
    """Perspective projection to D3D clip space (z' in [0,1] after divide).

    View space is right-handed looking down -Z; clip w = -z_view > 0 in front
    of the camera. With ``reverse_z`` (default, matching the reference's depth
    precision strategy) z_view=-near maps to 1 and z_view=-far maps to 0.
    ``far=None`` gives an infinite reverse-Z projection (far plane at inf -> 0).
    """
    f = 1.0 / jnp.tan(jnp.asarray(fov_y, jnp.float32) * 0.5)
    near = jnp.float32(near)
    if far is None:
        if not reverse_z:
            raise ValueError("infinite far plane requires reverse_z")
        # z' = near / -z_view: z_view=-near -> 1, z_view->-inf -> 0.
        A, B = jnp.float32(0.0), near
    else:
        far = jnp.float32(far)
        if reverse_z:
            # z' = (A*z + B) / (-z); z=-near -> 1, z=-far -> 0.
            A = near / (far - near)
            B = far * near / (far - near)
        else:
            # z=-near -> 0, z=-far -> 1.
            A = -far / (far - near)
            B = -far * near / (far - near)
    proj = jnp.zeros((4, 4), jnp.float32)
    proj = proj.at[0, 0].set(f / aspect)
    proj = proj.at[1, 1].set(f)
    proj = proj.at[2, 2].set(A)
    proj = proj.at[2, 3].set(B)
    proj = proj.at[3, 2].set(-1.0)
    return proj


def orthographic(left, right, bottom, top, near, far, reverse_z: bool = True) -> jnp.ndarray:
    """Orthographic projection to D3D clip space (z in [0,1]); used for
    directional shadow cascades (reference: LightManager directional views)."""
    left, right = jnp.float32(left), jnp.float32(right)
    bottom, top = jnp.float32(bottom), jnp.float32(top)
    near, far = jnp.float32(near), jnp.float32(far)
    sx = 2.0 / (right - left)
    sy = 2.0 / (top - bottom)
    tx = -(right + left) / (right - left)
    ty = -(top + bottom) / (top - bottom)
    if reverse_z:
        # z_view = -near -> 1, z_view = -far -> 0
        sz = 1.0 / (far - near)
        tz = far / (far - near)
    else:
        sz = -1.0 / (far - near)
        tz = -near / (far - near)
    return jnp.array(
        [
            [sx, 0, 0, tx],
            [0, sy, 0, ty],
            [0, 0, sz, tz],
            [0, 0, 0, 1],
        ],
        jnp.float32,
    )


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 to (..., 3) points -> (..., 3) (affine, no divide)."""
    return pts @ m[:3, :3].T + m[:3, 3]


def transform_points_h(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 to (..., 3) points -> homogeneous (..., 4) (no divide)."""
    xyz = pts @ m[:3, :3].T + m[:3, 3]
    w = pts @ m[3, :3].T + m[3, 3]
    return jnp.concatenate([xyz, w[..., None]], axis=-1)


def mat4_columns(m: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                 z: jnp.ndarray, w=1.0):
    """Point transform by a 4x4 in COLUMN form: (...,)-shaped component
    planes in, 4 component planes out.

    TPU rule: `pts @ m.T` with (..., 4) points is a dot with K=N=4 — the
    MXU pads both to 128 (~1000x wasted FLOPs, x6 more under the package's
    'highest' matmul precision). Measured: the CSM sampling pass dropped
    from 20 ms to ~4 ms at 1080p by switching its four per-cascade
    projections to this form. Use for every image-sized transform."""
    return (m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3] * w,
            m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3] * w,
            m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3] * w,
            m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3] * w)


def mat3_columns(m: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                 z: jnp.ndarray):
    """3x3 row-matrix apply in column form (see mat4_columns)."""
    return (m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
            m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
            m[2, 0] * x + m[2, 1] * y + m[2, 2] * z)


def transform_dirs(m: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    return dirs @ m[:3, :3].T


# ---------------------------------------------------------------------------
# Frustum
# ---------------------------------------------------------------------------

def frustum_planes(viewproj: jnp.ndarray) -> jnp.ndarray:
    """Extract 6 clip planes (l, r, b, t, near, far) from a viewproj matrix.

    Planes are (nx, ny, nz, d) with inside meaning dot(plane, (p,1)) >= 0.
    D3D clip-space convention: -w<=x<=w, -w<=y<=w, 0<=z<=w.
    Reference analogue: frustum tests in computeCulling.hlsl.
    """
    r0, r1, r2, r3 = viewproj[0], viewproj[1], viewproj[2], viewproj[3]
    planes = jnp.stack(
        [
            r3 + r0,  # left:   x >= -w
            r3 - r0,  # right:  x <= w
            r3 + r1,  # bottom
            r3 - r1,  # top
            r2,       # near:   z >= 0
            r3 - r2,  # far:    z <= w
        ]
    )
    n = jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(n, 1e-20)


def sphere_in_frustum(planes: jnp.ndarray, centers: jnp.ndarray, radii: jnp.ndarray) -> jnp.ndarray:
    """Batched sphere-vs-frustum: (6,4) planes, (N,3) centers, (N,) radii -> (N,) bool."""
    d = centers @ planes[:, :3].T + planes[None, :, 3]  # (N, 6)
    return jnp.all(d >= -radii[:, None], axis=-1)


def aabb_in_frustum(planes: jnp.ndarray, mins: jnp.ndarray, maxs: jnp.ndarray) -> jnp.ndarray:
    """Batched AABB-vs-frustum via p-vertex test: (N,3) mins/maxs -> (N,) bool."""
    # For each plane pick the AABB corner most in the normal direction.
    n = planes[:, :3]  # (6,3)
    pverts = jnp.where(n[None, :, :] >= 0, maxs[:, None, :], mins[:, None, :])  # (N,6,3)
    d = jnp.sum(pverts * n[None], axis=-1) + planes[None, :, 3]
    return jnp.all(d >= 0, axis=-1)


# ---------------------------------------------------------------------------
# Numpy-side helpers (host precompute; pure numpy — device transfers on the
# host path are avoided deliberately: on the axon-tunneled TPU a first
# device->host readback can stall for minutes)
# ---------------------------------------------------------------------------

def np_look_at(eye, target, up) -> np.ndarray:
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    f = target - eye
    f = f / (np.linalg.norm(f) + 1e-20)
    r = np.cross(f, up)
    r = r / (np.linalg.norm(r) + 1e-20)
    u = np.cross(r, f)
    m = np.eye(4)
    m[0, :3], m[0, 3] = r, -np.dot(r, eye)
    m[1, :3], m[1, 3] = u, -np.dot(u, eye)
    m[2, :3], m[2, 3] = -f, np.dot(f, eye)
    return m.astype(np.float32)


def np_perspective(fov_y, aspect, near, far, reverse_z=True) -> np.ndarray:
    f = 1.0 / np.tan(float(fov_y) * 0.5)
    near = float(near)
    if far is None:
        if not reverse_z:
            raise ValueError("infinite far plane requires reverse_z")
        A, B = 0.0, near
    else:
        far = float(far)
        if reverse_z:
            A = near / (far - near)
            B = far * near / (far - near)
        else:
            A = -far / (far - near)
            B = -far * near / (far - near)
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = f / aspect
    proj[1, 1] = f
    proj[2, 2] = A
    proj[2, 3] = B
    proj[3, 2] = -1.0
    return proj


def np_orthographic(left, right, bottom, top, near, far, reverse_z=True) -> np.ndarray:
    sx = 2.0 / (right - left)
    sy = 2.0 / (top - bottom)
    tx = -(right + left) / (right - left)
    ty = -(top + bottom) / (top - bottom)
    if reverse_z:
        sz = 1.0 / (far - near)
        tz = far / (far - near)
    else:
        sz = -1.0 / (far - near)
        tz = -near / (far - near)
    m = np.zeros((4, 4), np.float32)
    m[0, 0], m[0, 3] = sx, tx
    m[1, 1], m[1, 3] = sy, ty
    m[2, 2], m[2, 3] = sz, tz
    m[3, 3] = 1.0
    return m

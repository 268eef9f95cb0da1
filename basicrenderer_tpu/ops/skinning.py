"""GPU linear-blend skinning.

Reference analogue: compute skinning in shaders/Include/skinningCommon.hlsli
+ SkeletonManager GPU buffers (SkinningInstanceGPUInfo slots). On TPU the
4-joint matrix fetch is a one-hot MXU matmul against the global joint
palette and the blend is pure column math — it runs as a prepass that
rewrites the position/normal lanes of the static vertex table, so the whole
raster pipeline (including the compacted virtualized-geometry path) consumes
skinned geometry transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.framedata import SceneBuffers
from .raster_setup import gather_rows_onehot


def apply_skinning(scene: SceneBuffers, joint_palette: jnp.ndarray,
                   vert_joints: jnp.ndarray, vert_weights: jnp.ndarray
                   ) -> SceneBuffers:
    """Returns a scene with skinned positions/normals.

    joint_palette: (Jcap, 16) f32 object-space skin matrices (world(joint) @
    inverse_bind), already offset per instance by the bridge.
    vert_joints: (V, 4) i32 global palette indices; vert_weights: (V, 4) f32
    (all-zero weights = unskinned vertex, passed through).
    """
    V = scene.positions.shape[0]
    p = scene.positions
    n = scene.normals
    wsum = jnp.sum(vert_weights, axis=1)
    skinned_mask = wsum > 1e-6

    # Blend the 4 joint matrices first (LBS): M = sum_k w_k * palette[j_k],
    # then transform once — fewer flops than transforming 4 times.
    m = jnp.zeros((V, 16), jnp.float32)
    for k in range(4):
        mk = gather_rows_onehot(joint_palette, vert_joints[:, k])
        m = m + mk * vert_weights[:, k:k + 1]
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    sx = m[:, 0] * px + m[:, 1] * py + m[:, 2] * pz + m[:, 3]
    sy = m[:, 4] * px + m[:, 5] * py + m[:, 6] * pz + m[:, 7]
    sz = m[:, 8] * px + m[:, 9] * py + m[:, 10] * pz + m[:, 11]
    nx0, ny0, nz0 = n[:, 0], n[:, 1], n[:, 2]
    # Normals via the rotation part (uniform-scale assumption, like the
    # reference's skinning shader).
    nx = m[:, 0] * nx0 + m[:, 1] * ny0 + m[:, 2] * nz0
    ny = m[:, 4] * nx0 + m[:, 5] * ny0 + m[:, 6] * nz0
    nz = m[:, 8] * nx0 + m[:, 9] * ny0 + m[:, 10] * nz0
    nlen = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-12)

    sp = jnp.where(skinned_mask[:, None], jnp.stack([sx, sy, sz], 1), p)
    sn = jnp.where(skinned_mask[:, None],
                   jnp.stack([nx * nlen, ny * nlen, nz * nlen], 1), n)
    new_table = scene.vertex_table.at[:, 0:3].set(sp).at[:, 3:6].set(sn)
    return scene.replace(positions=sp, normals=sn, vertex_table=new_table)

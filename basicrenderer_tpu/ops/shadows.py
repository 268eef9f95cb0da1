"""Cascaded shadow maps for directional lights.

Reference analogue: LightManager's directional cascades + shadow views
(reference: BasicRenderer/src/Managers/LightManager.cpp — shadow cameras via
ViewManager, cascade splits in PerFrameCB; shadows.hlsli sampling). Virtual
shadow maps (the reference's clipmapped VSM stack) layer on top of this in a
later milestone; CSM is the base path the reference also keeps.

TPU design notes:
- Each cascade is a depth-only run of the same binning + Pallas raster used
  for the main view (one FrameConfig specialization at shadow resolution).
- Screen-space sampling is the expensive part on TPU (XLA gathers
  serialize): the shadow term is evaluated at 1/downscale resolution with a
  single compare tap per pixel, bilinearly upsampled, then smoothed 3x3 —
  i.e. filtering happens on the *result mask* (cheap vectorized shifts)
  instead of multi-tap PCF (N gathers).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig, SceneBuffers, ViewData
from ..utils import math3d
from . import raster_setup
from .raster_pallas import raster_tiles_pallas
from .raster_ref import raster_tiles_ref


def shadow_config(config: FrameConfig) -> FrameConfig:
    """FrameConfig specialization for cascade rendering."""
    res = config.shadow_resolution
    return dataclasses.replace(
        config, width=res, height=res, enable_occlusion=False,
        max_pairs=min(config.max_pairs, 1 << 17),
        # Ortho shadow views bin the budgeted caster set; capping the
        # per-triangle span keeps the bin sort at ~0.5M keys per cascade
        # (K=32 here was ~1/3 of the old 45 ms CSM cost).
        max_tiles_per_tri=min(config.max_tiles_per_tri, 8))


def cascade_matrices(view: ViewData, light_dir: jnp.ndarray, num_cascades: int,
                     near: float = 0.1, max_dist: float = 60.0,
                     lam: float = 0.7) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit one ortho viewproj per cascade around exponential view-frustum
    slices (practical split scheme). Returns (vps (K, 4, 4), splits (K,))
    where splits[k] is the far view-distance of cascade k."""
    inv_vp = jnp.linalg.inv(view.viewproj)
    ks = jnp.arange(1, num_cascades + 1, dtype=jnp.float32) / num_cascades
    uniform = near + (max_dist - near) * ks
    logd = near * (max_dist / near) ** ks
    splits = lam * logd + (1 - lam) * uniform            # (K,)

    d = light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-9)
    up = jnp.where(jnp.abs(d[1]) < 0.95,
                   jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    s = jnp.cross(up, -d)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-9)
    u = jnp.cross(-d, s)
    # Light rotation (world->light view, looking down +d).
    R = jnp.stack([s, u, -d])                            # (3, 3)

    # Frustum slice corners in world space: unproject the 8 NDC corners of
    # each slice. Reverse-Z NDC: z = near/dist for slice boundaries.
    prev = jnp.concatenate([jnp.array([near], jnp.float32), splits[:-1]])

    def corners(dist):
        z = near / dist                                   # reverse-Z NDC
        ndc = jnp.array([[x, y, 1.0, 1.0] for x in (-1, 1) for y in (-1, 1)],
                        jnp.float32)
        ndc = ndc.at[:, 2].set(z)
        wpos = ndc @ inv_vp.T
        return wpos[:, :3] / wpos[:, 3:]

    vps = []
    for k in range(num_cascades):
        pts = jnp.concatenate([corners(prev[k]), corners(splits[k])])  # (8,3)
        lp = pts @ R.T                                     # light space
        mn = lp.min(0)
        mx = lp.max(0)
        pad = (mx - mn) * 0.05 + 1e-3
        mn = mn - pad
        # Light-space z = -d.p grows TOWARD the light (R's third row is -d),
        # so out-of-slice casters between the slice and the light live at
        # z > mx[2]: extend the far bound toward the light to capture them.
        mx = mx + pad + jnp.array([0, 0, 50.0])
        # Ortho: x' in [-1,1], y' in [-1,1], z' reverse-style in [0,1] with
        # 1 = nearest to light — matching the raster's reverse-Z max-keep
        # resolve and the `z + bias >= map` visibility test in
        # sample_shadow_cascades.
        sx = 2.0 / (mx[0] - mn[0])
        sy = 2.0 / (mx[1] - mn[1])
        sz = 1.0 / (mx[2] - mn[2])
        proj = jnp.array([
            [1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0],
        ], jnp.float32)
        proj = proj.at[0, 0].set(sx).at[0, 3].set(-(mx[0] + mn[0]) / (mx[0] - mn[0]))
        proj = proj.at[1, 1].set(sy).at[1, 3].set(-(mx[1] + mn[1]) / (mx[1] - mn[1]))
        proj = proj.at[2, 2].set(sz).at[2, 3].set(-mn[2] * sz)
        Rw = jnp.zeros((4, 4), jnp.float32).at[:3, :3].set(R).at[3, 3].set(1.0)
        vps.append(proj @ Rw)
    return jnp.stack(vps), splits


def render_cascade(scene: SceneBuffers, cascade_vp: jnp.ndarray,
                   config: FrameConfig, compacted=None) -> jnp.ndarray:
    """Depth-only raster of shadow casters from a cascade's viewproj.
    `compacted` = (indices, material, object, valid, overflow) from the
    cluster compaction (virtualized-geometry path). Returns (res', res')
    reverse-style depth (1 = nearest to light)."""
    scfg = shadow_config(config)
    if compacted is not None:
        idx, mat, tobj, tri_valid, _ovf = compacted
        lanes, bbox, valid = raster_setup.triangle_setup_compacted(
            scene.vertex_table, scene.object_mats, scene.object_normal_mats,
            cascade_vp, idx, tri_valid, scfg, mat, tobj)
    else:
        clip, _ = raster_setup.transform_vertices(
            scene.positions, scene.vert_object, scene.object_mats, cascade_vp)
        clip = jax.lax.optimization_barrier(clip)
        lanes, bbox, valid = raster_setup.triangle_setup_packed(
            clip, scene.indices, scene.tri_object >= 0, scfg, None, None, None)
    pairs = raster_setup.bin_pairs(lanes, bbox, valid, scfg)
    if config.use_pallas_raster:
        depth, _, _ = raster_tiles_pallas(pairs, scfg,
                                          interpret=config.pallas_interpret)
    else:
        depth, _ = raster_tiles_ref(pairs, scfg)
    return depth


def sample_shadow_cascades(world_pos: jnp.ndarray, normal: jnp.ndarray,
                           light_dir: jnp.ndarray, cascade_vps: jnp.ndarray,
                           shadow_maps: jnp.ndarray, bias: jnp.ndarray,
                           downscale: int = 2) -> jnp.ndarray:
    """(H, W) shadow visibility in [0, 1].

    world_pos/normal: (H, W, 3); cascade_vps (K, 4, 4); shadow_maps
    (K, R', R') padded depth from render_cascade. Evaluated at 1/downscale
    res with one gather tap, upsampled, 3x3-smoothed.
    """
    H, W = world_pos.shape[:2]
    K, Rp = shadow_maps.shape[0], shadow_maps.shape[1]
    wp = world_pos[::downscale, ::downscale]
    nrm = normal[::downscale, ::downscale]
    h, w = wp.shape[:2]

    # Slope-scaled bias (reference: shadows.hlsli).
    ndl = jnp.abs(jnp.sum(nrm * (-light_dir)[None, None, :], -1))
    slope_bias = bias * jnp.clip(1.0 / jnp.maximum(ndl, 0.2), 1.0, 5.0)

    wph = jnp.concatenate([wp, jnp.ones_like(wp[..., :1])], -1)
    # Select the cascade per pixel FIRST (cheap vectorized projections),
    # then take ONE combined gather — per-pixel gathers cost ~7 ns each on
    # TPU, so K separate cascade taps were the whole pass's cost.
    flat_maps = shadow_maps.reshape(-1)
    sel_idx = jnp.zeros((h, w), jnp.int32)
    sel_z = jnp.zeros((h, w), jnp.float32)
    chosen = jnp.zeros((h, w), bool)
    for k in range(K):
        ls = wph @ cascade_vps[k].T                       # (h, w, 4)
        x = ls[..., 0]
        y = ls[..., 1]
        z = ls[..., 2]
        inside = (jnp.abs(x) < 0.99) & (jnp.abs(y) < 0.99) & (z > 0) & (z < 1)
        use = inside & ~chosen
        u = jnp.clip(((x * 0.5 + 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
        v = jnp.clip(((0.5 - y * 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
        sel_idx = jnp.where(use, (k * Rp + v) * Rp + u, sel_idx)
        sel_z = jnp.where(use, z, sel_z)
        chosen = chosen | inside
    smp = flat_maps[sel_idx]                              # the ONE gather
    # Reverse-style: fragment lit if its light depth >= map depth - bias.
    # Empty shadow texels (0 = nothing rendered) never occlude.
    lit = ((sel_z + slope_bias >= smp) | (smp <= 0.0)).astype(jnp.float32)
    lit = jnp.where(chosen, lit, 1.0)                     # outside all: lit

    # Upsample + 3x3 box smooth (the PCF analogue on the result mask).
    lit = jax.image.resize(lit, (H, W), method="bilinear")
    p = jnp.pad(lit, 1, mode="edge")
    acc = sum(p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3))
    return acc / 9.0

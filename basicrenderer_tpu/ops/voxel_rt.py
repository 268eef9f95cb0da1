"""Voxel cone marching: ray-traced fallback tier over the scene voxel grid.

Reference analogue: rayTracedReflections.rt.hlsl over CLodRayTracingSystem's
cluster BLAS (reference: CLodRayTracingSystem.h:16-75) and the voxel LOD
fallback raster (reference: VoxelGroupBuilder.cpp + voxelSoftwareRaster.hlsl).
The TPU redesign traces the models/voxels.py mip pyramid instead of a BVH:
a fixed-count cone march with distance-proportional level selection — a
bounded, gather-per-step loop XLA can schedule, where BVH traversal would
be an unbounded data-dependent loop of scalar reads.

Cost model (CLAUDE.md): per-element XLA gather ~7 ns — one u32 gather per
ray-step. Budget the ray count at the call site (reflections at
config.voxel_rt_downscale; primary fallback at the same grid).

Inputs/outputs are PLANAR 1-D columns (px, py, pz, ...) — image-sized
(N, 3) intermediates pad the 3-lane axis 42x (CLAUDE.md).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.voxels import RADIANCE_SCALE


def cone_trace(grid: jnp.ndarray, origin: jnp.ndarray, cell: jnp.ndarray,
               n: int, level_offsets: Tuple[int, ...],
               px, py, pz, dx, dy, dz,
               steps: int = 12, start_t=None, growth: float = 1.35,
               cone_tan: float = 0.12, sggx: jnp.ndarray = None,
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """March cones from (px,py,pz) along (dx,dy,dz) through the packed
    RGBA8 mip pyramid. Returns planar accumulated radiance (r, g, b) and
    transmittance T (1 = clear miss). All ray arrays share one 1-D shape.

    `n`/`level_offsets` are static (host build constants); origin/cell are
    traced scalars so light/geometry rebuilds don't recompile.

    `sggx` (optional, models/voxels._pack_sggx layout — reference:
    VoxelGroupBuilder's SGGX distributions): per-cell normal second
    moments; occlusion scales by the projected area sqrt(w^T S w) along
    the ray, so a wall grazed edge-on barely occludes while a normal-on
    hit occludes fully. Costs two extra gathers per step.
    """
    levels = len(level_offsets)
    offs = jnp.asarray(level_offsets, jnp.int32)
    t0 = (2.0 * cell) if start_t is None else start_t
    shape = jnp.shape(px)
    acc_r = jnp.zeros(shape, jnp.float32)
    acc_g = jnp.zeros(shape, jnp.float32)
    acc_b = jnp.zeros(shape, jnp.float32)
    trans = jnp.ones(shape, jnp.float32)
    t = jnp.broadcast_to(jnp.float32(t0), shape)

    inv_cell = 1.0 / cell
    log2e = 1.4426950408889634

    def body(_, carry):
        t, ar, ag, ab, tr = carry
        wx = px + dx * t
        wy = py + dy * t
        wz = pz + dz * t
        radius = jnp.maximum(cone_tan * t, cell)
        lvl = jnp.clip((jnp.log(radius * inv_cell) * log2e + 0.5)
                       .astype(jnp.int32), 0, levels - 1)
        sel = jnp.exp2(lvl.astype(jnp.float32))
        nl = (jnp.float32(n) / sel)
        gx = jnp.floor((wx - origin[0]) * inv_cell / sel)
        gy = jnp.floor((wy - origin[1]) * inv_cell / sel)
        gz = jnp.floor((wz - origin[2]) * inv_cell / sel)
        inside = ((gx >= 0) & (gx < nl) & (gy >= 0) & (gy < nl)
                  & (gz >= 0) & (gz < nl))
        gxi = jnp.clip(gx, 0, nl - 1).astype(jnp.int32)
        gyi = jnp.clip(gy, 0, nl - 1).astype(jnp.int32)
        gzi = jnp.clip(gz, 0, nl - 1).astype(jnp.int32)
        nli = nl.astype(jnp.int32)
        # Per-level flat offset: tiny static table -> select chain (a
        # second gather per step would double the march cost).
        off = jnp.zeros(shape, jnp.int32)
        for li in range(levels):
            off = jnp.where(lvl == li, jnp.int32(level_offsets[li]), off)
        flat = off + (gzi * nli + gyi) * nli + gxi
        w = jnp.take(grid, flat, mode="clip")
        r8 = ((w >> 24) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        g8 = ((w >> 16) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        b8 = ((w >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        a8 = (w & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        a = jnp.where(inside, a8, 0.0)
        if sggx is not None:
            # Anisotropic projected-area modulation: sigma(w) =
            # sqrt(w^T S w); isotropic-equivalent scaling 2*sigma (a
            # uniform normal sphere has E|cos| = 1/2), capped at 1.
            w0 = jnp.take(sggx, flat * 2, mode="clip")
            w1 = jnp.take(sggx, flat * 2 + 1, mode="clip")
            sxx = ((w0 >> 16) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
            syy = ((w0 >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
            szz = (w0 & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
            sxy = ((w1 >> 16) & 0xFF).astype(jnp.float32) \
                * (1.0 / 255.0) - 0.5
            sxz = ((w1 >> 8) & 0xFF).astype(jnp.float32) \
                * (1.0 / 255.0) - 0.5
            syz = (w1 & 0xFF).astype(jnp.float32) * (1.0 / 255.0) - 0.5
            q = (sxx * dx * dx + syy * dy * dy + szz * dz * dz
                 + 2.0 * (sxy * dx * dy + sxz * dx * dz + syz * dy * dz))
            sigma = jnp.sqrt(jnp.maximum(q, 0.0))
            a = a * jnp.minimum(2.0 * sigma, 1.0)
        # sqrt-encoded premultiplied radiance (models/voxels._pack_rgba8)
        pr = r8 * r8 * RADIANCE_SCALE
        pg = g8 * g8 * RADIANCE_SCALE
        pb = b8 * b8 * RADIANCE_SCALE
        live = inside & (tr > 1e-3)
        gate = jnp.where(live, tr, 0.0)
        ar = ar + gate * pr
        ag = ag + gate * pg
        ab = ab + gate * pb
        tr = tr * (1.0 - jnp.where(live, a, 0.0))
        return (t * growth + 0.35 * cell, ar, ag, ab, tr)

    t, acc_r, acc_g, acc_b, trans = jax.lax.fori_loop(
        0, steps, body, (t, acc_r, acc_g, acc_b, trans))
    _ = offs
    return acc_r, acc_g, acc_b, trans


def _unproject_ds(depth, view, ds, row0, full_h, W):
    """Downsampled receiver positions + view dirs, planar columns
    (the ops/ssr.py receiver pattern — depth-plane downsample, column
    unprojection; never downsample (H, W, 3) images)."""
    from ..utils import math3d
    from .shadows import downsample2d
    d = downsample2d(depth, ds)
    h, w = d.shape
    sx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5
    sy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds + 0.5 + row0
    ndc_x = sx / W * 2.0 - 1.0
    ndc_y = 1.0 - sy / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    px, py, pz, pw = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, d)
    iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
    return d, px * iw, py * iw, pz * iw


def voxel_reflections(scene, depth, normal, view, config, row0=0,
                      full_h=None):
    """Off-screen reflection fallback: cone-trace the voxel grid along the
    reflected view ray (reference: RayTracedReflectionsPass — the SSR-miss
    consumer; CLodRayTracingSystem.h:16-75). Returns (col (H, W, 3),
    trans (H, W)): `col` is the traced radiance, `trans` how much of the
    prefiltered environment still passes (1 = clean miss)."""
    H, W = depth.shape
    full_h = full_h or H
    ds = config.voxel_rt_downscale
    d, px, py, pz = _unproject_ds(depth, view, ds, row0, full_h, W)
    from .shadows import downsample2d
    nx = downsample2d(normal[..., 0], ds)
    ny = downsample2d(normal[..., 1], ds)
    nz = downsample2d(normal[..., 2], ds)
    vx = px - view.cam_pos[0]
    vy = py - view.cam_pos[1]
    vz = pz - view.cam_pos[2]
    il = 1.0 / jnp.maximum(jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-6)
    vx, vy, vz = vx * il, vy * il, vz * il
    vdotn = vx * nx + vy * ny + vz * nz
    rx = vx - 2.0 * vdotn * nx
    ry = vy - 2.0 * vdotn * ny
    rz = vz - 2.0 * vdotn * nz

    meta = scene.voxel_meta
    origin, cell = meta[0:3], meta[3]
    # Bias the start off the surface along the normal so the receiver's
    # own cell doesn't occlude the ray.
    bias = 1.75 * cell
    cr, cg, cb, tr = cone_trace(
        scene.voxel_grid, origin, cell, config.voxel_n,
        config.voxel_level_offsets,
        px + nx * bias, py + ny * bias, pz + nz * bias, rx, ry, rz,
        steps=config.voxel_rt_steps, growth=1.32, cone_tan=0.14,
        sggx=scene.voxel_sggx if getattr(config, "voxel_sggx", False)
        else None)
    live = d > 0
    tr = jnp.where(live, tr, 1.0)
    col = jnp.stack([jnp.where(live, cr, 0.0), jnp.where(live, cg, 0.0),
                     jnp.where(live, cb, 0.0)], axis=-1)
    if ds > 1:
        col = jax.image.resize(col, (H, W, 3), method="bilinear")
        tr = jax.image.resize(tr, (H, W), method="bilinear")
    return col, tr


def voxel_primary(scene, view, config, H, W, row0=0, full_h=None):
    """Primary-visibility fallback: march camera rays where the budgeted
    cut / streaming residency left pixels uncovered (reference: the voxel
    LOD fallback raster, VoxelGroupBuilder.cpp + voxelSoftwareRaster.hlsl).
    Returns (col (H, W, 3), trans (H, W)) at full res."""
    from ..utils import math3d
    full_h = full_h or H
    ds = config.voxel_rt_downscale
    h, w = H // ds, W // ds
    sx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5
    sy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds + 0.5 + row0
    ndc_x = sx / W * 2.0 - 1.0
    ndc_y = 1.0 - sy / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    # A FINITE point along each pixel ray: under infinite reverse-Z the
    # far plane (z_ndc = 0) has w = 0, so unproject z_ndc = 0.1 (view
    # depth = 10x near) and take the direction from the camera.
    px, py, pz, pw = math3d.mat4_columns(
        inv_vp, ndc_x, ndc_y, jnp.full((h, w), 0.1, jnp.float32))
    iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
    dx = px * iw - view.cam_pos[0]
    dy = py * iw - view.cam_pos[1]
    dz = pz * iw - view.cam_pos[2]
    il = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-9)
    dx, dy, dz = dx * il, dy * il, dz * il
    meta = scene.voxel_meta
    origin, cell = meta[0:3], meta[3]
    ox = jnp.broadcast_to(view.cam_pos[0], (h, w))
    oy = jnp.broadcast_to(view.cam_pos[1], (h, w))
    oz = jnp.broadcast_to(view.cam_pos[2], (h, w))
    cr, cg, cb, tr = cone_trace(
        scene.voxel_grid, origin, cell, config.voxel_n,
        config.voxel_level_offsets, ox, oy, oz, dx, dy, dz,
        steps=config.voxel_primary_steps, growth=1.22, cone_tan=0.004,
        sggx=scene.voxel_sggx if getattr(config, "voxel_sggx", False)
        else None)
    col = jnp.stack([cr, cg, cb], axis=-1)
    if ds > 1:
        col = jax.image.resize(col, (H, W, 3), method="bilinear")
        tr = jax.image.resize(tr, (H, W), method="bilinear")
    return col, tr

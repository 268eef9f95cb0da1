"""Tiled light culling + Pallas per-tile shading for many local lights.

TPU-native redesign of the reference's clustered lighting
(reference: shaders/clustering.hlsl building the 12x12x24 froxel grid +
lightCulling.hlsl building paged per-froxel light linked-lists, consumed by
deferred.hlsl). Differences by design:

- The reference's froxel lists are consumed with per-pixel pointer chasing —
  poison on TPU (no per-lane gather). Here lights are culled per *raster
  tile* (tile_h x tile_w pixels) against the tile's world-space AABB
  (from its depth min/max — this carries the same z-awareness as froxel
  z-slicing), producing a fixed-capacity per-tile light list.
- A Pallas kernel walks each tile's list exactly like the rasterizer walks
  pair lists: light parameters stream through SMEM as scalars and the BRDF
  evaluates vectorized over the whole tile on the VPU.
- Directional lights and IBL stay in the full-screen jnp pass (they apply
  to every pixel; nothing to cull).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph.framedata import FrameConfig, LIGHT_STRIDE, ViewData

SHADE_IN_CHANNELS = 12  # [n xyz, albedo rgb, metallic, roughness, wpos xyz, valid]


def tile_world_bounds(depth_p: jnp.ndarray, view: ViewData, config: FrameConfig,
                      row0_tiles=0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile world-space AABB from the depth buffer.

    Returns (mins (num_tiles, 3), maxs (num_tiles, 3)). Tiles with no
    geometry get degenerate far-plane boxes (lights still shade the sky
    pixels as no-ops since valid=0 there). The tile-row count comes from
    depth_p's shape; `row0_tiles` is the grid's global tile-row offset when
    depth_p is a screen-row shard (parallel/tile_sharding.py).
    """
    th, tw = config.tile_h, config.tile_w
    tx = config.tiles_x
    ty = depth_p.shape[0] // th
    d = depth_p.reshape(ty, th, tx, tw)
    zmax = d.max(axis=(1, 3)).reshape(-1)           # nearest (reverse-Z)
    zmin_raw = d.min(axis=(1, 3)).reshape(-1)
    # Empty pixels have z=0 (infinitely far); clamp to a small epsilon so
    # the AABB stays finite (matches clamping the far froxel slice).
    zmin = jnp.maximum(zmin_raw, 1e-4)
    zmax = jnp.maximum(zmax, zmin)

    # Tile corner NDC coordinates (global screen space).
    tile_i = jnp.arange(ty * tx)
    cx0 = (tile_i % tx) * tw
    cy0 = (tile_i // tx + row0_tiles) * th
    x0 = cx0 / config.width * 2.0 - 1.0
    x1 = (cx0 + tw) / config.width * 2.0 - 1.0
    y0 = 1.0 - cy0 / config.height * 2.0
    y1 = 1.0 - (cy0 + th) / config.height * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)

    def unproject(x, y, z):
        from ..utils import math3d
        wx, wy, wz, ww = math3d.mat4_columns(inv_vp, x, y, z)
        iw = 1.0 / jnp.where(jnp.abs(ww) > 1e-12, ww, 1.0)
        return jnp.stack([wx * iw, wy * iw, wz * iw], axis=-1)

    pts = jnp.stack([
        unproject(xx, yy, zz)
        for xx in (x0, x1) for yy in (y0, y1) for zz in (zmin, zmax)
    ], axis=1)                                      # (num_tiles, 8, 3)
    return pts.min(axis=1), pts.max(axis=1)


def cull_lights_tiles(depth_p: jnp.ndarray, lights: jnp.ndarray,
                      num_lights: jnp.ndarray, view: ViewData,
                      config: FrameConfig, row0_tiles=0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Light-vs-tile culling. Returns (payload (num_tiles, MAX, LIGHT_STRIDE)
    f32, counts (num_tiles,) i32, overflow () i32). num_tiles is the tile
    count of depth_p (a screen-row shard when row0_tiles != 0).

    Only positional lights (type != 0) participate; sphere-vs-AABB test with
    the light's range (reference: lightCulling.hlsl sphere tests)."""
    L = lights.shape[0]
    MAX = config.max_lights_per_cluster
    mins, maxs = tile_world_bounds(depth_p, view, config, row0_tiles)  # (NT, 3)
    lpos = lights[:, 0:3]
    ltype = lights[:, 3]
    lrange = lights[:, 11]
    live = (jnp.arange(L) < num_lights) & (ltype != 0.0)
    if config.max_shadow_lights > 0:
        # Shadow-casting locals with a live slot shade through the per-light
        # shadowed pass (graph/frame.py), not the tiled loop. Lights whose
        # slot exceeds the config's pass count still shade here (unshadowed)
        # rather than vanishing.
        live = live & ~((lights[:, 14] >= 0.0) &
                        (lights[:, 14] < float(config.max_shadow_lights)))
    if config.max_shadow_cubes > 0:
        live = live & ~((lights[:, 15] >= 0.0) &
                        (lights[:, 15] < float(config.max_shadow_cubes)))
    # Squared distance from light to AABB.
    d = jnp.maximum(mins[:, None, :] - lpos[None, :, :], 0.0) + \
        jnp.maximum(lpos[None, :, :] - maxs[:, None, :], 0.0)  # (NT, L, 3)
    dist2 = jnp.sum(d * d, axis=-1)
    hit = live[None, :] & (dist2 <= (lrange * lrange)[None, :])  # (NT, L)

    counts = jnp.sum(hit, axis=1).astype(jnp.int32)
    overflow = jnp.sum(jnp.maximum(counts - MAX, 0))
    # Fixed-capacity list: sort light indices (misses to the back). The list
    # MUST be exactly MAX wide — the shading kernel DMAs MAX*LIGHT_STRIDE
    # per tile (a short slice here means out-of-bounds DMAs -> TPU Internal
    # errors), so pad with the sentinel when the table is smaller than MAX.
    key = jnp.where(hit, jnp.arange(L, dtype=jnp.int32)[None, :], L)
    key = jnp.sort(key, axis=1)
    if MAX <= L:
        key = key[:, :MAX]
    else:
        key = jnp.pad(key, ((0, 0), (0, MAX - L)), constant_values=L)
    payload = lights[jnp.minimum(key, L - 1)]                # (NT, MAX, 16)
    # Zero the intensity lane of out-of-range slots so they contribute 0.
    slot_live = key < L
    payload = payload.at[:, :, 7].set(
        jnp.where(slot_live, payload[:, :, 7], 0.0))
    counts = jnp.minimum(counts, MAX)
    return payload, counts, overflow


def _tiled_shade_kernel(counts_ref, misc_ref, payload_ref, gin_ref, out_ref,
                        buf_ref, sem_ref, *, tile_h, tile_w, tiles_x, max_l):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * tiles_x + tx
    n = counts_ref[tile]

    SLAB = max_l * LIGHT_STRIDE
    dma = pltpu.make_async_copy(
        payload_ref.at[pl.ds(pl.multiple_of(tile * SLAB, SLAB), SLAB)],
        buf_ref, sem_ref)
    dma.start()

    nx, ny, nz = gin_ref[0], gin_ref[1], gin_ref[2]
    ar, ag, ab = gin_ref[3], gin_ref[4], gin_ref[5]
    metallic, roughness = gin_ref[6], gin_ref[7]
    wx, wy, wz = gin_ref[8], gin_ref[9], gin_ref[10]
    valid = gin_ref[11]
    camx, camy, camz = misc_ref[0], misc_ref[1], misc_ref[2]

    vx = camx - wx
    vy = camy - wy
    vz = camz - wz
    vl = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz + 1e-12)
    vx, vy, vz = vx * vl, vy * vl, vz * vl
    n_dot_v = jnp.maximum(nx * vx + ny * vy + nz * vz, 1e-4)
    alpha = jnp.maximum(roughness * roughness, 1e-3)
    a2 = alpha * alpha
    f0r = 0.04 * (1.0 - metallic) + ar * metallic
    f0g = 0.04 * (1.0 - metallic) + ag * metallic
    f0b = 0.04 * (1.0 - metallic) + ab * metallic
    inv_pi = 0.3183098861837907

    acc_r = jnp.zeros((tile_h, tile_w), jnp.float32)
    acc_g = jnp.zeros((tile_h, tile_w), jnp.float32)
    acc_b = jnp.zeros((tile_h, tile_w), jnp.float32)

    dma.wait()

    def light_body(j, acc):
        acc_r, acc_g, acc_b = acc
        base = j * LIGHT_STRIDE
        lx, ly, lz = buf_ref[base + 0], buf_ref[base + 1], buf_ref[base + 2]
        ltype = buf_ref[base + 3]
        dx, dy, dz = buf_ref[base + 4], buf_ref[base + 5], buf_ref[base + 6]
        intensity = buf_ref[base + 7]
        cr, cg, cb = buf_ref[base + 8], buf_ref[base + 9], buf_ref[base + 10]
        rng = buf_ref[base + 11]
        cos_in, cos_out = buf_ref[base + 12], buf_ref[base + 13]

        tlx = lx - wx
        tly = ly - wy
        tlz = lz - wz
        dist2 = tlx * tlx + tly * tly + tlz * tlz
        inv_d = jax.lax.rsqrt(dist2 + 1e-12)
        ux, uy, uz = tlx * inv_d, tly * inv_d, tlz * inv_d
        att = 1.0 / jnp.maximum(dist2, 1e-4)
        dist = dist2 * inv_d
        win = jnp.clip(1.0 - (dist / jnp.maximum(rng, 1e-3)) ** 4, 0.0, 1.0)
        att = att * win * win
        # Spot cone (type 2).
        cd = -(ux * dx + uy * dy + uz * dz)
        spot = jnp.clip((cd - cos_out) / jnp.maximum(cos_in - cos_out, 1e-4),
                        0.0, 1.0)
        att = jnp.where(ltype == 2.0, att * spot * spot, att)

        hx = ux + vx
        hy = uy + vy
        hz = uz + vz
        hl = jax.lax.rsqrt(hx * hx + hy * hy + hz * hz + 1e-12)
        hx, hy, hz = hx * hl, hy * hl, hz * hl
        n_dot_l = jnp.maximum(nx * ux + ny * uy + nz * uz, 0.0)
        n_dot_h = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
        v_dot_h = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)
        dd = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
        D = a2 / jnp.maximum(3.14159265 * dd * dd, 1e-8)
        gv = n_dot_l * jnp.sqrt(jnp.maximum(n_dot_v * n_dot_v * (1 - a2) + a2, 1e-12))
        gl = n_dot_v * jnp.sqrt(jnp.maximum(n_dot_l * n_dot_l * (1 - a2) + a2, 1e-12))
        Vis = 0.5 / jnp.maximum(gv + gl, 1e-8)
        fres = (1.0 - v_dot_h) ** 5
        Fr = f0r + (1.0 - f0r) * fres
        Fg = f0g + (1.0 - f0g) * fres
        Fb = f0b + (1.0 - f0b) * fres
        kd = (1.0 - metallic)
        DV = D * Vis
        rad = intensity * att * n_dot_l * valid
        acc_r = acc_r + (kd * (1.0 - Fr) * ar * inv_pi + DV * Fr) * cr * rad
        acc_g = acc_g + (kd * (1.0 - Fg) * ag * inv_pi + DV * Fg) * cg * rad
        acc_b = acc_b + (kd * (1.0 - Fb) * ab * inv_pi + DV * Fb) * cb * rad
        return acc_r, acc_g, acc_b

    acc_r, acc_g, acc_b = jax.lax.fori_loop(
        0, n, light_body, (acc_r, acc_g, acc_b))
    out_ref[0] = acc_r
    out_ref[1] = acc_g
    out_ref[2] = acc_b


def tiled_shade_pallas(shade_in: jnp.ndarray, payload: jnp.ndarray,
                       counts: jnp.ndarray, cam_pos: jnp.ndarray,
                       config: FrameConfig, interpret: bool = False
                       ) -> jnp.ndarray:
    """shade_in: (SHADE_IN_CHANNELS, H', W'); returns local-light HDR
    contribution (3, H', W') on the padded grid."""
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = config.tiles_x, config.tiles_y
    MAX = config.max_lights_per_cluster
    flat = payload.reshape(-1)
    misc = jnp.concatenate([cam_pos.astype(jnp.float32),
                            jnp.zeros((1,), jnp.float32)])

    kernel = functools.partial(_tiled_shade_kernel, tile_h=th, tile_w=tw,
                               tiles_x=tiles_x, max_l=MAX)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((SHADE_IN_CHANNELS, th, tw), lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, th, tw), lambda i, j, *_: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((MAX * LIGHT_STRIDE,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, tiles_y * th, tiles_x * tw),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(counts, misc, flat, shade_in)
    return out


def tiled_shade_ref(shade_in: jnp.ndarray, payload: jnp.ndarray,
                    counts: jnp.ndarray, cam_pos: jnp.ndarray,
                    config: FrameConfig) -> jnp.ndarray:
    """Pure-jnp twin of the Pallas tiled shader (CPU tests + sharded path)."""
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = config.tiles_x, config.tiles_y
    C = SHADE_IN_CHANNELS
    g = shade_in.reshape(C, tiles_y, th, tiles_x, tw).transpose(1, 3, 0, 2, 4)
    g = g.reshape(tiles_y * tiles_x, C, th, tw)

    def one_tile(gin, pay, n):
        def body(j, acc):
            row = pay[j]
            lpos, ltype = row[0:3], row[3]
            ldir, intensity = row[4:7], row[7]
            color, rng = row[8:11], row[11]
            cos_in, cos_out = row[12], row[13]
            nrm = gin[0:3]
            alb = gin[3:6]
            metallic, roughness = gin[6], gin[7]
            wp = gin[8:11]
            valid = gin[11]
            v = cam_pos[:, None, None] - wp
            v = v * jax.lax.rsqrt(jnp.sum(v * v, 0, keepdims=True) + 1e-12)
            tl = lpos[:, None, None] - wp
            dist2 = jnp.sum(tl * tl, 0)
            inv_d = jax.lax.rsqrt(dist2 + 1e-12)
            u = tl * inv_d[None]
            att = 1.0 / jnp.maximum(dist2, 1e-4)
            dist = dist2 * inv_d
            win = jnp.clip(1.0 - (dist / jnp.maximum(rng, 1e-3)) ** 4, 0, 1)
            att = att * win * win
            cd = -jnp.sum(u * ldir[:, None, None], 0)
            spot = jnp.clip((cd - cos_out) / jnp.maximum(cos_in - cos_out, 1e-4), 0, 1)
            att = jnp.where(ltype == 2.0, att * spot * spot, att)
            h = u + v
            h = h * jax.lax.rsqrt(jnp.sum(h * h, 0, keepdims=True) + 1e-12)
            n_dot_l = jnp.maximum(jnp.sum(nrm * u, 0), 0.0)
            n_dot_v = jnp.maximum(jnp.sum(nrm * v, 0), 1e-4)
            n_dot_h = jnp.maximum(jnp.sum(nrm * h, 0), 0.0)
            v_dot_h = jnp.maximum(jnp.sum(v * h, 0), 0.0)
            alpha = jnp.maximum(roughness ** 2, 1e-3)
            a2 = alpha * alpha
            f0 = 0.04 * (1 - metallic)[None] + alb * metallic[None]
            dd = n_dot_h * n_dot_h * (a2 - 1) + 1
            D = a2 / jnp.maximum(jnp.pi * dd * dd, 1e-8)
            gv = n_dot_l * jnp.sqrt(jnp.maximum(n_dot_v ** 2 * (1 - a2) + a2, 1e-12))
            gl = n_dot_v * jnp.sqrt(jnp.maximum(n_dot_l ** 2 * (1 - a2) + a2, 1e-12))
            Vis = 0.5 / jnp.maximum(gv + gl, 1e-8)
            F = f0 + (1 - f0) * (1 - v_dot_h)[None] ** 5
            kd = (1 - F) * (1 - metallic)[None]
            rad = intensity * att * n_dot_l * valid
            return acc + (kd * alb / jnp.pi + D * Vis * F) * color[:, None, None] * rad[None]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((3, th, tw), jnp.float32))

    out = jax.vmap(one_tile)(g, payload, counts)
    return out.reshape(tiles_y, tiles_x, 3, th, tw).transpose(
        2, 0, 3, 1, 4).reshape(3, tiles_y * th, tiles_x * tw)

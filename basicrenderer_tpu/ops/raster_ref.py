"""Reference (pure-jnp) tile rasterizer — semantics oracle for the Pallas
kernel and the CPU-test backend.

Same algorithm as ops/raster_pallas.py: per tile, walk the tile's binned
pair rows, evaluate barycentric edge planes at pixel centers, and keep the
closest (reverse-Z max) depth + triangle id per pixel. Runs under vmap over
tiles; fine for CPU tests and small frames, not the production path.

Reference analogue: shaders/ClusterLOD/softwareRaster.hlsl:1-60 (edge
functions + InterlockedMin64 depth/id pack — on TPU the atomic becomes a
sequential masked min per tile, which is exact, not racy).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig
from .raster_setup import BinnedPairs, GroupBinnedPairs, SETUP_LANES


def _group_walk(pairs: GroupBinnedPairs, config: FrameConfig, start, n,
                raster_row, carry):
    """Group-binned walk order (matches the Pallas group kernel): this
    tile's (group, tile) pairs' rows, then the global large-group list."""
    GR = config.group_rows

    def rows_of(gid, c):
        return jax.lax.fori_loop(
            0, GR, lambda j, cc: raster_row(gid * GR + j, cc), c)

    carry = jax.lax.fori_loop(
        0, n, lambda p, c: rows_of(pairs.group_ids[start + p], c), carry)
    return jax.lax.fori_loop(
        0, pairs.big_count, lambda p, c: rows_of(pairs.big_ids[p], c), carry)


def raster_tiles_ref(pairs: BinnedPairs, config: FrameConfig,
                     max_iters: int = None, tile_row0=0, init=None, peel=None,
                     accum: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (depth (H', W') f32, vis (H', W') i32) on the padded grid.

    `max_iters` bounds the per-tile pair walk (tests keep scenes small).
    `tile_row0` offsets the tile grid vertically — used when rasterizing a
    screen-space shard whose edge planes are in global screen coordinates
    (parallel/tile_sharding.py).
    """
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = config.tiles_x, config.tiles_y
    grouped = isinstance(pairs, GroupBinnedPairs)
    pair_data = pairs.lanes if grouped else pairs.pair_data

    col = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1) + 0.5
    row = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0) + 0.5

    def raster_one_tile(tile_idx):
        ty = tile_idx // tiles_x + tile_row0
        tx = tile_idx % tiles_x
        px = col + (tx * tw).astype(jnp.float32)
        py = row + (ty * th).astype(jnp.float32)
        start = pairs.tile_offsets[tile_idx]
        end = pairs.tile_offsets[tile_idx + 1]
        n = end - start if max_iters is None else jnp.minimum(end - start, max_iters)

        if peel is not None:
            ty_l = tile_idx // tiles_x
            tx_l = tile_idx % tiles_x
            peel_z = jax.lax.dynamic_slice(peel[1], (ty_l * th, tx_l * tw),
                                           (th, tw))
        else:
            peel_z = None

        def raster_row(idx, carry):
            zbuf, vis = carry
            d = pair_data[idx]
            tri_id_f = d[9]
            e0 = d[0] * px + d[1] * py + d[2]
            e1 = d[3] * px + d[4] * py + d[5]
            # Derived exactly like the Pallas kernel (pixel-exact parity):
            # barycentric planes sum to 1 identically.
            e2 = 1.0 - e0 - e1
            z = d[6] * px + d[7] * py + d[8]
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (tri_id_f > 0.5)
            passd = inside & (z > zbuf)
            if peel_z is not None:
                passd = passd & (z < peel_z)
            if accum:
                # Accumulation mode (AVBOIT-tier probe; see the Pallas
                # twin): `vis` is an (8, th, tw) f32 stack — depth-warp-
                # weighted Σw·alpha in 0, Σw·premult-color in 1..3,
                # per-channel Σoptical-depth in 4..6, count in 7 —
                # decoded from payload lanes 28/30/31 with the identical
                # floor-divide chain (pixel-exact parity). The warp
                # weight w(u) = u^2 + 0.05 of the fragment's normalized
                # position in the (K-th layer .. opaque) band is the
                # AVBOIT depth-warp analogue: nearer tail fragments
                # dominate the tail's emission average.
                p30 = d[30]
                hi = jnp.floor(p30 * (1.0 / 256.0))
                a8 = p30 - hi * 256.0
                hi2 = jnp.floor(hi * (1.0 / 256.0))
                odr8 = hi - hi2 * 256.0
                p28 = d[28]
                c1 = jnp.floor(p28 * (1.0 / 256.0))
                r8 = p28 - c1 * 256.0
                b8 = jnp.floor(c1 * (1.0 / 256.0))
                g8 = c1 - b8 * 256.0
                pf = passd.astype(jnp.float32)
                if peel_z is not None:
                    u = jnp.clip((z - zbuf)
                                 / jnp.maximum(peel_z - zbuf, 1e-6),
                                 0.0, 1.0)
                    wgt = (u * u + 0.05) * pf
                else:
                    wgt = pf
                adds = jnp.stack([
                    wgt * (a8 * (1.0 / 255.0)),
                    wgt * (r8 * (1.0 / 255.0)),
                    wgt * (g8 * (1.0 / 255.0)),
                    wgt * (b8 * (1.0 / 255.0)),
                    pf * (odr8 * (4.0 / 255.0)),
                    pf * (hi2 * (4.0 / 255.0)),
                    pf * (d[31] * (4.0 / 255.0)),
                    pf])
                return zbuf, vis + adds
            zbuf = jnp.where(passd, z, zbuf)
            vis = jnp.where(passd, tri_id_f.astype(jnp.int32), vis)
            return zbuf, vis

        def walk(carry):
            if grouped:
                return _group_walk(pairs, config, start, n, raster_row,
                                   carry)
            carry = jax.lax.fori_loop(
                0, n, lambda j, c: raster_row(start + j, c), carry)
            # Global large-triangle list (rows [0, max_big_tris)): every
            # tile walks it — see ops/raster_setup.bin_pairs.
            return jax.lax.fori_loop(
                0, pairs.big_count, lambda j, c: raster_row(j, c), carry)

        def v_init():
            if accum:
                return jnp.zeros((8, th, tw), jnp.float32)
            return jnp.zeros((th, tw), jnp.int32)

        if peel is not None:
            z0 = jax.lax.dynamic_slice(peel[0], ((tile_idx // tiles_x) * th,
                                                 (tile_idx % tiles_x) * tw),
                                       (th, tw))
            return walk((z0, v_init()))
        if init is not None:
            ty_l = tile_idx // tiles_x
            tx_l = tile_idx % tiles_x
            z0 = jax.lax.dynamic_slice(init[0], (ty_l * th, tx_l * tw), (th, tw))
            v0 = jax.lax.dynamic_slice(init[1], (ty_l * th, tx_l * tw), (th, tw))
        else:
            z0 = jnp.zeros((th, tw), jnp.float32)
            v0 = v_init()
        return walk((z0, v0))

    zt, vt = jax.vmap(raster_one_tile)(jnp.arange(tiles_x * tiles_y))
    # (tiles, th, tw) -> (H', W')
    depth = zt.reshape(tiles_y, tiles_x, th, tw).transpose(0, 2, 1, 3).reshape(
        tiles_y * th, tiles_x * tw)
    if accum:
        vis = vt.reshape(tiles_y, tiles_x, 8, th, tw).transpose(
            2, 0, 3, 1, 4).reshape(8, tiles_y * th, tiles_x * tw)
    else:
        vis = vt.reshape(tiles_y, tiles_x, th, tw).transpose(
            0, 2, 1, 3).reshape(tiles_y * th, tiles_x * tw)
    return depth, vis

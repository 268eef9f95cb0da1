"""Tile-granular history reprojection for TAA/TAAU.

Reference analogue: the history resample step of any motion-vector TAA /
upscaler (reference: UpscalingManager's DLSS/FSR3 consume a motion texture
and warp accumulated history per pixel).

TPU redesign: a per-PIXEL history warp is a 2M-element random gather
(~14 ms at 7 ns/element — unshippable). Motion from camera + rigid objects
is piecewise smooth, so history is warped with one fractional (dy, dx) per
raster tile instead:

- y: the tile's source window is DMA'd from edge-padded history planes at
  an arbitrary integer row offset (sublane offsets are free), and the
  fractional y blend is two static row-slices of the window.
- x: lane-dimension DMA offsets must be 128-aligned (Mosaic), so the window
  is fetched 384 lanes wide at the aligned base and the residual integer +
  fractional x shift is applied with ONE small MXU matmul against a
  hat-function selection matrix (max(0, 1-|c - (o + shift)|) IS the
  two-tap bilinear weight).

Pixels whose own motion disagrees with their tile's motion reject history
(ops/post.taa_resolve_mv) — the correctness guard for motion gradients
inside a tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_Y = 72          # top pad rows (max |dy| = PAD_Y - 2; multiple of 8)
PAD_YB = 88         # bottom pad rows (window rows round up to 8-tiling)
PAD_XL = 192        # left pad cols
PAD_XR = 320        # right pad cols (left + one extra 128 block)
WIN = 384           # fetched window width (128-aligned base)
WROWS = 48          # fetched window rows (8-aligned start + th + residual)


def _warp_kernel(dyx_ref, planes_ref, out_ref, buf_ref, sem_ref, *,
                 th: int, tw: int, tiles_x: int, channels: int):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * tiles_x + tx
    dy = dyx_ref[tile]
    dx = dyx_ref[tiles_x * pl.num_programs(0) + tile]
    dy0 = jnp.floor(dy)
    dx0 = jnp.floor(dx)
    fy = dy - dy0
    fx = dx - dx0

    # Mosaic DMA slices must be 8-row-aligned in the sublane dim: align the
    # window start down and fold the residual rows into the y hat matrix.
    ry = ty * th + PAD_Y + dy0.astype(jnp.int32)
    ry0 = pl.multiple_of((ry // 8) * 8, 8)
    e = (ry - ry0).astype(jnp.float32)
    xl = tx * tw + PAD_XL + dx0.astype(jnp.int32)
    cx0 = pl.multiple_of((xl // 128) * 128, 128)
    r = (xl - cx0).astype(jnp.float32)

    # Both bilinear blends as hat-function selection matmuls
    # (max(0, 1-|d|) IS the two-tap weight row; see ops/textures.py):
    # y: (th, WROWS) picks rows e+fy+o and +1; x: (WIN, tw) picks cols
    # r+fx+o and +1. Mosaic iota must be integer-typed; cast after.
    ri = jax.lax.broadcasted_iota(jnp.int32, (th, WROWS), 1).astype(
        jnp.float32)
    oy = jax.lax.broadcasted_iota(jnp.int32, (th, WROWS), 0).astype(
        jnp.float32)
    Sy = jnp.maximum(1.0 - jnp.abs(ri - oy - (e + fy)), 0.0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (WIN, tw), 0).astype(jnp.float32)
    ox = jax.lax.broadcasted_iota(jnp.int32, (WIN, tw), 1).astype(jnp.float32)
    Sx = jnp.maximum(1.0 - jnp.abs(ci - ox - (r + fx)), 0.0)

    for c in range(channels):
        dma = pltpu.make_async_copy(
            planes_ref.at[c, pl.ds(ry0, WROWS), pl.ds(cx0, WIN)],
            buf_ref, sem_ref)
        dma.start()
        dma.wait()
        yb = jax.lax.dot_general(
            Sy, buf_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)                   # (th, WIN)
        out_ref[c] = jax.lax.dot_general(
            yb, Sx, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)                   # (th, tw)


def warp_history_tiles(history: jnp.ndarray, tile_dy: jnp.ndarray,
                       tile_dx: jnp.ndarray, tile_h: int, tile_w: int,
                       interpret: bool = False) -> jnp.ndarray:
    """history (H, W, C) + per-tile fractional motion (T,) each ->
    warped history (H, W, C). Tile grid = (H // tile_h, W // tile_w); H/W
    must be tile-divisible (callers pass the padded frame)."""
    H, W, C = history.shape
    ty, tx = H // tile_h, W // tile_w
    dy = jnp.clip(tile_dy, -(PAD_Y - 2.0), PAD_Y - 2.0)
    dx = jnp.clip(tile_dx, -(PAD_XL - 2.0), PAD_XL - 2.0)
    planes = jnp.pad(history.transpose(2, 0, 1),
                     ((0, 0), (PAD_Y, PAD_YB), (PAD_XL, PAD_XR)), mode="edge")
    dyx = jnp.concatenate([dy, dx]).astype(jnp.float32)

    kernel = functools.partial(_warp_kernel, th=tile_h, tw=tile_w,
                               tiles_x=tx, channels=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ty, tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((C, tile_h, tile_w), lambda i, j, *_: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WROWS, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, ty * tile_h, tx * tile_w),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(dyx, planes)
    return out.transpose(1, 2, 0)


def warp_history_ref(history: jnp.ndarray, tile_dy: jnp.ndarray,
                     tile_dx: jnp.ndarray, tile_h: int, tile_w: int
                     ) -> jnp.ndarray:
    """Pure-jnp twin (CPU tests + sharded path)."""
    H, W, C = history.shape
    ty, tx = H // tile_h, W // tile_w
    dy = jnp.clip(tile_dy, -(PAD_Y - 2.0), PAD_Y - 2.0)
    dx = jnp.clip(tile_dx, -(PAD_XL - 2.0), PAD_XL - 2.0)
    planes = jnp.pad(history, ((PAD_Y, PAD_YB), (PAD_XL, PAD_XR), (0, 0)),
                     mode="edge")

    def one_tile(tile):
        tyi = tile // tx
        txi = tile % tx
        d_y, d_x = dy[tile], dx[tile]
        y0 = jnp.floor(d_y)
        x0 = jnp.floor(d_x)
        fy = d_y - y0
        fx = d_x - x0
        win = jax.lax.dynamic_slice(
            planes, (tyi * tile_h + PAD_Y + y0.astype(jnp.int32),
                     txi * tile_w + PAD_XL + x0.astype(jnp.int32), 0),
            (tile_h + 1, tile_w + 1, C))
        top = win[:tile_h, :tile_w] * (1 - fy) + win[1:, :tile_w] * fy
        bot = win[:tile_h, 1:] * (1 - fy) + win[1:, 1:] * fy
        return top * (1 - fx) + bot * fx

    tiles = jax.vmap(one_tile)(jnp.arange(ty * tx))
    return tiles.reshape(ty, tx, tile_h, tile_w, C).transpose(
        0, 2, 1, 3, 4).reshape(H, W, C)

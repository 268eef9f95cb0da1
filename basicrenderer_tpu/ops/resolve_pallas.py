"""Visibility-buffer attribute resolve: per-pixel G-buffer channels from
screen-space attribute planes — zero vertex gathers.

TPU-native replacement for the reference's VisUtil material evaluation
(reference: shaders/VisUtilEvaluate.hlsl:10-36 — EvaluateMaterialGroupCS
fetches cluster vertex data per pixel and decodes barycentrics). A per-pixel
fetch path is poison on TPU (XLA gathers serialize); instead triangle setup
precomputed perspective-correct *planes* (attr/w, 1/w affine in x, y), and
this pass walks each tile's binned pair list once more:

- mask = (vis == tri_id): which pixels this triangle won.
- if none (scalar @pl.when skip — the common case, occluded pairs), move on
  after 2 vector ops.
- else evaluate the 7 attribute planes and select them into the channel
  accumulators under the mask.

The division by 1/w (derived from the depth buffer — there is no 1/w
plane; see shade.inv_w_from_depth) happens once per pixel at the end.
Channels: [nx/w, ny/w, nz/w, u/w, v/w, mat_id, unused, accum].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph.framedata import FrameConfig
from .raster_setup import BinnedPairs, SETUP_LANES

CHUNK = 128
NUM_CHANNELS = 8


def _resolve_kernel(tile_off_ref, misc_ref, flat_ref, vis_ref, out_ref,
                    buf_ref, sem_ref, *, tile_h: int, tile_w: int,
                    tiles_x: int, tangent: bool = False):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * tiles_x + tx
    start = (tile_off_ref[tile] // CHUNK) * CHUNK
    end = tile_off_ref[tile + 1]
    n = end - start

    out_ref[:] = jnp.zeros((NUM_CHANNELS, tile_h, tile_w), jnp.float32)
    vis = vis_ref[:]

    px = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
          + (tx * tile_w).astype(jnp.float32) + 0.5)
    py = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
          + ((ty + misc_ref[0]) * tile_h).astype(jnp.float32) + 0.5)

    SLAB = CHUNK * SETUP_LANES

    def get_dma(slot, row0_chunks, c):
        off = pl.multiple_of((row0_chunks + c) * SLAB, SLAB)
        dst = pl.multiple_of(slot * SLAB, SLAB)
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(off, SLAB)],
            buf_ref.at[pl.ds(dst, SLAB)],
            sem_ref.at[slot],
        )

    def tri_body(j, slot_base):
        base = slot_base + j * SETUP_LANES
        tri_id = buf_ref[base + 9].astype(jnp.int32)
        mask = (vis == tri_id) & (tri_id > 0)
        hit = jnp.any(mask)

        @pl.when(hit)
        def _():
            # 4 attr/w planes (lanes 15..26: oct-normal + uv), mat id lane
            # 10 (1/w derives from the depth buffer at resolve:
            # shade.inv_w_from_depth).
            for ch in range(4):
                A = buf_ref[base + 15 + ch * 3]
                B = buf_ref[base + 16 + ch * 3]
                Cc = buf_ref[base + 17 + ch * 3]
                val = A * px + B * py + Cc
                out_ref[ch] = jnp.where(mask, val, out_ref[ch])
            out_ref[4] = jnp.where(mask, buf_ref[base + 10], out_ref[4])
            if tangent:
                # Per-tri FLAT tangent theta (lane 27) -> channel 5.
                out_ref[5] = jnp.where(mask, buf_ref[base + 27], out_ref[5])
        return slot_base

    def walk(row0_chunks, nrows):
        nchunks = pl.cdiv(nrows, CHUNK)

        @pl.when(nchunks > 0)
        def _():
            get_dma(0, row0_chunks, 0).start()

        def chunk_body(c, _):
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                get_dma((c + 1) % 2, row0_chunks, c + 1).start()

            get_dma(slot, row0_chunks, c).wait()
            n_this = jnp.minimum(nrows - c * CHUNK, CHUNK)
            jax.lax.fori_loop(0, n_this, tri_body, slot * SLAB)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk_body, 0)

    walk(start // CHUNK, n)
    # Global large-triangle list at rows [0, max_big_tris)
    # (see ops/raster_setup.bin_pairs).
    walk(0, misc_ref[1])


def resolve_attributes_pallas(pairs: BinnedPairs, vis: jnp.ndarray,
                              config: FrameConfig, interpret: bool = False,
                              tile_row0=0) -> jnp.ndarray:
    """vis: (H', W') i32 padded visibility buffer -> (NUM_CHANNELS, H', W')."""
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = config.tiles_x, config.tiles_y
    flat = jnp.pad(pairs.pair_data, ((0, CHUNK), (0, 0))).reshape(-1)

    kernel = functools.partial(_resolve_kernel, tile_h=th, tile_w=tw,
                               tangent=config.enable_vertex_tangents,
                               tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((th, tw), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NUM_CHANNELS, th, tw),
                               lambda i, j, *_: (0, i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2 * CHUNK * SETUP_LANES,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (NUM_CHANNELS, tiles_y * th, tiles_x * tw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pairs.tile_offsets,
      jnp.stack([jnp.asarray(tile_row0, jnp.int32).reshape(()),
                 pairs.big_count.astype(jnp.int32)]), flat, vis)
    return out


def resolve_attributes_ref(pairs: BinnedPairs, vis: jnp.ndarray,
                           config: FrameConfig, max_iters: int = None,
                           tile_row0=0) -> jnp.ndarray:
    """Pure-jnp twin of the Pallas resolve (CPU tests + sharded path)."""
    from .raster_ref import _group_walk
    from .raster_setup import GroupBinnedPairs
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = config.tiles_x, config.tiles_y
    grouped = isinstance(pairs, GroupBinnedPairs)
    pair_data = pairs.lanes if grouped else pairs.pair_data

    col = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1) + 0.5
    row = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0) + 0.5
    vis_tiles = vis.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3).reshape(
        tiles_y * tiles_x, th, tw)

    def one_tile(tile_idx, vis_t):
        ty = tile_idx // tiles_x + tile_row0
        tx = tile_idx % tiles_x
        px = col + (tx * tw).astype(jnp.float32)
        py = row + (ty * th).astype(jnp.float32)
        start = pairs.tile_offsets[tile_idx]
        end = pairs.tile_offsets[tile_idx + 1]
        n = end - start if max_iters is None else jnp.minimum(end - start, max_iters)

        def body(idx, acc):
            d = pair_data[idx]
            tri_id = d[9].astype(jnp.int32)
            mask = (vis_t == tri_id) & (tri_id > 0)
            chans = []
            for ch in range(4):
                val = d[15 + ch * 3] * px + d[16 + ch * 3] * py \
                    + d[17 + ch * 3]
                chans.append(val)
            chans.append(jnp.broadcast_to(d[10], (th, tw)))
            if config.enable_vertex_tangents:
                chans.append(jnp.broadcast_to(d[27], (th, tw)))
            else:
                chans.append(jnp.zeros((th, tw), jnp.float32))
            chans.append(jnp.zeros((th, tw), jnp.float32))
            chans.append(jnp.zeros((th, tw), jnp.float32))
            new = jnp.stack(chans)                      # (8, th, tw)
            return jnp.where(mask[None], new, acc)

        acc0 = jnp.zeros((NUM_CHANNELS, th, tw), jnp.float32)
        if grouped:
            return _group_walk(pairs, config, start, n, body, acc0)
        acc = jax.lax.fori_loop(0, n, lambda j, a: body(start + j, a), acc0)
        # Global large-triangle list at rows [0, max_big_tris)
        # (see ops/raster_setup.bin_pairs).
        return jax.lax.fori_loop(
            0, pairs.big_count, lambda j, a: body(j, a), acc)

    out = jax.vmap(one_tile)(jnp.arange(tiles_y * tiles_x), vis_tiles)
    # (tiles, 8, th, tw) -> (8, H', W')
    return out.reshape(tiles_y, tiles_x, NUM_CHANNELS, th, tw).transpose(
        2, 0, 3, 1, 4).reshape(NUM_CHANNELS, tiles_y * th, tiles_x * tw)

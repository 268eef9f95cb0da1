"""Pallas TPU tile rasterizer — the production visibility-buffer raster path.

TPU-native redesign of the reference's compute software rasterizer
(reference: shaders/ClusterLOD/softwareRaster.hlsl — 128-thread group per
cluster, edge functions + InterlockedMin64 into the visibility buffer). On
TPU the mapping is:

- grid cell  = one framebuffer tile (tile_h x tile_w pixels in VMEM)
- "atomics"  = sequential masked max over the tile's own VMEM block
  (exact and race-free: each tile owns its pixels exclusively)
- triangle feed = the tile's contiguous, RANGE_ALIGN-aligned row range of
  the sorted pair buffer (see ops/raster_setup.bin_triangles), double-buffer
  DMA'd from HBM into SMEM in CHUNK-sized slabs so the transfer overlaps the
  VPU edge evaluation. The payload is consumed as scalars (one triangle's
  planes broadcast across the whole tile), which is exactly what SMEM is for.

The inner loop evaluates 3 edge planes + 1 depth plane per triangle across
the whole tile with fused multiply-adds on the VPU — with a (32, 128) tile
those are 4096-lane vector ops, the TPU-shaped replacement for the
reference's per-pixel threads.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph.framedata import FrameConfig
from .raster_setup import BinnedPairs, GroupBinnedPairs, SETUP_LANES

CHUNK = 128  # pairs per DMA slab
# Channels: [octu/w, octv/w, u/w, v/w, mat_id, tangent, unused, accum].
# 1/w is NOT a channel (the resolve derives it from the depth buffer,
# shade.inv_w_from_depth) and normals ride as TWO octahedral planes —
# together 3 planes fewer per hit row than the round-3 layout in the
# vector-issue-bound raster loop. Accum (OIT beyond-K) mode repurposes
# channels [0, 4, 5, 6, 7] for alpha/optical-depth/count sums.
NUM_CHANNELS = 8


def _make_tri_body(buf_ref, px, py, depth_ref, vis_ref, chan_ref,
                   peel_z, peeled: bool, accum: bool,
                   tangent: bool = False):
    """The shared per-triangle vector evaluation: edge/depth planes over the
    tile, masked writes of depth/vis + fused attribute resolve. Identical in
    the per-triangle and group kernels (pixel-exact parity)."""

    def tri_body(j, slot_base):
        base = slot_base + j * SETUP_LANES
        e0 = (buf_ref[base + 0] * px + buf_ref[base + 1] * py
              + buf_ref[base + 2])
        e1 = (buf_ref[base + 3] * px + buf_ref[base + 4] * py
              + buf_ref[base + 5])
        # Barycentric planes sum to 1 identically — deriving e2 saves three
        # SMEM loads + two vector FMAs in the hottest loop of the frame
        # (the ref twin derives it the same way: pixel-exact parity).
        e2 = 1.0 - e0 - e1
        z = (buf_ref[base + 6] * px + buf_ref[base + 7] * py
             + buf_ref[base + 8])
        tri_id_f = buf_ref[base + 9]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (tri_id_f > 0.5)
        passd = inside & (z > depth_ref[:])
        if peeled:
            passd = passd & (z < peel_z)
        if accum:
            # Accumulation mode (OIT beyond-K probe, the AVBOIT-tier
            # analogue): depth-warp-weighted Σw·alpha (0) and
            # Σw·premult-color (1..3, payload lane 28), per-channel
            # optical depth (4..6, lanes 30/31), fragment count (7).
            # depth_ref stays at its seed so the peel band is stable;
            # w(u) = u^2 + 0.05 over the fragment's normalized position
            # in the (K-th layer .. opaque) band — the AVBOIT depth-warp
            # analogue (nearer tail fragments dominate the emission
            # average). Byte unpacks are SCALAR per-row (floor-divide
            # chains — Mosaic has no scalar bitcast).
            p30 = buf_ref[base + 30]
            hi = jnp.floor(p30 * (1.0 / 256.0))
            a8 = p30 - hi * 256.0
            hi2 = jnp.floor(hi * (1.0 / 256.0))
            odr8 = hi - hi2 * 256.0
            p28 = buf_ref[base + 28]
            c1 = jnp.floor(p28 * (1.0 / 256.0))
            r8 = p28 - c1 * 256.0
            b8 = jnp.floor(c1 * (1.0 / 256.0))
            g8 = c1 - b8 * 256.0
            if peeled:
                u = jnp.clip((z - depth_ref[:])
                             / jnp.maximum(peel_z - depth_ref[:], 1e-6),
                             0.0, 1.0)
                wgt = jnp.where(passd, u * u + 0.05, 0.0)
            else:
                wgt = jnp.where(passd, 1.0, 0.0)
            chan_ref[0] = chan_ref[0] + wgt * (a8 * (1.0 / 255.0))
            chan_ref[1] = chan_ref[1] + wgt * (r8 * (1.0 / 255.0))
            chan_ref[2] = chan_ref[2] + wgt * (g8 * (1.0 / 255.0))
            chan_ref[3] = chan_ref[3] + wgt * (b8 * (1.0 / 255.0))
            chan_ref[4] = chan_ref[4] + jnp.where(
                passd, odr8 * (4.0 / 255.0), 0.0)
            chan_ref[5] = chan_ref[5] + jnp.where(
                passd, hi2 * (4.0 / 255.0), 0.0)
            chan_ref[6] = chan_ref[6] + jnp.where(
                passd, buf_ref[base + 31] * (4.0 / 255.0), 0.0)
            chan_ref[7] = chan_ref[7] + jnp.where(passd, 1.0, 0.0)
            return slot_base

        # (Measured: gating these writes on a per-triangle any(passd)
        # reduce SLOWED the loop 3x — the cross-lane reduce + branch stall
        # the issue pipeline. Unconditional masked writes win.)
        depth_ref[:] = jnp.where(passd, z, depth_ref[:])
        vis_ref[:] = jnp.where(passd, tri_id_f.astype(jnp.int32), vis_ref[:])
        # Fused attribute resolve: write the perspective-correct channel
        # planes under the same pass mask (reference VisUtilEvaluate
        # equivalent, done during raster — overdrawn writes are later
        # overwritten by closer triangles, exactly like a GBuffer raster).
        for ch in range(4):
            val = (buf_ref[base + 15 + ch * 3] * px
                   + buf_ref[base + 16 + ch * 3] * py
                   + buf_ref[base + 17 + ch * 3])
            chan_ref[ch] = jnp.where(passd, val, chan_ref[ch])
        chan_ref[4] = jnp.where(passd, buf_ref[base + 10], chan_ref[4])
        if tangent:
            # Per-tri FLAT mikktspace tangent theta (lane 27) -> channel 5
            # (enable_vertex_tangents; shade.tangent_from_theta decodes).
            chan_ref[5] = jnp.where(passd, buf_ref[base + 27], chan_ref[5])
        return slot_base

    return tri_body


def _raster_kernel(tile_off_ref, misc_ref, *refs, tile_h: int, tile_w: int,
                   tiles_x: int, seeded: bool, peeled: bool = False,
                   accum: bool = False, tangent: bool = False):
    if peeled:
        # Depth-peeling pass (OIT): fragments must be nearer than the seed
        # depth AND strictly farther than the previous peel layer.
        (flat_ref, seed_ref, peel_ref,
         depth_ref, vis_ref, chan_ref, buf_ref, sem_ref) = refs
    elif seeded:
        (flat_ref, depth0_ref, vis0_ref, chan0_ref,
         depth_ref, vis_ref, chan_ref, buf_ref, sem_ref) = refs
    else:
        flat_ref, depth_ref, vis_ref, chan_ref, buf_ref, sem_ref = refs
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * tiles_x + tx
    # Round the tile's pair range out to whole DMA slabs. Overlap rows
    # belong to neighboring tiles and are harmless: a triangle whose bbox
    # misses this tile can cover none of its pixels (edge tests are exact),
    # and duplicate rows are idempotent under the z-max resolve.
    start = (tile_off_ref[tile] // CHUNK) * CHUNK
    end = tile_off_ref[tile + 1]
    n = end - start

    if peeled:
        depth_ref[:] = seed_ref[:]
        vis_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int32)
        chan_ref[:] = jnp.zeros((NUM_CHANNELS, tile_h, tile_w), jnp.float32)
        peel_z = peel_ref[:]
    elif seeded:
        # Phase-2 raster continues into phase-1's buffers (reference:
        # occlusion replay re-raster, CLodExtension.cpp:1474-1514).
        depth_ref[:] = depth0_ref[:]
        vis_ref[:] = vis0_ref[:]
        chan_ref[:] = chan0_ref[:]
    else:
        depth_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        vis_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int32)
        chan_ref[:] = jnp.zeros((NUM_CHANNELS, tile_h, tile_w), jnp.float32)

    # Pixel-center coordinates for this tile (computed once, reused per tri).
    # misc_ref = [tile_row0, big_count]: the shard's tile-row offset in
    # GLOBAL screen space (edge planes are always in global pixels) and the
    # live length of the global large-triangle list.
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

    tri_body = _make_tri_body(buf_ref, px, py, depth_ref, vis_ref, chan_ref,
                              peel_z if peeled else None, peeled, accum,
                              tangent=tangent)

    tx_f = tx.astype(jnp.float32)
    tyg_f = (ty + misc_ref[0]).astype(jnp.float32)

    def big_body(j, slot_base):
        # Global-list rows carry their tile bbox in float lanes 11-14: a
        # SCALAR containment test skips the whole vector evaluation for the
        # many (tile, big-tri) pairs that don't intersect — a vector
        # any-reduce here measured 3x slower; float compares (vs the old
        # packed-lane integer divmods at ~60 cycles/row) keep the row scan
        # off the critical path.
        base = slot_base + j * SETUP_LANES
        hit = ((tx_f >= buf_ref[base + 11]) & (tx_f <= buf_ref[base + 12])
               & (tyg_f >= buf_ref[base + 13])
               & (tyg_f <= buf_ref[base + 14]))

        @pl.when(hit)
        def _():
            tri_body(j, slot_base)
        return slot_base

    def walk(row0_chunks, nrows, body):
        """Double-buffer DMA + raster `nrows` pair rows from a chunk-aligned
        base. The LAST chunk's inner loop stops at the live row count
        instead of the full slab (up to 127 wasted evals per range
        otherwise — measurable when every tile walks a short big list)."""
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
            jax.lax.fori_loop(0, n_this, body, slot * SLAB)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk_body, 0)

    # This tile's own binned range, rounded to whole slabs.
    walk(start // CHUNK, n, tri_body)
    # The global large-triangle list at rows [0, max_big_tris): triangles
    # spanning more tiles than the bin slot cap are not binned per-tile;
    # every tile walks them (reference: HW-raster bucket role).
    walk(0, misc_ref[1], big_body)


def _raster_kernel_groups(tile_off_ref, misc_ref, gid_ref, big_ref,
                          bigx_ref, bigy_ref, *refs,
                          tile_h: int, tile_w: int, tiles_x: int,
                          tangent: bool = False,
                          group_rows: int, seeded: bool, peeled: bool = False,
                          accum: bool = False):
    """Group-binned raster: the pair stream is (group, tile) ids; each
    group's `group_rows` contiguous setup rows are DMA'd straight from the
    lane table (raster_setup.bin_groups — no materialized per-pair payload).
    Rows whose lane-6/7 tile bbox misses this tile are skipped with a
    scalar test before any vector work (invalid rows carry inverted boxes).
    The vector evaluation is _make_tri_body — pixel-exact parity with the
    per-triangle kernel and the jnp twin."""
    if peeled:
        (flat_ref, seed_ref, peel_ref,
         depth_ref, vis_ref, chan_ref, buf_ref, sem_ref) = refs
    elif seeded:
        (flat_ref, depth0_ref, vis0_ref, chan0_ref,
         depth_ref, vis_ref, chan_ref, buf_ref, sem_ref) = refs
    else:
        flat_ref, depth_ref, vis_ref, chan_ref, buf_ref, sem_ref = refs
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * tiles_x + tx
    start = tile_off_ref[tile]
    end = tile_off_ref[tile + 1]
    n = end - start

    if peeled:
        depth_ref[:] = seed_ref[:]
        vis_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int32)
        chan_ref[:] = jnp.zeros((NUM_CHANNELS, tile_h, tile_w), jnp.float32)
        peel_z = peel_ref[:]
    elif seeded:
        depth_ref[:] = depth0_ref[:]
        vis_ref[:] = vis0_ref[:]
        chan_ref[:] = chan0_ref[:]
    else:
        depth_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        vis_ref[:] = jnp.zeros((tile_h, tile_w), jnp.int32)
        chan_ref[:] = jnp.zeros((NUM_CHANNELS, tile_h, tile_w), jnp.float32)

    px = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          .astype(jnp.float32) + (tx * tile_w).astype(jnp.float32) + 0.5)
    py = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          .astype(jnp.float32)
          + ((ty + misc_ref[0]) * tile_h).astype(jnp.float32) + 0.5)

    # The HBM lane buffer is 1-D tiled at 1024 floats, so DMA slices must
    # be whole 32-row slabs. Bin groups SMALLER than a slab (group_rows 8 or
    # 16) still DMA their containing slab; only the row WALK narrows to the
    # subgroup — that's the point: Morton-coherent sub-windows have tighter
    # tile boxes, so far fewer dead rows are scanned per (group, tile) pair.
    slab_rows = max(32, group_rows)
    sub = slab_rows // group_rows          # subgroups per DMA slab
    GSLAB = slab_rows * SETUP_LANES        # floats per DMA slab (mult 1024)
    GROWS = group_rows * SETUP_LANES       # floats per bin group

    tri_body = _make_tri_body(buf_ref, px, py, depth_ref, vis_ref, chan_ref,
                              peel_z if peeled else None, peeled, accum,
                              tangent=tangent)

    tx_f = tx.astype(jnp.float32)
    tyg_f = (ty + misc_ref[0]).astype(jnp.float32)

    def row_body(j, slot_base):
        # Scalar per-row bbox containment: skips backfaced/invalid rows
        # (inverted boxes) and rows of this group that don't touch this
        # tile. Float lanes 11-14 — the old packed lanes 6/7 needed 4
        # integer divmods (~60 cycles/row), and the ROW SCAN, not the
        # vector evaluation, bounded the whole kernel (frame time tracked
        # rows-scanned at ~65 ns/row across tile_h {32, 16, 8}).
        base = slot_base + j * SETUP_LANES
        hit = ((tx_f >= buf_ref[base + 11]) & (tx_f <= buf_ref[base + 12])
               & (tyg_f >= buf_ref[base + 13])
               & (tyg_f <= buf_ref[base + 14]))

        @pl.when(hit)
        def _():
            tri_body(j, slot_base)
        return slot_base

    def get_dma(slot, gid):
        off = pl.multiple_of((gid // sub) * GSLAB, GSLAB)
        dst = pl.multiple_of(slot * GSLAB, GSLAB)
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(off, GSLAB)],
            buf_ref.at[pl.ds(dst, GSLAB)],
            sem_ref.at[slot],
        )

    def walk(nitems):
        """Double-buffered group-slab DMA + row walk of this tile's own
        (group, tile) pairs at gid_ref[start:start+nitems]."""

        @pl.when(nitems > 0)
        def _():
            get_dma(0, gid_ref[start]).start()

        def pair_body(p, _):
            slot = p % 2

            @pl.when(p + 1 < nitems)
            def _():
                get_dma((p + 1) % 2, gid_ref[start + p + 1]).start()

            g = gid_ref[start + p]
            get_dma(slot, g).wait()
            # Full unroll (Pallas fori_loop supports only 1 or num_steps):
            # lets the compiler pipeline row j+1's SMEM scalar loads under
            # row j's vector evaluation (measured −6% on the city frame).
            jax.lax.fori_loop(0, group_rows, row_body,
                              slot * GSLAB + (g % sub) * GROWS,
                              unroll=group_rows)
            return 0

        jax.lax.fori_loop(0, nitems, pair_body, 0)

    walk(n)

    # Global large-group list: groups spanning more tiles than the bin slot
    # cap. Every tile SCANS the list, but the slab DMA + row walk run only
    # when the group's tile box overlaps this tile — without the pre-DMA
    # box test every tile pulled every big slab (measured ~75 ms/frame on
    # the city bench vs ~1 ms with it). Hits are rare, so the DMA here is
    # synchronous (start+wait on slot 0).
    def big_body(p, _):
        bx = bigx_ref[p]
        by = bigy_ref[p]
        tyg = ty + misc_ref[0]
        hit = ((tx >= bx // 2048) & (tx <= bx % 2048)
               & (tyg >= by // 2048) & (tyg <= by % 2048))

        @pl.when(hit)
        def _():
            g = big_ref[p]
            dma = get_dma(0, g)
            dma.start()
            dma.wait()
            jax.lax.fori_loop(0, group_rows, row_body, (g % sub) * GROWS,
                              unroll=group_rows)
        return 0

    jax.lax.fori_loop(0, misc_ref[1], big_body, 0)


def raster_tiles_pallas(pairs: BinnedPairs, config: FrameConfig,
                        interpret: bool = False, init=None, peel=None,
                        tile_row0=0, accum: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused raster + attribute resolve on the padded tile grid.

    Returns (depth (H', W') f32, vis (H', W') i32,
             channels (NUM_CHANNELS, H', W') f32). `init` seeds the buffers
    with a previous raster's output (two-phase occlusion replay). `peel` =
    (seed_depth, peel_depth) runs a depth-peeling pass (OIT): keeps the
    nearest fragment that is farther than peel_depth and nearer than
    seed_depth's occlusion floor. `tile_row0` offsets the tile grid
    vertically in global screen space (screen-row sharding,
    parallel/tile_sharding.py); pairs.tile_offsets must already be the
    local slice."""
    th, tw = config.tile_h, config.tile_w
    tiles_x, tiles_y = config.tiles_x, config.tiles_y
    seeded = init is not None
    peeled = peel is not None
    grouped = isinstance(pairs, GroupBinnedPairs)
    if grouped:
        # Group mode: the lane table itself IS the payload (no pad/gather);
        # the id streams ride as scalar-prefetch operands in SMEM.
        flat = pairs.lanes.reshape(-1)
        kernel = functools.partial(
            _raster_kernel_groups, tile_h=th, tile_w=tw, tiles_x=tiles_x,
            group_rows=config.group_rows, seeded=seeded, peeled=peeled,
            accum=accum, tangent=config.enable_vertex_tangents)
        # Two DMA slabs; slabs are whole 32-row windows even when the bin
        # granularity (group_rows) is finer (1024-float HBM tiling floor).
        scratch_floats = 2 * max(32, config.group_rows) * SETUP_LANES
    else:
        # Pad by one slab so ceil-rounded chunk reads stay in bounds; padded
        # rows carry tri id 0 and never rasterize.
        flat = jnp.pad(pairs.pair_data, ((0, CHUNK), (0, 0))).reshape(-1)
        assert config.max_big_tris % CHUNK == 0, \
            "max_big_tris must be a multiple of the raster DMA slab"
        kernel = functools.partial(_raster_kernel, tile_h=th, tile_w=tw,
                                   tiles_x=tiles_x, seeded=seeded,
                                   peeled=peeled, accum=accum,
                                   tangent=config.enable_vertex_tangents)
        scratch_floats = 2 * CHUNK * SETUP_LANES
    img_spec = pl.BlockSpec((th, tw), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((NUM_CHANNELS, th, tw), lambda i, j, *_: (0, i, j),
                             memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    inputs = [flat]
    if peeled:
        in_specs += [img_spec, img_spec]
        inputs += [peel[0], peel[1]]
    elif seeded:
        in_specs += [img_spec, img_spec, chan_spec]
        inputs += [init[0], init[1], init[2]]
    misc = jnp.stack([jnp.asarray(tile_row0, jnp.int32).reshape(()),
                      pairs.big_count.astype(jnp.int32)])
    prefetch = (pairs.tile_offsets, misc)
    if grouped:
        prefetch += (pairs.group_ids, pairs.big_ids,
                     pairs.big_bx, pairs.big_by)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=[img_spec, img_spec, chan_spec],
        scratch_shapes=[
            pltpu.SMEM((scratch_floats,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, vis, channels = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y * th, tiles_x * tw), jnp.float32),
            jax.ShapeDtypeStruct((tiles_y * th, tiles_x * tw), jnp.int32),
            jax.ShapeDtypeStruct((NUM_CHANNELS, tiles_y * th, tiles_x * tw),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*prefetch, *inputs)
    return depth, vis, channels

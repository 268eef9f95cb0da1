"""Vertex transform, triangle setup, and tile binning.

TPU-native redesign of the reference's rasterization front-end. The reference
feeds visible clusters into HW mesh shaders or a compute SW rasterizer
(reference: shaders/ClusterLOD/softwareRaster.hlsl, RasterBucket* passes
CLodExtension.cpp:1580-1650). On TPU there is no rasterizer hardware and no
global atomics across cores, so the design is:

1. Vertex transform: one big MXU matmul batch (all vertices x viewproj).
2. Triangle setup: per-triangle edge-function plane + depth plane
   coefficients, computed vectorized over the whole (fixed-capacity)
   triangle buffer.
3. Tile binning: each triangle's screen bbox is expanded into (tile, tri)
   pairs with a capacity bound, sorted by tile (XLA sort ~ the reference's
   GPU ParallelSort, clodStreamingFeedbackSort.hlsl uses the same primitive),
   then per-tile ranges come from a searchsorted. Triangle setup data is
   gathered into pair order so the Pallas raster kernel reads contiguous
   rows per tile — the TPU equivalent of the reference's per-bucket
   compacted cluster lists.

Everything is fixed-shape; truncation is surfaced via `overflow` counters
(the reference's counter+capacity pattern, SURVEY.md §5).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig

# Triangle setup lane layout, row-per-triangle (P, SETUP_LANES):
# 0-2: edge0 A,B,C   (E(x,y) = A*x + B*y + C, >=0 inside)
# 3-5: edge1
# 6-8: edge2
# 9-11: depth plane  (z = A*x + B*y + C; reverse-Z, bigger = closer)
# 12: triangle id + 1 stored AS A FLOAT VALUE (ids < 2^24 are exact; Mosaic
#     has no scalar bitcast, and float ids also survive the pair gather)
# 13: inv_area2 (for barycentrics in shading)
# 14-15: reserved
SETUP_LANES = 16


class TriangleSetup(NamedTuple):
    """Per-triangle raster data (capacity T, masked by `valid`)."""
    screen_xy: jnp.ndarray     # (T, 3, 2) f32 screen-space vertex positions
    z_ndc: jnp.ndarray         # (T, 3) f32 vertex depths (reverse-Z NDC)
    inv_w: jnp.ndarray         # (T, 3) f32 1/clip.w (perspective correction)
    edges: jnp.ndarray         # (T, 3, 3) f32 edge plane coefficients
    zplane: jnp.ndarray        # (T, 3) f32 depth plane coefficients
    inv_area2: jnp.ndarray     # (T,) f32
    bbox: jnp.ndarray          # (T, 4) i32 tile-space x0,y0,x1,y1 inclusive
    valid: jnp.ndarray         # (T,) bool


def transform_vertices(positions: jnp.ndarray, vert_object: jnp.ndarray,
                       object_mats: jnp.ndarray, viewproj: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Object-space verts -> (clip (V,4), world (V,3)).

    The per-vertex model matrix gather + transform runs as a batched einsum;
    XLA fuses the gather into the pipeline. Reference analogue: the vertex
    stage of mesh.hlsl / softwareRaster.hlsl cluster vertex fetch.
    """
    mats = object_mats[vert_object]                      # (V, 4, 4) gather
    ph = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=-1)
    world_h = jnp.einsum("vij,vj->vi", mats, ph)
    clip = world_h @ viewproj.T
    return clip, world_h[:, :3]


def triangle_setup(clip: jnp.ndarray, indices: jnp.ndarray, tri_valid: jnp.ndarray,
                   config: FrameConfig) -> TriangleSetup:
    """Clip-space triangles -> screen-space edge/depth planes + tile bboxes.

    Backface culling keeps counter-clockwise-in-screen-space triangles
    (positive area with y-down), matching D3D's default front face after the
    projection flip. Near-plane handling: triangles with any w <= eps are
    rejected (guard-band reject; proper clipping is a later milestone —
    reference relies on HW clipping).
    """
    W, H = config.width, config.height
    tw, th = config.tile_w, config.tile_h
    v = clip[indices]            # (T, 3, 4)
    w = v[..., 3]
    w_ok = jnp.all(w > 1e-6, axis=-1)
    inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1.0)
    ndc = v[..., :3] * inv_w[..., None]
    # D3D viewport transform: y flips (NDC +y up -> screen y down).
    sx = (ndc[..., 0] * 0.5 + 0.5) * W
    sy = (0.5 - ndc[..., 1] * 0.5) * H
    z = ndc[..., 2]
    screen = jnp.stack([sx, sy], axis=-1)  # (T, 3, 2)

    x0, y0 = sx[:, 0], sy[:, 0]
    x1, y1 = sx[:, 1], sy[:, 1]
    x2, y2 = sx[:, 2], sy[:, 2]
    # Signed 2*area in y-down screen space. World-space CCW front faces
    # (glTF convention) project to clockwise in y-down coords => s < 0.
    s = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    front = s < -1e-12
    valid = tri_valid & w_ok & front
    # Normalize by the SIGNED area so E_i(v_i) = +1 regardless of winding —
    # the normalized edges are then exactly the barycentric weight planes.
    inv_area2 = jnp.where(front, 1.0 / jnp.where(jnp.abs(s) > 1e-12, s, 1.0), 0.0)

    # Edge functions: E_i covers the edge opposite vertex i, normalized so
    # that E_i(vertex_i) = 1 — i.e. E_i IS the barycentric weight of vertex i.
    # E0 from edge (v1 -> v2): E0(x, y) = cross(v2-v1, p-v1) (sign-fixed).
    def edge(ax, ay, bx, by):
        # plane for edge a->b with y-down CCW-front: inside = positive
        A = ay - by
        B = bx - ax
        C = ax * by - ay * bx
        return A, B, C

    e0 = edge(x1, y1, x2, y2)
    e1 = edge(x2, y2, x0, y0)
    e2 = edge(x0, y0, x1, y1)
    edges = jnp.stack([jnp.stack(e0, -1), jnp.stack(e1, -1), jnp.stack(e2, -1)], axis=1)
    # Normalize edges by area2 so they become barycentric weights directly.
    edges = edges * inv_area2[:, None, None]
    # Depth plane: z(x,y) = sum_i bary_i * z_i -> affine in (x, y).
    # z = z0*E0 + z1*E1 + z2*E2 where E_i are the normalized edges.
    zA = z[:, 0] * edges[:, 0, 0] + z[:, 1] * edges[:, 1, 0] + z[:, 2] * edges[:, 2, 0]
    zB = z[:, 0] * edges[:, 0, 1] + z[:, 1] * edges[:, 1, 1] + z[:, 2] * edges[:, 2, 1]
    zC = z[:, 0] * edges[:, 0, 2] + z[:, 1] * edges[:, 1, 2] + z[:, 2] * edges[:, 2, 2]
    zplane = jnp.stack([zA, zB, zC], axis=-1)

    # Tile-space bbox (inclusive), clamped to screen.
    bx0 = jnp.floor(jnp.min(sx, axis=1)).astype(jnp.int32)
    by0 = jnp.floor(jnp.min(sy, axis=1)).astype(jnp.int32)
    bx1 = jnp.ceil(jnp.max(sx, axis=1)).astype(jnp.int32)
    by1 = jnp.ceil(jnp.max(sy, axis=1)).astype(jnp.int32)
    offscreen = (bx1 < 0) | (by1 < 0) | (bx0 >= W) | (by0 >= H)
    valid = valid & ~offscreen
    tx0 = jnp.clip(bx0 // tw, 0, config.tiles_x - 1)
    ty0 = jnp.clip(by0 // th, 0, config.tiles_y - 1)
    tx1 = jnp.clip(bx1 // tw, 0, config.tiles_x - 1)
    ty1 = jnp.clip(by1 // th, 0, config.tiles_y - 1)
    bbox = jnp.stack([tx0, ty0, tx1, ty1], axis=-1)

    return TriangleSetup(screen, z, inv_w, edges, zplane, inv_area2, bbox, valid)


def pack_setup_lanes(setup: TriangleSetup) -> jnp.ndarray:
    """(T, SETUP_LANES) row-per-triangle raster payload (see lane layout).

    Row-major layout so the raster kernel can DMA contiguous row slabs of
    the pair-ordered buffer with a dynamic row offset (Mosaic allows dynamic
    sublane offsets; dynamic *lane* offsets would need 128-alignment)."""
    T = setup.valid.shape[0]
    tri_ids = jnp.arange(T, dtype=jnp.int32) + 1
    lanes = jnp.zeros((T, SETUP_LANES), jnp.float32)
    e = setup.edges  # (T, 3, 3) already normalized to barycentric weights
    lanes = lanes.at[:, 0:3].set(e[:, 0])
    lanes = lanes.at[:, 3:6].set(e[:, 1])
    lanes = lanes.at[:, 6:9].set(e[:, 2])
    lanes = lanes.at[:, 9:12].set(setup.zplane)
    lanes = lanes.at[:, 12].set(tri_ids.astype(jnp.float32))
    lanes = lanes.at[:, 13].set(setup.inv_area2)
    return lanes


# Pair ranges are aligned to RANGE_ALIGN rows so the Pallas raster kernel's
# chunk DMAs are always full, 128-lane-aligned slabs (Mosaic requires DMA
# slice offsets provably divisible by the lane tiling).
RANGE_ALIGN = 128


class BinnedPairs(NamedTuple):
    pair_data: jnp.ndarray     # (P_pad, SETUP_LANES) f32, pair-ordered, tile
    #                            ranges CHUNK-aligned, dead rows have id 0
    tile_offsets: jnp.ndarray  # (num_tiles + 1,) i32 row ranges per tile
    num_pairs: jnp.ndarray     # () i32 live pairs (pre-alignment)
    overflow: jnp.ndarray      # () i32 pairs dropped due to capacity


def bin_triangles(setup: TriangleSetup, config: FrameConfig) -> BinnedPairs:
    """Expand triangle tile-bboxes into sorted (tile, tri) pairs.

    The per-triangle tile span is capped at `max_tiles_per_tri`; triangles
    spanning more tiles than that contribute their first K tiles in row-major
    bbox order and count toward `overflow`. (The reference handles huge
    triangles via raster size-buckets + the HW path — our analogue, a
    big-triangle full-screen pass, lands with the cluster pipeline.)
    """
    P = config.max_pairs
    K = config.max_tiles_per_tri
    T = setup.valid.shape[0]
    tx0, ty0, tx1, ty1 = setup.bbox[:, 0], setup.bbox[:, 1], setup.bbox[:, 2], setup.bbox[:, 3]
    spanx = tx1 - tx0 + 1
    spany = ty1 - ty0 + 1
    ntiles = jnp.where(setup.valid, spanx * spany, 0)
    n_emit = jnp.minimum(ntiles, K)
    offsets = jnp.cumsum(n_emit) - n_emit          # exclusive prefix sum
    total = offsets[-1] + n_emit[-1] if T > 0 else jnp.int32(0)
    overflow = jnp.sum(ntiles - n_emit) + jnp.maximum(total - P, 0)

    num_tiles = config.num_tiles
    # Emit k-th covered tile of each triangle via K scatters.
    pair_tile = jnp.full((P,), num_tiles, jnp.int32)   # sentinel sorts last
    pair_tri = jnp.zeros((P,), jnp.int32)
    tri_idx = jnp.arange(T, dtype=jnp.int32)
    for k in range(K):
        live = (k < n_emit)
        kx = k % jnp.maximum(spanx, 1)
        ky = k // jnp.maximum(spanx, 1)
        tile = (ty0 + ky) * config.tiles_x + (tx0 + kx)
        dst = offsets + k
        ok = live & (dst < P)
        dst = jnp.where(ok, dst, P)  # out-of-range drops (scatter mode)
        pair_tile = pair_tile.at[dst].set(jnp.where(ok, tile, num_tiles), mode="drop")
        pair_tri = pair_tri.at[dst].set(tri_idx, mode="drop")

    # Sort pairs by (tile, tri) lexicographically — tri as a secondary key
    # keeps submission order within a tile, which the z-test makes
    # order-independent anyway but helps determinism.
    pair_tile, pair_tri = jax.lax.sort((pair_tile, pair_tri), num_keys=2)

    # Raw per-tile ranges from the sort.
    raw_offsets = jnp.searchsorted(
        pair_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    num_pairs = raw_offsets[-1]

    # Re-scatter into RANGE_ALIGN-aligned per-tile ranges: every tile's row
    # range starts and ends on a RANGE_ALIGN boundary so the raster kernel
    # DMAs only full slabs. Dead rows keep tri id 0.
    counts = raw_offsets[1:] - raw_offsets[:-1]
    padded = ((counts + RANGE_ALIGN - 1) // RANGE_ALIGN) * RANGE_ALIGN
    aligned_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)])
    P_pad = P + num_tiles * RANGE_ALIGN
    pair_idx = jnp.arange(P, dtype=jnp.int32)
    live = pair_tile < num_tiles
    tile_clamped = jnp.minimum(pair_tile, num_tiles - 1)
    dst = jnp.where(
        live,
        aligned_off[tile_clamped] + (pair_idx - raw_offsets[tile_clamped]),
        P_pad)

    lanes = pack_setup_lanes(setup)          # (T, SETUP_LANES)
    src_rows = lanes[pair_tri]               # (P, SETUP_LANES)
    pair_data = jnp.zeros((P_pad, SETUP_LANES), jnp.float32)
    pair_data = pair_data.at[dst].set(src_rows, mode="drop")
    return BinnedPairs(pair_data, aligned_off, num_pairs, overflow)

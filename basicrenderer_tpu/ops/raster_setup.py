"""Vertex transform, triangle setup, and tile binning.

TPU-native redesign of the reference's rasterization front-end. The reference
feeds visible clusters into HW mesh shaders or a compute SW rasterizer
(reference: shaders/ClusterLOD/softwareRaster.hlsl, RasterBucket* passes
CLodExtension.cpp:1580-1650). On TPU there is no rasterizer hardware and no
global atomics across cores, so the design is:

1. Vertex transform: batched matmuls; the per-vertex model-matrix lookup is
   a one-hot MXU matmul (measured ~50x faster than XLA's row gather on TPU).
2. Triangle setup: per-triangle *screen-space plane equations* — edge/
   barycentric planes, a depth plane, and perspective-correct attribute
   planes (attr/w and 1/w are affine in screen space). Shading interpolates
   from planes, so no per-pixel vertex gathers exist anywhere downstream.
3. Tile binning: every triangle emits K tile slots (vectorized, no scatter
   — TPU scatters serialize at ~100ns/row), one 2-key sort groups them by
   tile, and a single bounded gather materializes the pair payload. Tile
   ranges are NOT aligned; the raster kernel rounds to whole DMA slabs and
   relies on edge-function rejection + z-idempotence to make overlap reads
   harmless.

Everything is fixed-shape; truncation is surfaced via `overflow` counters
(the reference's counter+capacity pattern, SURVEY.md §5).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig

# Triangle payload lane layout, row-per-triangle (P, SETUP_LANES):
#  0-2: edge0 A,B,C   (normalized: E_i(x,y) IS the barycentric weight of v_i;
#       the raster kernels derive edge2 = 1 - edge0 - edge1)
#  3-5: edge1
#  6-8: depth plane   (z_ndc = A*x + B*y + C; reverse-Z, bigger = closer)
#  9:  triangle id + 1 AS A FLOAT (ids < 2^24 exact; Mosaic lacks scalar
#      bitcast)
#  10: material id + OBJ_COMBO * object id AS A FLOAT (combo < 2^24 exact;
#      the object id feeds per-pixel motion vectors — ops/motion.py)
#  11-14: tile bbox as SEPARATE FLOAT lanes (tx0, tx1, ty0, ty1) — the
#      kernels' per-row skip is 4 scalar float compares. The old packed
#      two-lane form needed 4 integer divmods per row (~60 scalar cycles),
#      and the ROW SCAN — not the vector evaluation — bounded the whole
#      kernel (measured: frame time tracked rows-scanned at ~65 ns/row
#      across tile_h {32, 16, 8}). Invalid rows carry inverted ranges.
#  15-17: octu/w plane (octahedral world-normal u over clip w)
#  18-20: octv/w plane
#  21-23: u/w plane
#  24-26: v/w plane
#  27: per-tri FLAT tangent theta (vertex-tangent mode)
#  28-29: unused
#  30-31: OIT per-channel optical-depth packing (ops/oit.py)
# There is NO 1/w plane: z_ndc = za + zb/w per projection, so the resolve
# derives 1/w from the depth buffer (shade.inv_w_from_depth). Normals ride
# as TWO octahedral planes, not three components — with the 1/w drop
# that's 4 attribute planes per hit row in the vector-issue-bound raster
# loop (was 6 in round 3). The DMA slab length group_rows*SETUP_LANES
# must stay a multiple of 1024.
SETUP_LANES = 32
# Lane-13 packing: combo = material + OBJ_COMBO * object. Exact in f32 while
# material < 1024 and object < 8192 (combo < 2^23).
OBJ_COMBO = 1024


class TriangleSetup(NamedTuple):
    """Per-triangle raster data (capacity T, masked by `valid`)."""
    screen_xy: jnp.ndarray     # (T, 3, 2) f32 screen-space vertex positions
    z_ndc: jnp.ndarray         # (T, 3) f32 vertex depths (reverse-Z NDC)
    inv_w: jnp.ndarray         # (T, 3) f32 1/clip.w (perspective correction)
    edges: jnp.ndarray         # (T, 3, 3) f32 barycentric weight planes
    zplane: jnp.ndarray        # (T, 3) f32 depth plane coefficients
    attr_planes: jnp.ndarray   # (T, 5, 3) f32 [1/w, octu/w, octv/w, u/w, v/w]
    inv_area2: jnp.ndarray     # (T,) f32 signed
    bbox: jnp.ndarray          # (T, 4) i32 tile-space x0,y0,x1,y1 inclusive
    valid: jnp.ndarray         # (T,) bool
    lane_cols: list            # 32 (T,) payload columns (perf path; the
    #                            rank-3 fields above exist for tests/debug)


def gather_rows_onehot(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row lookup from a SMALL table via one-hot matmul on the MXU.

    XLA's native gather serializes on TPU (~0.6ns/float); for tables with at
    most a few thousand rows a one-hot f32 matmul is far faster.
    table: (R, C), idx: (N,) -> (N, C).
    """
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
    # Precision HIGH (bf16_3x): the one-hot side is exact in bf16, and the
    # table's three 8-bit mantissa chunks reconstruct full f32 — bit-exact
    # gathers at half the MXU passes of HIGHEST (the package default).
    return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGH)


def oct_encode_cols(nx, ny, nz):
    """(T,)-column octahedral encode: unit-ish normal -> (ou, ov) in
    [-1, 1] (the wire form of the raster's normal channels; decoded per
    pixel by shade.oct_decode_cols)."""
    an = jnp.maximum(jnp.abs(nx) + jnp.abs(ny) + jnp.abs(nz), 1e-20)
    x, y = nx / an, ny / an
    fold = nz < 0.0
    xf = jnp.where(fold, (1.0 - jnp.abs(y)) * jnp.where(x >= 0, 1.0, -1.0), x)
    yf = jnp.where(fold, (1.0 - jnp.abs(x)) * jnp.where(y >= 0, 1.0, -1.0), y)
    return xf, yf


def _onb_cols(nx, ny, nz):
    """Column form of shade._onb (branchless canonical ONB) — the encode
    and decode MUST share this construction."""
    s = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    return ((1.0 + s * nx * nx * a, s * b, -s * nx),
            (b, s + ny * ny * a, -ny))


def encode_theta_cols(tx, ty, tz, w, nx, ny, nz):
    """World tangent+handedness -> the per-tri theta wire encoding
    (angle within the canonical ONB of the world normal; +4pi when
    w < 0). (T,)-column math; shade.tangent_from_theta inverts it
    per pixel."""
    nl = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * nl, ny * nl, nz * nl
    d = tx * nx + ty * ny + tz * nz
    tx, ty, tz = tx - d * nx, ty - d * ny, tz - d * nz
    t0, b0 = _onb_cols(nx, ny, nz)
    ct = tx * t0[0] + ty * t0[1] + tz * t0[2]
    st = tx * b0[0] + ty * b0[1] + tz * b0[2]
    theta = jnp.arctan2(st, ct)
    return theta + jnp.where(w < 0.0, 4.0 * jnp.pi, 0.0)


def rotate_cols_3x3(m_cols, idx, x, y, z):
    """Apply per-row 3x3s given as flattened-matrix column lists; `idx`
    maps the 9 entries into m_cols positions (row-major)."""
    ox = m_cols[idx[0]] * x + m_cols[idx[1]] * y + m_cols[idx[2]] * z
    oy = m_cols[idx[3]] * x + m_cols[idx[4]] * y + m_cols[idx[5]] * z
    oz = m_cols[idx[6]] * x + m_cols[idx[7]] * y + m_cols[idx[8]] * z
    return ox, oy, oz


def transform_geometry(positions: jnp.ndarray, normals: jnp.ndarray,
                       vert_object: jnp.ndarray, object_mats: jnp.ndarray,
                       object_normal_mats: jnp.ndarray, viewproj: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Object-space verts+normals -> (clip (V,4), world (V,3), wnormal (V,3)).

    Reference analogue: the vertex stage of mesh.hlsl / softwareRaster.hlsl
    cluster vertex fetch. Both per-vertex matrices are fetched with ONE
    one-hot MXU matmul (model 16 + normal 9 lanes) and applied as explicit
    fused multiply-adds.
    """
    O = object_mats.shape[0]
    table = jnp.concatenate(
        [object_mats.reshape(O, 16), object_normal_mats.reshape(O, 9)], axis=-1)
    rows = gather_rows_onehot(table, vert_object)        # (V, 25)
    mats = rows[:, :16].reshape(-1, 4, 4)
    nmats = rows[:, 16:25].reshape(-1, 3, 3)
    ph = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=-1)
    world_h = jnp.einsum("vij,vj->vi", mats, ph)
    wn = jnp.einsum("vij,vj->vi", nmats, normals)
    from ..utils import math3d
    clip = jnp.stack(math3d.mat4_columns(
        viewproj, world_h[:, 0], world_h[:, 1], world_h[:, 2]), axis=-1)
    return clip, world_h[:, :3], wn


def transform_vertices(positions, vert_object, object_mats, viewproj):
    """Positions-only variant (shadow passes don't need normals)."""
    O = object_mats.shape[0]
    mats = gather_rows_onehot(object_mats.reshape(O, 16), vert_object)
    mats = mats.reshape(-1, 4, 4)
    ph = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=-1)
    world_h = jnp.einsum("vij,vj->vi", mats, ph)
    from ..utils import math3d
    clip = jnp.stack(math3d.mat4_columns(
        viewproj, world_h[:, 0], world_h[:, 1], world_h[:, 2]), axis=-1)
    return clip, world_h[:, :3]


def transform_normals(normals: jnp.ndarray, vert_object: jnp.ndarray,
                      object_normal_mats: jnp.ndarray) -> jnp.ndarray:
    """Object-space normals -> world space via inverse-transpose 3x3s."""
    O = object_normal_mats.shape[0]
    nm = gather_rows_onehot(object_normal_mats.reshape(O, 9), vert_object)
    nm = nm.reshape(-1, 3, 3)
    return jnp.einsum("vij,vj->vi", nm, normals)


def vertex_world_theta(scene, world_normals: jnp.ndarray) -> jnp.ndarray:
    """(V,) per-vertex world-space tangent theta for the packed (non-clod)
    setup path: object tangents (SceneBuffers.tangents) rotated by the
    per-vertex MODEL 3x3, encoded against the world vertex normal."""
    t4 = scene.tangents
    O = scene.object_mats.shape[0]
    mrows = gather_rows_onehot(scene.object_mats.reshape(O, 16),
                               scene.vert_object)
    mc = [mrows[:, i] for i in range(16)]
    wtx, wty, wtz = rotate_cols_3x3(mc, (0, 1, 2, 4, 5, 6, 8, 9, 10),
                                    t4[:, 0], t4[:, 1], t4[:, 2])
    return encode_theta_cols(wtx, wty, wtz, t4[:, 3], world_normals[:, 0],
                             world_normals[:, 1], world_normals[:, 2])


def triangle_setup(clip: jnp.ndarray, indices: jnp.ndarray, tri_valid: jnp.ndarray,
                   config: FrameConfig,
                   world_normals: Optional[jnp.ndarray] = None,
                   uvs: Optional[jnp.ndarray] = None) -> TriangleSetup:
    """Clip-space triangles -> screen-space plane equations + tile bboxes.

    Backface culling keeps world-CCW front faces (glTF winding; they project
    to clockwise in y-down screen space => signed area < 0). Near-plane
    handling: triangles with any w <= eps are guard-band rejected (proper
    clipping is a later milestone — the reference relies on HW clipping).
    """
    W, H = config.width, config.height
    tw, th = config.tile_w, config.tile_h
    # Per-vertex data packed into (V, 9) rows, gathered ONCE PER CORNER as a
    # 2D (T, 9) gather. TPU layout rule: rank-3 intermediates like (T, 3, 9)
    # are padded to (.., 8, 128) tiles, making every op on them ~14-40x more
    # expensive; keeping everything (T,)-column shaped avoids that entirely.
    parts = [clip]
    if world_normals is not None:
        parts.append(world_normals)
    if uvs is not None:
        parts.append(uvs)
    packed = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else clip
    g0 = packed[indices[:, 0]]   # (T, 9)
    g1 = packed[indices[:, 1]]
    g2 = packed[indices[:, 2]]
    g0, g1, g2 = jax.lax.optimization_barrier((g0, g1, g2))
    return _setup_from_corners(g0, g1, g2, tri_valid, config,
                               world_normals is not None, uvs is not None)


def _setup_from_corners(g0, g1, g2, tri_valid, config: FrameConfig,
                        has_normals: bool, has_uvs: bool,
                        tangent_col=None) -> TriangleSetup:
    """Shared column math: per-corner rows g_i = [clip4 | wnormal3 | uv2]
    -> TriangleSetup. Everything stays (T,)-shaped (see layout note above)."""
    W, H = config.width, config.height
    tw, th = config.tile_w, config.tile_h
    world_normals = has_normals or None   # flags for the plane section below
    uvs = has_uvs or None

    w_c = [g0[:, 3], g1[:, 3], g2[:, 3]]
    w_ok = (w_c[0] > 1e-6) & (w_c[1] > 1e-6) & (w_c[2] > 1e-6)
    iw_c = [1.0 / jnp.where(jnp.abs(wc) > 1e-9, wc, 1.0) for wc in w_c]
    # D3D viewport transform: y flips (NDC +y up -> screen y down).
    sx_c = [(g[:, 0] * iw * 0.5 + 0.5) * W for g, iw in zip((g0, g1, g2), iw_c)]
    sy_c = [(0.5 - g[:, 1] * iw * 0.5) * H for g, iw in zip((g0, g1, g2), iw_c)]
    z_c = [g[:, 2] * iw for g, iw in zip((g0, g1, g2), iw_c)]
    sx = jnp.stack(sx_c, axis=1)
    sy = jnp.stack(sy_c, axis=1)
    z = jnp.stack(z_c, axis=1)
    inv_w = jnp.stack(iw_c, axis=1)
    screen = jnp.stack([sx, sy], axis=-1)  # (T, 3, 2)

    x0, y0 = sx_c[0], sy_c[0]
    x1, y1 = sx_c[1], sy_c[1]
    x2, y2 = sx_c[2], sy_c[2]
    # Signed 2*area in y-down screen space; world-CCW front faces => s < 0.
    # The threshold is in PIXEL^2 units: triangles below ~1e-3 px^2 are
    # degenerate slivers (e.g. duplicated seam vertices whose positions
    # differ by float noise after the fused vertex matmul) — normalizing by
    # their tiny area would produce ~1e10 plane values that stomp the depth
    # buffer across whole tiles.
    s = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    front = s < -1e-3
    valid = tri_valid & w_ok & front
    # Normalize by the SIGNED area so E_i(v_i) = +1 regardless of winding —
    # the normalized edges are then exactly the barycentric weight planes.
    inv_area2 = jnp.where(front, 1.0 / jnp.where(jnp.abs(s) > 1e-6, s, -1e-6), 0.0)

    def edge(ax, ay, bx, by):
        # Columns (A, B, C) of the edge plane a->b, normalized to barycentric.
        return ((ay - by) * inv_area2, (bx - ax) * inv_area2,
                (ax * by - ay * bx) * inv_area2)

    e0 = edge(x1, y1, x2, y2)   # barycentric weight plane of vertex 0
    e1 = edge(x2, y2, x0, y0)
    e2 = edge(x0, y0, x1, y1)

    def plane_from(v0, v1, v2):
        """Per-vertex scalars -> affine plane columns (A, B, C)."""
        return tuple(v0 * e0[c] + v1 * e1[c] + v2 * e2[c] for c in range(3))

    zplane_c = plane_from(*z_c)

    # Perspective-correct attribute planes: attr/w and 1/w are affine in
    # screen space (standard rational-linear interpolation). Normals ride
    # as OCTAHEDRAL coordinates (2 planes instead of 3): one plane fewer
    # per hit row in the vector-issue-bound raster loop. Oct-lerp across a
    # triangle is exact at the corners and within ~1e-3 inside (corner
    # normals of one smooth-shaded triangle are close); the resolve
    # re-normalizes after decode (shade.oct_decode_cols).
    plane_cols = [plane_from(*iw_c)]
    zero = jnp.zeros_like(s)
    off = 4
    if world_normals is not None:
        ocs = [oct_encode_cols(g[:, off], g[:, off + 1], g[:, off + 2])
               for g in (g0, g1, g2)]
        for c in range(2):
            plane_cols.append(plane_from(ocs[0][c] * iw_c[0],
                                         ocs[1][c] * iw_c[1],
                                         ocs[2][c] * iw_c[2]))
        off += 3
    else:
        plane_cols += [(zero, zero, zero)] * 2
    if uvs is not None:
        for c in range(2):
            plane_cols.append(plane_from(g0[:, off + c] * iw_c[0],
                                         g1[:, off + c] * iw_c[1],
                                         g2[:, off + c] * iw_c[2]))
    else:
        plane_cols += [(zero, zero, zero)] * 2

    # Tile-space bbox (inclusive), clamped to screen.
    minx = jnp.minimum(jnp.minimum(x0, x1), x2)
    miny = jnp.minimum(jnp.minimum(y0, y1), y2)
    maxx = jnp.maximum(jnp.maximum(x0, x1), x2)
    maxy = jnp.maximum(jnp.maximum(y0, y1), y2)
    bx0 = jnp.floor(minx).astype(jnp.int32)
    by0 = jnp.floor(miny).astype(jnp.int32)
    bx1 = jnp.ceil(maxx).astype(jnp.int32)
    by1 = jnp.ceil(maxy).astype(jnp.int32)
    offscreen = (bx1 < 0) | (by1 < 0) | (bx0 >= W) | (by0 >= H)
    valid = valid & ~offscreen
    tx0 = jnp.clip(bx0 // tw, 0, config.tiles_x - 1)
    ty0 = jnp.clip(by0 // th, 0, config.tiles_y - 1)
    tx1 = jnp.clip(bx1 // tw, 0, config.tiles_x - 1)
    ty1 = jnp.clip(by1 // th, 0, config.tiles_y - 1)
    bbox = jnp.stack([tx0, ty0, tx1, ty1], axis=-1)

    edges = jnp.stack([jnp.stack(e, -1) for e in (e0, e1, e2)], axis=1)
    zplane = jnp.stack(zplane_c, axis=-1)
    attr_planes = jnp.stack([jnp.stack(p, -1) for p in plane_cols], axis=1)
    return TriangleSetup(screen, z, inv_w, edges, zplane, attr_planes,
                         inv_area2, bbox, valid,
                         _lane_columns(e0, e1, zplane_c, plane_cols, valid,
                                       tx0, ty0, tx1, ty1,
                                       tangent_col=tangent_col))


def _lane_columns(e0, e1, zplane_c, plane_cols, valid, tx0, ty0, tx1, ty1,
                  tangent_col=None):
    """The 32 payload columns in lane order (ids/material filled by pack).
    Lanes 11-14 carry the tile bbox as floats (see layout above); the
    kernels derive edge2 from the barycentric identity."""
    T = valid.shape[0]
    # Invalid rows are masked IN the table (id 0 + inverted bbox): the
    # group-binned raster kernel reads raw lane rows (no per-pair gather),
    # so its scalar bbox skip and the id>0.5 gate must reject dead rows
    # without ever seeing their garbage planes.
    tri_ids = jnp.where(valid,
                        (jnp.arange(T, dtype=jnp.int32) + 1).astype(
                            jnp.float32), 0.0)
    cols = list(e0) + list(e1)
    cols += list(zplane_c)                    # lanes 6-8
    cols.append(tri_ids)                      # lane 9
    cols.append(jnp.zeros((T,), jnp.float32))  # lane 10 (material, pack fills)
    # Lanes 11-14: float bbox for the kernels' scalar row skip. Invalid
    # rows: empty range on both axes.
    cols.append(jnp.where(valid, tx0.astype(jnp.float32), 4096.0))
    cols.append(jnp.where(valid, tx1.astype(jnp.float32), -1.0))
    cols.append(jnp.where(valid, ty0.astype(jnp.float32), 4096.0))
    cols.append(jnp.where(valid, ty1.astype(jnp.float32), -1.0))
    # The 4 attribute planes — lanes 15-26: [octu/w, octv/w, u/w, v/w]
    # (1/w is derived from depth at resolve, so the iw plane —
    # plane_cols[0] — is NOT shipped; normals are 2 octahedral planes).
    for p in plane_cols[1:]:
        cols.extend(p)
    # Lane 27: per-tri FLAT mikktspace tangent theta when vertex tangents
    # are on (framedata.SceneBuffers.cluster_tangents); the OIT path
    # packs lanes 30/31 with its optical depths (ops/oit.py).
    if tangent_col is not None:
        cols.append(jnp.where(valid, tangent_col, 0.0))
    else:
        cols.append(jnp.zeros((T,), jnp.float32))  # lane 27 (unused)
    z = jnp.zeros((T,), jnp.float32)
    cols += [z, z, z, z]                       # lanes 28-31 (28/29 unused;
    #                                            30/31 = OIT optical depth)
    return cols


def pack_setup_lanes(setup: TriangleSetup,
                     tri_material: Optional[jnp.ndarray] = None,
                     tri_object: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(T, SETUP_LANES) row-per-triangle raster payload (see lane layout).
    With `tri_object`, lane 10 carries the material+object combo (decoded in
    shade.gbuffer_from_channels; the object id drives motion vectors)."""
    cols = list(setup.lane_cols)
    if tri_material is not None:
        mat = tri_material.astype(jnp.float32)
        if tri_object is not None:
            mat = mat + OBJ_COMBO * jnp.maximum(tri_object, 0).astype(
                jnp.float32)
        cols[10] = mat
    return jnp.stack(cols, axis=1)


def clip_near_tris(g0: jnp.ndarray, g1: jnp.ndarray, g2: jnp.ndarray,
                   tri_valid: jnp.ndarray, cap: int, eps: float = 1e-3):
    """Clip triangles crossing the w = eps plane (camera plane) into up to
    2 output triangles each, within a fixed budget.

    Replaces the guard-band rejection for near geometry (reference gets
    near clipping from fixed-function hardware; the old TPU path simply
    dropped any triangle with a vertex at w <= eps — close-up floors and
    walls holed out, VERDICT round-2 weak-4).

    g0/g1/g2: (T, L) corner rows [clip4 | attrs...] (attributes are lerped
    in homogeneous space, like the HW clipper). Returns
    (h0, h1, h2 (2*cap, L), extra_valid (2*cap,), src (cap,) i32 source
    triangle ids, overflow () i32).
    """
    T, L = g0.shape
    w0, w1, w2 = g0[:, 3], g1[:, 3], g2[:, 3]
    ins = jnp.stack([w0 > eps, w1 > eps, w2 > eps], axis=1)     # (T, 3)
    n_in = jnp.sum(ins, axis=1)
    crossing = tri_valid & (n_in >= 1) & (n_in <= 2)
    key = jnp.where(crossing, jnp.arange(T, dtype=jnp.int32), T)
    sel = jax.lax.sort(key)
    if cap <= T:
        sel = sel[:cap]
    else:
        sel = jnp.pad(sel, (0, cap - T), constant_values=T)
    overflow = jnp.maximum(jnp.sum(crossing) - cap, 0)
    live = sel < T
    src = jnp.minimum(sel, T - 1)

    stack = jnp.stack([g0[src], g1[src], g2[src]], axis=1)      # (cap, 3, L)
    ia = ins[src]                                               # (cap, 3)
    two_in = jnp.sum(ia, axis=1) == 2
    in_pos = jnp.argmax(ia, axis=1)
    out_pos = jnp.argmin(ia, axis=1)
    # Rotate corners so the canonical layout holds: 2-inside -> outside
    # vertex at slot 2; 1-inside -> inside vertex at slot 0. Winding is
    # preserved (cyclic rotation).
    k = jnp.where(two_in, (out_pos + 1) % 3, in_pos)
    idx = (k[:, None] + jnp.arange(3, dtype=jnp.int32)[None]) % 3
    rot = jnp.take_along_axis(stack, idx[:, :, None], axis=1)
    A, B, C = rot[:, 0], rot[:, 1], rot[:, 2]

    def lerp(u, v):
        """Intersection of segment u->v with the w = eps plane."""
        wu, wv = u[:, 3], v[:, 3]
        t = (eps - wu) / jnp.where(jnp.abs(wv - wu) > 1e-12, wv - wu, 1.0)
        t = jnp.clip(t, 0.0, 1.0)[:, None]
        return u + t * (v - u)

    i_bc = lerp(B, C)       # two-inside case
    i_ca = lerp(C, A)       # shared: C->A crossing (both cases)
    i_ab = lerp(A, B)       # one-inside case

    # First output triangle: (A, B, i_bc) when 2-in else (A, i_ab, i_ca).
    t1_1 = jnp.where(two_in[:, None], B, i_ab)
    t1_2 = jnp.where(two_in[:, None], i_bc, i_ca)
    # Second output triangle (only 2-in): (A, i_bc, i_ca).
    h0 = jnp.concatenate([A, A], axis=0)
    h1 = jnp.concatenate([t1_1, i_bc], axis=0)
    h2 = jnp.concatenate([t1_2, i_ca], axis=0)
    extra_valid = jnp.concatenate([live, live & two_in], axis=0)
    return h0, h1, h2, extra_valid, src, overflow


def _append_clipped(lanes, bbox, valid, gs, tri_valid, config: FrameConfig,
                    tri_material, tri_object, has_normals: bool,
                    has_uvs: bool):
    """Run the near-plane clip stage and append its output triangles to the
    packed lane rows. Returns (lanes, bbox, valid, clip_overflow)."""
    cap = config.near_clip_tris
    h0, h1, h2, ev, src, ovf = clip_near_tris(gs[0], gs[1], gs[2],
                                              tri_valid, cap)
    setup = _setup_from_corners(h0, h1, h2, ev, config,
                                has_normals=has_normals, has_uvs=has_uvs)
    mat = None if tri_material is None else jnp.tile(tri_material[src], 2)
    obj = None if tri_object is None else jnp.tile(tri_object[src], 2)
    elanes = pack_setup_lanes(setup, mat, obj)
    # Clipped rows keep their own tri ids? No: _setup_from_corners numbers
    # rows locally — offset ids so the visibility buffer stays unique. Ids
    # only need uniqueness + nonzero (resolve matches vis == id).
    T = valid.shape[0]
    elanes = elanes.at[:, 9].set(
        jnp.where(ev, elanes[:, 9] + T, 0.0))
    lanes = jnp.concatenate([lanes, elanes], axis=0)
    bbox = jnp.concatenate([bbox, setup.bbox], axis=0)
    valid = jnp.concatenate([valid, setup.valid], axis=0)
    return lanes, bbox, valid, ovf


def triangle_setup_compacted(vertex_table: jnp.ndarray, object_mats: jnp.ndarray,
                             object_normal_mats: jnp.ndarray,
                             viewproj: jnp.ndarray, indices: jnp.ndarray,
                             tri_valid: jnp.ndarray, config: FrameConfig,
                             tri_material: Optional[jnp.ndarray] = None,
                             tri_object: Optional[jnp.ndarray] = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Setup for the virtualized-geometry path: gathers ONLY the compacted
    visible triangles' corners from the static vertex table and transforms
    them in-register — every per-vertex cost scales with the visible budget,
    not the LOD soup (the whole point of cluster culling; reference:
    softwareRaster.hlsl fetches cluster-local vertices the same way).

    vertex_table: (V, 10) static [pos3, nrm3, uv2, objid, pad]. `tri_object`
    overrides the vertex-lane object id (cluster instancing: instances share
    vertex data; the owning object comes from the cluster row).
    Returns (lanes, bbox, valid) like triangle_setup_packed.
    """
    O = object_mats.shape[0]
    mat_table = jnp.concatenate(
        [object_mats.reshape(O, 16), object_normal_mats.reshape(O, 9)], axis=-1)

    gs = []
    for corner in range(3):
        raw = vertex_table[indices[:, corner]]            # (Kt, 10)
        raw = jax.lax.optimization_barrier(raw)
        if tri_object is not None:
            objid = tri_object
        else:
            objid = raw[:, 9].astype(jnp.int32)
        gs.append(_transform_corner_rows(raw, objid, mat_table, viewproj))

    setup = _setup_from_corners(gs[0], gs[1], gs[2], tri_valid, config,
                                has_normals=True, has_uvs=True)
    lanes = pack_setup_lanes(setup, tri_material, tri_object)
    lanes, bbox, valid = lanes, setup.bbox, setup.valid
    ovf = jnp.int32(0)
    if config.near_clip_tris > 0:
        lanes, bbox, valid, ovf = _append_clipped(
            lanes, bbox, valid, gs, tri_valid, config, tri_material,
            tri_object, True, True)
    return jax.lax.optimization_barrier((lanes, bbox, valid)) + (ovf,)


def _transform_corner_cols(px, py, pz, nx0, ny0, nz0, u, v, objid,
                           mat_table, viewproj, m_cols=None):
    """Object-space corner columns + per-tri object ids -> g rows
    [clip4 | wnormal3 | uv2] (all column math, one one-hot MXU matrix
    lookup). `m_cols` (25 x (Kt,) columns) skips the per-row lookup when
    the caller already fetched matrices at a coarser granularity (the
    clustered path fetches per SLOT — 128x fewer one-hot rows)."""
    if m_cols is None:
        mm = gather_rows_onehot(mat_table, objid)      # (Kt, 25) MXU
        m = [mm[:, i] for i in range(25)]
    else:
        m = m_cols
    # world = M @ [p, 1] (column math; no rank-3 intermediates)
    wx = m[0] * px + m[1] * py + m[2] * pz + m[3]
    wy = m[4] * px + m[5] * py + m[6] * pz + m[7]
    wz = m[8] * px + m[9] * py + m[10] * pz + m[11]
    vp = viewproj
    cx = vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3]
    cy = vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3]
    cz = vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3]
    cw = vp[3, 0] * wx + vp[3, 1] * wy + vp[3, 2] * wz + vp[3, 3]
    nx = m[16] * nx0 + m[17] * ny0 + m[18] * nz0
    ny = m[19] * nx0 + m[20] * ny0 + m[21] * nz0
    nz = m[22] * nx0 + m[23] * ny0 + m[24] * nz0
    return jnp.stack([cx, cy, cz, cw, nx, ny, nz, u, v], axis=1)


def _transform_corner_rows(raw, objid, mat_table, viewproj):
    """Raw corner rows [pos3, nrm3, uv2, ...] -> g rows (column form)."""
    return _transform_corner_cols(
        raw[:, 0], raw[:, 1], raw[:, 2], raw[:, 3], raw[:, 4], raw[:, 5],
        raw[:, 6], raw[:, 7], objid, mat_table, viewproj)


def _dequantized_corner_cols(q6, dq, meshlet_tris):
    """Quantized corner value columns (6 x (Kt,)) [px16, py16, pz16, oct16,
    uh16, vh16] + per-cluster dequant rows (Kc, 8) -> object-space columns
    (px, py, pz, nx, ny, nz, u, v). All 16-bit VALUES are f32-exact, so
    the one-hot extraction einsum upstream is lossless; this is the only
    place quantization is undone (models/pageblob.py layout)."""
    def rep(col):
        return jnp.repeat(col, meshlet_tris)          # (Kc,) -> (Kt,)
    inv = 1.0 / 65535.0
    px = rep(dq[:, 0]) + q6[0] * (rep(dq[:, 3]) * inv)
    py = rep(dq[:, 1]) + q6[1] * (rep(dq[:, 4]) * inv)
    pz = rep(dq[:, 2]) + q6[2] * (rep(dq[:, 5]) * inv)
    # Octahedral normal decode (2 x u8 in one 16-bit value).
    o = q6[3].astype(jnp.int32)
    a = (o & 255).astype(jnp.float32) * (2.0 / 255.0) - 1.0
    b = (o >> 8).astype(jnp.float32) * (2.0 / 255.0) - 1.0
    z = 1.0 - jnp.abs(a) - jnp.abs(b)
    t = jnp.clip(-z, 0.0, 1.0)
    x = a + jnp.where(a >= 0, -t, t)
    y = b + jnp.where(b >= 0, -t, t)
    rl = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    # Half-float UVs: value -> u16 bits -> f16.
    u = jax.lax.bitcast_convert_type(
        q6[4].astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    v = jax.lax.bitcast_convert_type(
        q6[5].astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    return px, py, pz, x * rl, y * rl, z * rl, u, v


def setup_from_compacted(scene, comp, viewproj: jnp.ndarray,
                         config: FrameConfig):
    """Dispatch: cluster-page setup normally; the global vertex-table path
    when skinning is on (apply_skinning rewrites vertex_table, and the
    static slabs would be stale)."""
    if config.enable_skinning:
        return triangle_setup_compacted(
            scene.vertex_table, scene.object_mats, scene.object_normal_mats,
            viewproj, comp.indices, comp.valid, config, comp.material,
            comp.object)
    return triangle_setup_clustered(scene, comp, viewproj, config)


def triangle_setup_clustered(scene, comp, viewproj: jnp.ndarray,
                             config: FrameConfig
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Setup from cluster-local vertex pages (the fast virtualized-geometry
    path; reference: cluster-local vertex fetch in softwareRaster.hlsl).

    `comp` is a clod.CompactedTris. Per visible cluster slot this fetches
    the geometry cluster's vertex slab as ONE wide gathered row. Pages are
    CORNER-MAJOR (bridge.pack_geometry: row j = corner*128 + tri), so the
    per-corner values are contiguous lane slices of the unpacked planes —
    no indirection at all. (History: per-vertex pages + a one-hot MXU
    corner-extraction einsum cost ~2.1 ms/frame at city scale; per-corner
    (V, 10)-row gathers before that cost ~33 ns/row.)
    Returns (lanes, bbox, valid) like triangle_setup_packed.
    """
    from ..models.clusters import MESHLET_TRIS, SLAB_VERTS
    O = scene.object_mats.shape[0]
    mat_table = jnp.concatenate(
        [scene.object_mats.reshape(O, 16),
         scene.object_normal_mats.reshape(O, 9)], axis=-1)
    # Translate geometry-page ids through the streaming slot table
    # (identity when fully resident; non-resident pages are never in the
    # cut, so the clip only ever rewrites dead slots).
    G = scene.geom_slot.shape[0]
    slots = scene.geom_slot[jnp.clip(comp.geom, 0, G - 1)]
    gids = jnp.clip(slots, 0, scene.cluster_verts.shape[0] - 1)
    slabs = scene.cluster_verts[gids]                  # (Kc, SLAB*3) u32
    dq = scene.cluster_dequant[gids]                   # (Kc, 8) f32
    Kc = gids.shape[0]
    # Quantized planar unpack (models/pageblob.py): three contiguous
    # SLAB-lane u32 blocks, each holding two 16-bit values. The unpacked
    # VALUES (<= 65535) are f32-exact; dequantization runs AFTER corner
    # slicing on (Kt,) columns (_dequantized_corner_cols).
    w0 = slabs[:, 0:SLAB_VERTS]
    w1 = slabs[:, SLAB_VERTS:2 * SLAB_VERTS]
    w2 = slabs[:, 2 * SLAB_VERTS:3 * SLAB_VERTS]
    corners = jnp.stack(
        [w0 & 0xFFFF, w0 >> 16, w1 & 0xFFFF, w1 >> 16,
         w2 & 0xFFFF, w2 >> 16], axis=1).astype(jnp.float32)  # (Kc, 6, S)
    # Per-slot matrix fetch (Kc one-hot rows instead of Kc*128): expand to
    # per-triangle COLUMNS (materializing a (Kt, 25) row table would pad
    # 25 -> 128 lanes).
    m_slot = gather_rows_onehot(mat_table, comp.slot_object)   # (Kc, 25)
    m_cols = [jnp.repeat(m_slot[:, i], MESHLET_TRIS) for i in range(25)]
    M = MESHLET_TRIS

    def corner_cols(c):
        q6 = [corners[:, d, c * M:(c + 1) * M].reshape(-1) for d in range(6)]
        return _dequantized_corner_cols(q6, dq, M)

    gs = [_transform_corner_cols(
        *corner_cols(c), comp.object, mat_table, viewproj, m_cols=m_cols)
        for c in range(3)]
    tri_ok = comp.valid
    extra = None
    ovf = jnp.int32(0)
    if config.enable_reyes and config.reyes_tris > 0:
        # Reyes micro-tessellation (ops/reyes.py): diced parents leave the
        # main stream; micro rows append after the main pack.
        from . import reyes as reyes_ops
        elanes, ebbox, evalid, keep, r_ovf = reyes_ops.dice_reyes(
            gs, comp.valid, comp, scene, viewproj, config,
            id_base=comp.valid.shape[0])
        tri_ok = comp.valid & keep
        extra = (elanes, ebbox, evalid)
        ovf = ovf + r_ovf
    tangent_col = None
    if config.enable_vertex_tangents:
        # Per-tri FLAT mikktspace tangent (lane 30; decoded at resolve by
        # shade.tangent_from_theta): fetch the corner-0 OBJECT tangent
        # rows with the same slot gather order as the vertex slabs, rotate
        # to world with the MODEL 3x3 (tangents are covariant), and encode
        # theta against the corner-0 WORLD normal — baking an object-space
        # angle would break under instance rotation (ONB(Rn) != R ONB(n)).
        # Streaming note: cluster_tangents is the resident table; the pool
        # slabs don't carry tangents, so the feature needs full residency.
        G2 = scene.cluster_tangents.shape[0]
        trows = scene.cluster_tangents[jnp.clip(gids, 0, G2 - 1)]
        M_ = MESHLET_TRIS
        otx = trows[:, 0:M_].reshape(-1)
        oty = trows[:, M_:2 * M_].reshape(-1)
        otz = trows[:, 2 * M_:3 * M_].reshape(-1)
        otw = trows[:, 3 * M_:4 * M_].reshape(-1)
        wtx, wty, wtz = rotate_cols_3x3(
            m_cols, (0, 1, 2, 4, 5, 6, 8, 9, 10), otx, oty, otz)
        wn = gs[0]                      # corner-0 rows [clip4 | wn3 | uv2]
        tangent_col = encode_theta_cols(wtx, wty, wtz, otw,
                                        wn[:, 4], wn[:, 5], wn[:, 6])
    setup = _setup_from_corners(gs[0], gs[1], gs[2], tri_ok, config,
                                has_normals=True, has_uvs=True,
                                tangent_col=tangent_col)
    lanes = pack_setup_lanes(setup, comp.material, comp.object)
    lanes, bbox, valid = lanes, setup.bbox, setup.valid
    if extra is not None:
        lanes = jnp.concatenate([lanes, extra[0]], axis=0)
        bbox = jnp.concatenate([bbox, extra[1]], axis=0)
        valid = jnp.concatenate([valid, extra[2]], axis=0)
    if config.near_clip_tris > 0:
        lanes, bbox, valid, clip_ovf = _append_clipped(
            lanes, bbox, valid, gs, tri_ok, config, comp.material,
            comp.object, True, True)
        ovf = ovf + clip_ovf
    return jax.lax.optimization_barrier((lanes, bbox, valid)) + (ovf,)


def triangle_setup_packed(clip: jnp.ndarray, indices: jnp.ndarray,
                          tri_valid: jnp.ndarray, config: FrameConfig,
                          world_normals: jnp.ndarray, uvs: jnp.ndarray,
                          tri_material: Optional[jnp.ndarray] = None,
                          tri_object: Optional[jnp.ndarray] = None,
                          vertex_theta: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Production setup: returns ONLY 2D arrays (lanes (T, SETUP_LANES),
    bbox (T, 4) i32, valid (T,) bool). `vertex_theta` (V,) rides the
    corner row gather and lands as the per-tri FLAT tangent lane (30).

    TPU layout note: every materialized array pads its minor two dims to
    (8, 128), so rank-3 intermediates like (T, 3, 3) blow up ~40x in HBM and
    ops on them waste 97% of the VPU lanes. The whole setup computes in
    (T,)-column form; only the flat lane rows are written.
    """
    parts = [clip]
    if world_normals is not None:
        parts.append(world_normals)
    if uvs is not None:
        parts.append(uvs)
    use_tangent = (config.enable_vertex_tangents
                   and vertex_theta is not None)
    if use_tangent:
        parts.append(vertex_theta[:, None])
    packed = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else clip
    g0 = packed[indices[:, 0]]
    g1 = packed[indices[:, 1]]
    g2 = packed[indices[:, 2]]
    g0, g1, g2 = jax.lax.optimization_barrier((g0, g1, g2))
    tangent_col = g0[:, -1] if use_tangent else None
    if use_tangent:
        g0, g1, g2 = g0[:, :-1], g1[:, :-1], g2[:, :-1]
    setup = _setup_from_corners(g0, g1, g2, tri_valid, config,
                                world_normals is not None, uvs is not None,
                                tangent_col=tangent_col)
    lanes = pack_setup_lanes(setup, tri_material, tri_object)
    lanes, bbox, valid = lanes, setup.bbox, setup.valid
    ovf = jnp.int32(0)
    if config.near_clip_tris > 0:
        lanes, bbox, valid, ovf = _append_clipped(
            lanes, bbox, valid, (g0, g1, g2), tri_valid, config,
            tri_material, tri_object, world_normals is not None,
            uvs is not None)
    # Barrier the 2D results only — cheap to materialize, and it stops XLA
    # from re-running the vertex gather inside every downstream fusion.
    lanes, bbox, valid = jax.lax.optimization_barrier((lanes, bbox, valid))
    return lanes, bbox, valid, ovf


class BinnedPairs(NamedTuple):
    pair_data: jnp.ndarray     # (Bcap + smalls, SETUP_LANES) f32: rows
    #                            [0, Bcap=max_big_tris) are the global
    #                            large-triangle list (walked by EVERY tile);
    #                            the per-tile binned rows follow. Rows past
    #                            a live range carry tri id 0.
    tile_offsets: jnp.ndarray  # (num_tiles + 1,) i32 row ranges per tile
    #                            (already offset by Bcap)
    num_pairs: jnp.ndarray     # () i32 live binned pairs
    overflow: jnp.ndarray      # () i32 pairs/big-tris dropped (capacity)
    big_count: jnp.ndarray     # () i32 live rows in the big-triangle list


def bin_pairs(lanes: jnp.ndarray, bbox: jnp.ndarray, valid: jnp.ndarray,
              config: FrameConfig) -> BinnedPairs:
    """Sort-based tile binning (scatter-free) over packed lane rows.

    Every triangle owns K = max_tiles_per_tri implicit slots; slot k holds
    the k-th tile of its bbox span in row-major order, or a sentinel. One
    2-key sort groups live pairs by tile. Triangles spanning MORE than K
    tiles go to a separate global list of capacity max_big_tris that every
    tile's raster loop also walks — the analogue of the reference's
    HW-raster bucket for large clusters (RasterBucket* passes,
    CLodExtension.cpp:1580-1650); ortho shadow views make even ground quads
    span the whole grid, so this path is load-bearing, not a corner case.
    Capacity misses on either list count toward `overflow`.
    """
    P = config.max_pairs
    K = config.max_tiles_per_tri
    Bcap = config.max_big_tris
    T = valid.shape[0]
    num_tiles = config.num_tiles

    tx0, ty0, tx1, ty1 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    spanx = tx1 - tx0 + 1
    spany = ty1 - ty0 + 1
    ntiles = jnp.where(valid, spanx * spany, 0)
    big = ntiles > K                                     # large-triangle path
    ntiles_small = jnp.where(big, 0, ntiles)

    ks = jnp.arange(K, dtype=jnp.int32)[None, :]         # (1, K)
    # ks // spanx via f32 reciprocal: integer div by a VARIABLE is a
    # multi-instruction VPU sequence (~4 ms/frame over (T, K) at city
    # scale). (ks + 0.5) * (1/spanx) floors to exactly ks // spanx for
    # ks < K <= 8 (margin 0.5/spanx >= 1/16 dwarfs f32 rounding); slots of
    # big/invalid triangles are dead (live_kt false) so huge spans only
    # need to stay finite.
    inv_spanx = 1.0 / jnp.maximum(spanx, 1).astype(jnp.float32)[:, None]
    ky = jnp.floor((ks.astype(jnp.float32) + 0.5) * inv_spanx).astype(jnp.int32)
    kx = ks - ky * jnp.maximum(spanx, 1)[:, None]
    tile_kt = (ty0[:, None] + ky) * config.tiles_x + (tx0[:, None] + kx)
    live_kt = ks < ntiles_small[:, None]
    tile_kt = jnp.where(live_kt, tile_kt, num_tiles)     # sentinel sorts last
    tri_kt = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None], (T, K))

    flat_tile = tile_kt.reshape(-1)
    flat_tri = tri_kt.reshape(-1)
    # Single fused int32 key (tile * slots + slot) sorts ~2x faster than a
    # 2-key lexicographic sort; the slot encodes the triangle (slot // K).
    slots = T * K
    if (num_tiles + 1) * slots < 2**31:
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (T, K), 0) * K \
            + jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
        key = flat_tile * slots + slot_ids.reshape(-1)
        key = jax.lax.sort(key)
        flat_tile = key // slots
        flat_tri = (key % slots) // K
    else:
        flat_tile, flat_tri = jax.lax.sort((flat_tile, flat_tri), num_keys=2)
    flat_tile, flat_tri = jax.lax.optimization_barrier((flat_tile, flat_tri))

    total = jnp.sum(ntiles_small)
    big_total = jnp.sum(big)
    overflow = jnp.maximum(total - P, 0) + jnp.maximum(big_total - Bcap, 0)

    # Keep the first P sorted pairs (all live pairs sort before sentinels).
    flat_tile = flat_tile[:P]
    flat_tri = flat_tri[:P]
    tile_offsets = jnp.searchsorted(flat_tile,
                                    jnp.arange(num_tiles + 1, dtype=jnp.int32))
    # The big-triangle list occupies rows [0, Bcap); binned rows follow.
    tile_offsets = (jnp.minimum(tile_offsets, P) + Bcap).astype(jnp.int32)
    num_pairs = jnp.minimum(total, P)

    # Sentinel rows must never rasterize: route them through a zero row
    # appended at index T (fused into the gather index — a separate
    # .at[:, 12].set pass re-copies the whole (P, 32) array, ~2 ms/frame).
    live = flat_tile < num_tiles
    lanes_z = jnp.concatenate(
        [lanes, jnp.zeros((1, lanes.shape[1]), lanes.dtype)], axis=0)
    pair_data = lanes_z[jnp.where(live, flat_tri, T)]    # (<=P, SETUP_LANES)

    # Global big-triangle list: sort big-tri indices to the front, keep Bcap.
    big_key = jnp.where(big, jnp.arange(T, dtype=jnp.int32), T)
    big_key = jax.lax.sort(big_key)[:Bcap]
    if Bcap > T:
        big_key = jnp.pad(big_key, (0, Bcap - T), constant_values=T)
    big_rows = lanes_z[big_key]                          # (Bcap, SETUP_LANES)
    big_count = jnp.minimum(big_total, Bcap).astype(jnp.int32)

    pair_data = jnp.concatenate([big_rows, pair_data], axis=0)
    return BinnedPairs(pair_data, tile_offsets, num_pairs, overflow, big_count)


def bin_triangles(setup: TriangleSetup, config: FrameConfig,
                  tri_material: Optional[jnp.ndarray] = None) -> BinnedPairs:
    """Compat/test wrapper: bin from an unpacked TriangleSetup."""
    lanes = pack_setup_lanes(setup, tri_material)
    return bin_pairs(lanes, setup.bbox, setup.valid, config)


class GroupBinnedPairs(NamedTuple):
    """Group-granular bin output (clustered paths; config.group_binning).

    Pairs are (GR-row group, tile): the raster kernel DMAs each group's
    contiguous rows straight out of `lanes`, so there is NO materialized
    per-pair payload — binning shrinks from a (T*K)-key sort + (P, 32) row
    gather (~10 ms/frame at city scale) to a (T/GR*K)-key sort over group
    ids. Groups are sub-cluster row windows (Morton-ordered cluster tris
    are spatially coherent, so a 32-row window has a tight tile bbox).
    """
    lanes: jnp.ndarray         # (T, SETUP_LANES) f32 raw setup rows (HBM)
    group_ids: jnp.ndarray     # (Pc,) i32 group ids sorted by tile
    tile_offsets: jnp.ndarray  # (num_tiles + 1,) i32 pair ranges per tile
    num_pairs: jnp.ndarray     # () i32 live (group, tile) pairs
    overflow: jnp.ndarray      # () i32 pairs/big groups dropped (capacity)
    big_ids: jnp.ndarray       # (Bg,) i32 global large-group list
    big_count: jnp.ndarray     # () i32 live rows in big_ids
    big_bx: jnp.ndarray        # (Bg,) i32 group tile bbox tx0*2048+tx1 —
    #                            the kernel box-tests each big entry per
    #                            tile BEFORE the slab DMA (without this,
    #                            every tile DMA'd every big slab: measured
    #                            ~75 ms/frame on the city bench)
    big_by: jnp.ndarray        # (Bg,) i32 ty0*2048+ty1


def bin_groups(lanes: jnp.ndarray, bbox: jnp.ndarray, valid: jnp.ndarray,
               config: FrameConfig) -> GroupBinnedPairs:
    """Bin GR-row groups of consecutive setup rows to tiles.

    Same sort-based scatter-free scheme as bin_pairs, over T/GR groups
    instead of T triangles. A group's bbox is the union of its valid rows'
    tile bboxes; groups spanning more than max_tiles_per_group tiles go to
    the global list every tile walks (the HW-raster bucket analogue —
    reference: RasterBucket* passes, CLodExtension.cpp:1580-1650). Invalid
    rows were masked in the lane table itself (_lane_columns: id 0 +
    inverted bbox), so the kernel's scalar skip rejects them.

    CONTRACT: `valid` must be the SAME validity that was baked into
    `lanes` at setup time — the kernels derive row rejection from the lane
    table, so extra caller-side masking (e.g. the soup path's per-phase
    object-occlusion masks) silently would NOT apply. Such paths must use
    bin_pairs.
    """
    GR = config.group_rows
    T = valid.shape[0]
    assert T % GR == 0, (T, GR)
    NG = T // GR
    Kg = config.max_tiles_per_group
    Pc = config.max_group_pairs
    Bg = config.max_big_groups
    num_tiles = config.num_tiles

    huge = jnp.int32(1 << 20)
    vx0 = jnp.where(valid, bbox[:, 0], huge).reshape(NG, GR).min(axis=1)
    vy0 = jnp.where(valid, bbox[:, 1], huge).reshape(NG, GR).min(axis=1)
    vx1 = jnp.where(valid, bbox[:, 2], -huge).reshape(NG, GR).max(axis=1)
    vy1 = jnp.where(valid, bbox[:, 3], -huge).reshape(NG, GR).max(axis=1)
    gvalid = jnp.any(valid.reshape(NG, GR), axis=1)

    spanx = vx1 - vx0 + 1
    spany = vy1 - vy0 + 1
    ntiles = jnp.where(gvalid, spanx * spany, 0)
    big = ntiles > Kg
    ntiles_small = jnp.where(big, 0, ntiles)

    ks = jnp.arange(Kg, dtype=jnp.int32)[None, :]
    # f32-reciprocal integer div (see bin_pairs): exact for ks < Kg <= 16.
    inv_spanx = 1.0 / jnp.maximum(spanx, 1).astype(jnp.float32)[:, None]
    ky = jnp.floor((ks.astype(jnp.float32) + 0.5) * inv_spanx).astype(
        jnp.int32)
    kx = ks - ky * jnp.maximum(spanx, 1)[:, None]
    tile_kg = (vy0[:, None] + ky) * config.tiles_x + (vx0[:, None] + kx)
    live_kg = ks < ntiles_small[:, None]
    tile_kg = jnp.where(live_kg, tile_kg, num_tiles)

    slots = NG * Kg
    if (num_tiles + 1) * slots < 2**31:
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (NG, Kg), 0) * Kg \
            + jax.lax.broadcasted_iota(jnp.int32, (NG, Kg), 1)
        key = tile_kg.reshape(-1) * slots + slot_ids.reshape(-1)
        key = jax.lax.sort(key)
        flat_tile = key // slots
        flat_gid = (key % slots) // Kg
    else:
        gid_kg = jnp.broadcast_to(
            jnp.arange(NG, dtype=jnp.int32)[:, None], (NG, Kg))
        flat_tile, flat_gid = jax.lax.sort(
            (tile_kg.reshape(-1), gid_kg.reshape(-1)), num_keys=2)

    total = jnp.sum(ntiles_small)
    big_total = jnp.sum(big)
    overflow = jnp.maximum(total - Pc, 0) + jnp.maximum(big_total - Bg, 0)

    if Pc < flat_tile.shape[0]:
        flat_tile = flat_tile[:Pc]
        flat_gid = flat_gid[:Pc]
    elif Pc > flat_tile.shape[0]:
        flat_tile = jnp.pad(flat_tile, (0, Pc - flat_tile.shape[0]),
                            constant_values=num_tiles)
        flat_gid = jnp.pad(flat_gid, (0, Pc - flat_gid.shape[0]))
    tile_offsets = jnp.searchsorted(
        flat_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(
        jnp.int32)
    num_pairs = jnp.minimum(total, Pc)
    # Clamp sentinel ids to a real group so any stray read stays in bounds
    # (live ranges never cover sentinels; this is belt-and-braces for the
    # kernel's prefetch).
    group_ids = jnp.minimum(flat_gid, NG - 1).astype(jnp.int32)

    big_key = jnp.where(big, jnp.arange(NG, dtype=jnp.int32), NG)
    big_key = jax.lax.sort(big_key)
    if Bg <= NG:
        big_key = big_key[:Bg]
    else:
        big_key = jnp.pad(big_key, (0, Bg - NG), constant_values=NG)
    live_big = big_key < NG
    big_ids = jnp.minimum(big_key, NG - 1).astype(jnp.int32)
    big_count = jnp.minimum(big_total, Bg).astype(jnp.int32)
    # Big entries' tile boxes, packed like lanes 6-7; dead entries get an
    # inverted box so a stray walk can never DMA.
    gbox = jnp.stack([vx0 * 2048 + vx1, vy0 * 2048 + vy1], axis=1)
    brow = gather_rows_onehot(gbox.astype(jnp.float32), big_ids)
    inv_box = jnp.float32(2047 * 2048)
    big_bx = jnp.where(live_big, brow[:, 0], inv_box).astype(jnp.int32)
    big_by = jnp.where(live_big, brow[:, 1], inv_box).astype(jnp.int32)

    return GroupBinnedPairs(lanes, group_ids, tile_offsets, num_pairs,
                            overflow, big_ids, big_count, big_bx, big_by)


def bin_clustered(lanes: jnp.ndarray, bbox: jnp.ndarray, valid: jnp.ndarray,
                  config: FrameConfig):
    """Binning entry for clustered (row-contiguous) setup output: group
    binning when enabled, else the per-triangle path."""
    if config.group_binning:
        return bin_groups(lanes, bbox, valid, config)
    return bin_pairs(lanes, bbox, valid, config)

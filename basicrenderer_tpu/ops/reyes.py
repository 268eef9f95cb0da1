"""Reyes-style micro-tessellation: adaptive dice of large on-screen
triangles into displaced micro-triangles.

Reference analogue: the Reyes split/dice pipeline (reference:
BasicRenderer/src/Render/GraphExtensions/CLodExtension.cpp:366 Reyes
integration + 18 Reyes*.cpp / 10 reyes*.hlsl — GPU split loops, patch
buffers, dice into micropolygon grids, displacement mapping). The
reference's answer to sub-pixel geometric detail NEAR the camera, where
even level-0 LOD triangles project large.

TPU redesign (no dynamic work expansion, no patch frontiers):
- SELECT: triangles whose projected edge exceeds `reyes_px` AND whose
  material carries a displacement map, compacted into a fixed
  `reyes_tris` parent budget (same sort-based compaction as the LOD cut;
  overflow surfaces in a counter).
- DICE: every parent uniformly diced into D^2 micro-triangles on the
  barycentric grid (D = `reyes_dice`). Uniform-per-parent dice keeps
  shared parent edges crack-free: grid vertices on an edge blend only the
  edge's two corners with identical constants, and the displacement
  sample is a function of the (shared) UV — bit-identical across
  neighbors. (The reference's adaptive split loop exists to bound patch
  sizes; the fixed parent budget + screen-size trigger bound ours.)
- DISPLACE: micro-vertices move along the interpolated normal by the
  material displacement texture (point-sampled at a <=128-texel mip of
  the strip atlas) times lane-28 scale.
- APPEND: diced parents are masked out of the main lane stream and the
  micro-triangles are packed with the SAME plane setup
  (_setup_from_corners) into reserved lane rows — they ride the ordinary
  bin + raster + fused attribute resolve, so shading/vis-buffer semantics
  are identical to ordinary geometry (the reference rasters micropolygons
  through a dedicated reyes raster bucket instead).

All math is (N,)-column shaped; the only gathers are the K parent-row
fetches and the 3*K*D^2 displacement texels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig
from . import raster_setup
from .textures import infer_resolution, mip_layout, strip_layout


def _bary_grid(D: int) -> np.ndarray:
    """(D*D, 3, 3) f32: for each micro-triangle, its 3 corners' barycentric
    weights on the parent (upright + inverted grid cells)."""
    tris = []
    for i in range(D):
        for j in range(D - i):
            # Upright cell (i, j): corners (i,j), (i+1,j), (i,j+1).
            tris.append([(i, j), (i + 1, j), (i, j + 1)])
            # Inverted cell shares the diagonal.
            if i + j <= D - 2:
                tris.append([(i + 1, j), (i + 1, j + 1), (i, j + 1)])
    assert len(tris) == D * D, (len(tris), D)
    out = np.zeros((D * D, 3, 3), np.float32)
    for t, corners in enumerate(tris):
        for c, (i, j) in enumerate(corners):
            u, v = i / D, j / D
            out[t, c] = (1.0 - u - v, u, v)
    return out


def _sample_height(strips: jnp.ndarray, num_layers: int, tex_id: jnp.ndarray,
                   u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Point-sample the R channel of the strip atlas at a fixed <=128-px
    mip (displacement needs no anisotropy). tex_id/u/v: (N,) columns."""
    from .textures import _infer_strip_resolution
    R = _infer_strip_resolution(strips.shape[0] // num_layers)
    sizes, _ = mip_layout(R)
    offs, rows_per_layer = strip_layout(R)
    # The finest mip with size <= 128 (its strips are one row per y, lane
    # = x, single phase).
    m = next(i for i, s in enumerate(sizes) if s <= 128)
    sz, off = sizes[m], offs[m]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    xi = jnp.clip((uu * sz).astype(jnp.int32), 0, sz - 1)
    yi = jnp.clip((vv * sz).astype(jnp.int32), 0, sz - 1)
    layer = jnp.maximum(tex_id, 0)
    idx = (layer * rows_per_layer + off + yi) * 128 + xi
    word = strips.reshape(-1)[idx]
    # R channel of packed RGBA8 (displacement maps are data textures).
    return (word & 0xFF).astype(jnp.float32) * (1.0 / 255.0)


def dice_reyes(gs, tri_valid, comp, scene, viewproj: jnp.ndarray,
               config: FrameConfig, id_base: int) -> Tuple:
    """Select + dice + displace (see module docstring).

    gs: 3 per-corner (Kt, 9) row tables [clip4 | wnormal3 | uv2] from the
    clustered setup. Returns (elanes, ebbox, evalid, parent_keep,
    overflow): the caller packs its MAIN stream with
    tri_valid & parent_keep (diced parents must not double-render) and
    concatenates the micro rows.
    """
    K, D = config.reyes_tris, config.reyes_dice
    W, H = config.width, config.height
    Kt = tri_valid.shape[0]

    # --- SELECT ---------------------------------------------------------
    mt = scene.material_table
    drow = raster_setup.gather_rows_onehot(mt[:, 28:30], comp.material)
    dscale, dtex = drow[:, 0], drow[:, 1].astype(jnp.int32)
    wmin = jnp.minimum(jnp.minimum(gs[0][:, 3], gs[1][:, 3]), gs[2][:, 3])
    sx, sy = [], []
    for c in range(3):
        iw = 1.0 / jnp.maximum(gs[c][:, 3], 1e-6)
        sx.append((gs[c][:, 0] * iw * 0.5 + 0.5) * W)
        sy.append((0.5 - gs[c][:, 1] * iw * 0.5) * H)
    edge_px = jnp.maximum(
        jnp.maximum(jnp.abs(sx[1] - sx[0]) + jnp.abs(sy[1] - sy[0]),
                    jnp.abs(sx[2] - sx[1]) + jnp.abs(sy[2] - sy[1])),
        jnp.abs(sx[0] - sx[2]) + jnp.abs(sy[0] - sy[2]))
    eligible = (tri_valid & (dscale > 0.0) & (wmin > 1e-3)
                & (edge_px > config.reyes_px))

    # --- SPLIT tier (reference: the Reyes split ping-pong queues,
    # CLodExtension.cpp:366 + reyesSplit*.hlsl). A dynamic work frontier
    # is anti-TPU; the statically-unrolled equivalent: triangles whose
    # projected edge exceeds reyes_split_factor * reyes_px take a 4-way
    # barycentric midpoint split FIRST (a separate fixed budget), and the
    # 4 children enter the same uniform dice — so a huge patch's
    # micro-triangle edge is halved again, bounding micropolygon size one
    # extra level (each additional level would unroll the same way).
    # Corner rows blend linearly in [clip4 | wnormal3 | uv2] space (clip
    # coords are linear over the triangle), so children need no world
    # round-trip and shared child edges stay bit-identical.
    SL = getattr(config, "reyes_split_tris", 0)
    if SL > 0:
        split_px = config.reyes_px * getattr(config, "reyes_split_factor",
                                             4.0)
        huge = eligible & (edge_px > split_px)
        norm_el = eligible & ~huge
    else:
        huge = jnp.zeros_like(eligible)
        norm_el = eligible
    slot = jnp.sort(jnp.where(norm_el,
                              jnp.arange(Kt, dtype=jnp.int32), Kt))[:K]
    live = slot < Kt
    src = jnp.minimum(slot, Kt - 1)
    overflow = jnp.maximum(jnp.sum(norm_el) - K, 0)
    # Diced parents leave the main stream (micro surface replaces them).
    parent_keep = ~(jnp.zeros((Kt,), bool).at[
        jnp.where(live, src, Kt)].set(True, mode="drop"))

    # --- parent corner columns ------------------------------------------
    inv_vp = jnp.linalg.inv(viewproj)
    pc = [gs[c][src] for c in range(3)]                 # (K, 9) row gathers
    src_all = src
    live_all = live
    if SL > 0:
        slot2 = jnp.sort(jnp.where(huge,
                                   jnp.arange(Kt, dtype=jnp.int32), Kt))[:SL]
        live2 = slot2 < Kt
        src2 = jnp.minimum(slot2, Kt - 1)
        overflow = overflow + jnp.maximum(jnp.sum(huge) - SL, 0)
        parent_keep = parent_keep & ~(
            jnp.zeros((Kt,), bool).at[
                jnp.where(live2, src2, Kt)].set(True, mode="drop"))
        p2 = [gs[c][src2] for c in range(3)]            # (SL, 9)
        # Children (corner barycentrics on the parent): corner order keeps
        # the parent's winding.
        _B = np.array([
            [(1, 0, 0), (.5, .5, 0), (.5, 0, .5)],
            [(.5, .5, 0), (0, 1, 0), (0, .5, .5)],
            [(.5, 0, .5), (0, .5, .5), (0, 0, 1)],
            [(.5, .5, 0), (0, .5, .5), (.5, 0, .5)],    # center (flipped)
        ], np.float32)                                  # (4, 3, 3)
        kids = []
        for c in range(3):
            rows = jnp.stack([
                _B[ch, c, 0] * p2[0] + _B[ch, c, 1] * p2[1]
                + _B[ch, c, 2] * p2[2]
                for ch in range(4)], axis=1)            # (SL, 4, 9)
            kids.append(rows.reshape(SL * 4, 9))
        pc = [jnp.concatenate([pc[c], kids[c]], axis=0) for c in range(3)]
        src_all = jnp.concatenate([src, jnp.repeat(src2, 4)])
        live_all = jnp.concatenate([live, jnp.repeat(live2, 4)])

    def world_cols(g):
        # clip -> homogeneous world via inv(viewproj) (column math).
        cx, cy, cz, cw = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
        wx = (inv_vp[0, 0] * cx + inv_vp[0, 1] * cy + inv_vp[0, 2] * cz
              + inv_vp[0, 3] * cw)
        wy = (inv_vp[1, 0] * cx + inv_vp[1, 1] * cy + inv_vp[1, 2] * cz
              + inv_vp[1, 3] * cw)
        wz = (inv_vp[2, 0] * cx + inv_vp[2, 1] * cy + inv_vp[2, 2] * cz
              + inv_vp[2, 3] * cw)
        ww = (inv_vp[3, 0] * cx + inv_vp[3, 1] * cy + inv_vp[3, 2] * cz
              + inv_vp[3, 3] * cw)
        iw = 1.0 / jnp.where(jnp.abs(ww) > 1e-9, ww, 1.0)
        return wx * iw, wy * iw, wz * iw

    pw = [world_cols(g) for g in pc]                    # 3 x (wx, wy, wz)
    bary = _bary_grid(D)                                # (D^2, 3, 3) const
    D2 = D * D
    scale_m = jnp.repeat(dscale[src_all], D2)           # ((K+4*SL)*D2,)
    dtex_m = jnp.repeat(dtex[src_all], D2)
    mat_m = jnp.repeat(comp.material[src_all], D2)
    obj_m = jnp.repeat(comp.object[src_all], D2)
    ev = jnp.repeat(live_all, D2)

    def blend(cols3, c):
        """Parent-corner columns (3 x (K,)) -> micro corner c (K*D2,)."""
        b = bary[:, c, :]                               # (D2, 3) const
        out = (cols3[0][:, None] * b[None, :, 0]
               + cols3[1][:, None] * b[None, :, 1]
               + cols3[2][:, None] * b[None, :, 2])     # (K, D2)
        return out.reshape(-1)

    hs = []
    vp = viewproj
    for c in range(3):
        wx = blend([pw[i][0] for i in range(3)], c)
        wy = blend([pw[i][1] for i in range(3)], c)
        wz = blend([pw[i][2] for i in range(3)], c)
        nx = blend([pc[i][:, 4] for i in range(3)], c)
        ny = blend([pc[i][:, 5] for i in range(3)], c)
        nz = blend([pc[i][:, 6] for i in range(3)], c)
        u = blend([pc[i][:, 7] for i in range(3)], c)
        v = blend([pc[i][:, 8] for i in range(3)], c)
        rl = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
        h = _sample_height(scene.tex_strips, scene.tex_flags.shape[0],
                           dtex_m, u, v) - 0.5
        d = h * scale_m * rl
        wx, wy, wz = wx + nx * d, wy + ny * d, wz + nz * d
        cx = vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3]
        cy = vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3]
        cz = vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3]
        cw = vp[3, 0] * wx + vp[3, 1] * wy + vp[3, 2] * wz + vp[3, 3]
        hs.append(jnp.stack([cx, cy, cz, cw, nx * rl, ny * rl, nz * rl,
                             u, v], axis=1))

    setup = raster_setup._setup_from_corners(
        hs[0], hs[1], hs[2], ev, config, has_normals=True, has_uvs=True)
    elanes = raster_setup.pack_setup_lanes(setup, mat_m, obj_m)
    # Unique nonzero vis ids past the caller's ranges.
    elanes = elanes.at[:, 9].set(
        jnp.where(setup.valid, elanes[:, 9] + float(id_base), 0.0))
    return elanes, setup.bbox, setup.valid, parent_keep, overflow

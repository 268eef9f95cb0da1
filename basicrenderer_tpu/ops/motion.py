"""Per-pixel motion vectors + per-tile motion aggregation for TAA/TAAU.

Reference analogue: the motion-vector targets the reference renders for
DLSS/FSR3/TAA reprojection (reference: UpscalingManager.h:23-80
motion-vector tagging; the upscalers consume a full-res motion texture).

TPU redesign (gather-free):
- Camera motion (the bulk of frame-to-frame change for static geometry) is
  pure math: unproject from depth with the current inverse viewproj, then
  re-project with the PREVIOUS frame's viewproj — no per-pixel gathers.
- Per-OBJECT motion: the renderer passes a small budgeted list of objects
  whose transforms changed this frame (ids + relative matrices
  prev_viewproj @ prev_model @ inv(cur_model)); each is one masked
  full-screen column-math pass. Object ids come from the visibility
  channels (lane-13 combo, ops/raster_setup.OBJ_COMBO).
- History reprojection then happens at TILE granularity (one fractional
  (dy, dx) per raster tile — ops/taa_warp.py); pixels whose own motion
  disagrees with their tile's motion by more than a threshold reject
  history instead (no ghosting, at the cost of local re-convergence).

All motion math runs at a reduced rate (ds) — motion fields are smooth
inside objects and the tile aggregation averages anyway.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig, ViewData
from ..utils import math3d
from .raster_setup import OBJ_COMBO
from .shadows import downsample2d

MAX_MOVING = 16   # budget for per-object motion corrections per frame


def motion_field(depth: jnp.ndarray, combo_ch: jnp.ndarray, view: ViewData,
                 prev_viewproj: jnp.ndarray, moving_rel: jnp.ndarray,
                 moving_ids: jnp.ndarray, config: FrameConfig,
                 ds: int = 2, row0: int = 0, full_h: int = None,
                 full_w: int = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """Returns (du, dv, valid, effective_ds) at 1/ds rate, in FULL-RES
    pixel units: (du, dv) = prev_screen_xy - cur_screen_xy per surface.

    depth: (H, W) reverse-Z NDC; combo_ch: (H, W) f32 lane-13 combo channel;
    moving_rel: (MAX_MOVING, 4, 4) f32 — prev_viewproj @ prev_model @
    inv(cur_model) per moving object (identity rows unused); moving_ids:
    (MAX_MOVING,) i32 object ids (-1 = unused slot).
    """
    H, W = depth.shape
    full_h = full_h or H
    full_w = full_w or W
    while ds > 1 and (H % ds or W % ds):
        ds -= 1
    d = downsample2d(depth, ds)
    combo = downsample2d(combo_ch, ds)
    obj = jnp.round(combo).astype(jnp.int32) // OBJ_COMBO
    h, w = d.shape

    sx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5
    sy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds + 0.5 + row0
    ndc_x = sx / full_w * 2.0 - 1.0
    ndc_y = 1.0 - sy / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    px, py, pz, pw = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, d)
    iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
    px, py, pz = px * iw, py * iw, pz * iw

    # Static-world reprojection through the previous camera.
    cx, cy, _cz, cw = math3d.mat4_columns(prev_viewproj, px, py, pz)
    # Moving-object corrections: masked overwrite per budget slot.
    for k in range(MAX_MOVING):
        mk = obj == moving_ids[k]
        any_k = moving_ids[k] >= 0
        kx, ky, _kz, kw = math3d.mat4_columns(moving_rel[k], px, py, pz)
        cx = jnp.where(mk & any_k, kx, cx)
        cy = jnp.where(mk & any_k, ky, cy)
        cw = jnp.where(mk & any_k, kw, cw)

    front = cw > 1e-6
    qi = 1.0 / jnp.where(front, cw, 1.0)
    prev_sx = (cx * qi * 0.5 + 0.5) * full_w
    prev_sy = (0.5 - cy * qi * 0.5) * full_h - row0
    du = prev_sx - sx
    dv = prev_sy - sy
    valid = (d > 0.0) & front
    return du, dv, valid, ds


def tile_motion(du: jnp.ndarray, dv: jnp.ndarray, valid: jnp.ndarray,
                config: FrameConfig, ds: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mean motion per raster tile. du/dv/valid at 1/ds rate; returns
    (tile_dy, tile_dx) each (tiles_y*tiles_x,) f32 (full-res pixels) plus
    the per-pixel residual magnitude (same 1/ds rate) vs the tile mean."""
    th, tw = config.tile_h // ds, config.tile_w // ds
    h, w = du.shape
    ty, tx = h // th, w // tw

    def tile_mean(x, m):
        xt = (x * m).reshape(ty, th, tx, tw).sum((1, 3))
        mt = m.reshape(ty, th, tx, tw).sum((1, 3))
        return xt / jnp.maximum(mt, 1.0)

    m = valid.astype(jnp.float32)
    mdx = tile_mean(du, m)                      # (ty, tx)
    mdy = tile_mean(dv, m)
    rx = du - jnp.repeat(jnp.repeat(mdx, th, 0), tw, 1)
    ry = dv - jnp.repeat(jnp.repeat(mdy, th, 0), tw, 1)
    residual = jnp.sqrt(rx * rx + ry * ry) * valid
    return mdy.reshape(-1), mdx.reshape(-1), residual

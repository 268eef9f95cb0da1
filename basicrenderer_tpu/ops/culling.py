"""GPU-driven culling: frustum + two-phase HZB occlusion, and the HZB build.

TPU-native redesign of the reference's hierarchical culling
(reference: shaders/ClusterLOD/computeCulling.hlsl frontier loops,
HierarchicalDispatchCullingPass.cpp; HZB via FidelityFX SPD Downsample,
"scheduled between phase-1 and phase-2" Renderer.cpp:2602). Differences by
design:

- The reference culls objects -> DAG nodes -> clusters with persistent
  GPU frontiers. Here culling is *vectorized masking* over fixed-capacity
  tables — no frontier needed until the cluster-LOD DAG lands (ops/clod.py);
  this module handles object- and cluster-granular culling.
- Two-phase occlusion: phase 1 tests against the PREVIOUS frame's HZB
  (temporal reprojection-free variant: previous HZB + current transforms,
  like the reference's phase-1), rendering survivors; phase 2 re-tests the
  phase-1-rejected set against the fresh HZB and renders newly-visible ones.
  The frame graph carries the previous HZB as loop state.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig, ViewData
from ..utils import math3d


def frustum_cull_spheres(viewproj: jnp.ndarray, centers: jnp.ndarray,
                         radii: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(N,) visibility mask for bounding spheres (world space)."""
    planes = math3d.frustum_planes(viewproj)
    return valid & math3d.sphere_in_frustum(planes, centers, radii)


HZB_FIRST_LEVEL = 1   # finest stored mip is 1/2 res (conservative; skipping
#                       mip0 halves the build cost and it is built twice per
#                       frame in the two-phase occlusion loop)


def build_hzb(depth: jnp.ndarray, levels: int = 8) -> List[jnp.ndarray]:
    """Reverse-Z hierarchical depth pyramid: each level keeps the MIN depth
    (farthest; conservative for occlusion: with reverse-Z bigger=closer,
    occluded iff occludee_z < min(occluder block z)).

    Reference analogue: FidelityFX SPD Downsample.h building the HZB mips.
    Returns `levels` entries starting at 1/2 res (HZB_FIRST_LEVEL).
    """
    mips = []
    d = depth
    for _ in range(levels):
        h, w = d.shape
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        if h >= 2 and w >= 2:
            # Two-stage reduce (rows, then columns on the half-size
            # result): contiguous reads — ~2x faster than one 4-D
            # reshape-min at 1080p (see shadows.downsample2d).
            rows = jnp.min(d[:h2 * 2].reshape(h2, 2, w), axis=1)
            d = jnp.min(rows[:, :w2 * 2].reshape(h2, w2, 2), axis=2)
        mips.append(d)
    return mips


def dilate_hzb(hzb_mips: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Each level's texel becomes min over its 2x2 forward neighborhood.

    With the mip chosen so a candidate bbox spans <= 1 scaled texel
    (occlusion_test_hzb), the 2x2 block anchored at (tx0, ty0) always
    covers the bbox — so ONE gather from the dilated level equals the
    4-tap test. jnp.roll wraps at edges; a wrapped min can only be
    FARTHER, which biases toward visible = conservative. Trades ~3
    per-candidate gathers (7 ns/element x clusters x phases) for a few
    fused image-space mins."""
    out = []
    for m in hzb_mips:
        r = jnp.minimum(m, jnp.roll(m, -1, 1))
        out.append(jnp.minimum(r, jnp.roll(r, -1, 0)))
    return out


def project_sphere_bounds(viewproj: jnp.ndarray, centers: jnp.ndarray,
                          radii: jnp.ndarray, width: int, height: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Conservative screen-space AABB + nearest reverse-Z depth of spheres.

    Returns (bbox (N,4) f32 [x0,y0,x1,y1] pixels, z_near (N,) f32 NDC,
    behind (N,) bool). Uses 8 corner points of the sphere's world AABB —
    conservative and branch-free (the reference projects cluster bounds
    similarly in computeCulling.hlsl).
    """
    from ..utils import math3d
    offs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                      for sz in (-1, 1)], jnp.float32)     # (8, 3)
    corners = centers[:, None, :] + radii[:, None, None] * offs[None]  # (N,8,3)
    cx, cy, cz, w = math3d.mat4_columns(
        viewproj, corners[..., 0], corners[..., 1], corners[..., 2])
    behind = jnp.any(w <= 1e-6, axis=-1)
    iw = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1.0)
    sx = (cx * iw * 0.5 + 0.5) * width
    sy = (0.5 - cy * iw * 0.5) * height
    z = cz * iw
    bbox = jnp.stack([sx.min(-1), sy.min(-1), sx.max(-1), sy.max(-1)], axis=-1)
    z_near = z.max(-1)   # reverse-Z: max = nearest
    return bbox, z_near, behind


def occlusion_test_hzb(hzb_mips: List[jnp.ndarray], bbox: jnp.ndarray,
                       z_near: jnp.ndarray, behind: jnp.ndarray,
                       width: int, height: int,
                       dilated: bool = False) -> jnp.ndarray:
    """(N,) bool: True = POSSIBLY VISIBLE (fails conservative occlusion).

    Picks the mip where the bbox spans <= 2x2 texels and compares the
    sphere's nearest depth against the 2x2 min (farthest) — classic HZB test
    (reference: occlusion section of computeCulling.hlsl).

    `dilated=True`: hzb_mips came from dilate_hzb — ONE anchor gather per
    candidate replaces the 4 corner taps (use for large candidate sets:
    per-element gather cost dominates at cluster counts).
    """
    x0 = jnp.clip(bbox[:, 0], 0, width - 1)
    y0 = jnp.clip(bbox[:, 1], 0, height - 1)
    x1 = jnp.clip(bbox[:, 2], 0, width - 1)
    y1 = jnp.clip(bbox[:, 3], 0, height - 1)
    size = jnp.maximum(x1 - x0, y1 - y0)
    num_mips = len(hzb_mips)
    mip = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(size, 1.0))).astype(jnp.int32)
                   - HZB_FIRST_LEVEL, 0, num_mips - 1)

    # ONE flattened pyramid + 4 combined gathers: gathering the 2x2
    # neighborhood per mip array cost 8 mips x 4 gathers x 2 phases
    # (~12 ms/frame profiled); selecting the mip's static (offset, size)
    # per candidate first makes it 4 gathers total.
    flat = jnp.concatenate([m.reshape(-1) for m in hzb_mips])
    off_m = jnp.zeros(x0.shape, jnp.int32)
    wm_m = jnp.zeros(x0.shape, jnp.int32)
    hm_m = jnp.zeros(x0.shape, jnp.int32)
    sc_m = jnp.zeros(x0.shape, jnp.float32)
    off = 0
    for m, hz in enumerate(hzb_mips):
        hm, wm = hz.shape
        sel = mip == m
        off_m = jnp.where(sel, off, off_m)
        wm_m = jnp.where(sel, wm, wm_m)
        hm_m = jnp.where(sel, hm, hm_m)
        sc_m = jnp.where(sel, 1.0 / (1 << (m + HZB_FIRST_LEVEL)), sc_m)
        off += hm * wm
    tx0 = jnp.clip((x0 * sc_m).astype(jnp.int32), 0, wm_m - 1)
    ty0 = jnp.clip((y0 * sc_m).astype(jnp.int32), 0, hm_m - 1)
    if dilated:
        occluder_z = flat[off_m + ty0 * wm_m + tx0]
    else:
        tx1 = jnp.clip((x1 * sc_m).astype(jnp.int32), 0, wm_m - 1)
        ty1 = jnp.clip((y1 * sc_m).astype(jnp.int32), 0, hm_m - 1)
        z00 = flat[off_m + ty0 * wm_m + tx0]
        z01 = flat[off_m + ty0 * wm_m + tx1]
        z10 = flat[off_m + ty1 * wm_m + tx0]
        z11 = flat[off_m + ty1 * wm_m + tx1]
        occluder_z = jnp.minimum(jnp.minimum(z00, z01),
                                 jnp.minimum(z10, z11))

    # Reverse-Z: visible if the sphere's nearest point is closer (>=) than
    # the farthest occluder in its footprint, or conservative fallbacks.
    visible = (z_near >= occluder_z) | behind
    return visible


def two_phase_object_cull(viewproj: jnp.ndarray, centers: jnp.ndarray,
                          radii: jnp.ndarray, valid: jnp.ndarray,
                          prev_hzb: Optional[List[jnp.ndarray]],
                          width: int, height: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phase-1 cull: frustum + previous-frame HZB occlusion.

    Returns (phase1_visible, occlusion_candidates) — candidates are objects
    that passed frustum but failed the HZB test; phase 2 re-tests them
    against the fresh HZB after rendering phase-1 survivors (reference:
    occlusion replay buffers, CLodExtension.cpp:1474-1514).
    """
    in_frustum = frustum_cull_spheres(viewproj, centers, radii, valid)
    if prev_hzb is None:
        return in_frustum, jnp.zeros_like(in_frustum)
    bbox, z_near, behind = project_sphere_bounds(viewproj, centers, radii,
                                                 width, height)
    unoccluded = occlusion_test_hzb(prev_hzb, bbox, z_near, behind, width, height)
    phase1 = in_frustum & unoccluded
    candidates = in_frustum & ~unoccluded
    return phase1, candidates

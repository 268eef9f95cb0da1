"""Post-processing stack: bloom, luminance auto-exposure, GTAO, TAA.

Reference analogues (reference files):
- Bloom: 5-mip down/up chain, BuildBloomPipeline RenderGraphBuildHelper.h:
  504-530.
- Auto-exposure: 256-bin luminance histogram + exposure average,
  luminanceHistogram*.hlsl.
- GTAO: Intel XeGTAO port (shaders/Intel/XeGTAO.hlsli) — depth-filtered
  horizon-based AO. TPU redesign: per-pixel *random* tap directions would
  need per-lane gathers, so taps are fixed per-frame screen-space offsets
  realized as shifted-image reads (pure vectorized slices); direction
  rotation varies per frame for TAA-style convergence.
- TAA: UpscalingPass jitter accumulation (Renderer.h:223 m_jitter); this is
  the TAA path (no DLSS/FSR on TPU). Reprojection uses the camera-jitter
  offset only (constant per frame -> a vectorized shift); full motion-vector
  reprojection needs per-pixel gathers and lands with a dedicated kernel.

All passes are pure jnp image ops — XLA fuses them into the frame program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[:2]
    h2, w2 = h // 2, w // 2
    return img[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2, -1).mean((1, 3))


def _blur3(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[:2]
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    k = jnp.array([1.0, 2.0, 1.0]) / 4.0
    horiz = sum(p[1:h + 1, dx:dx + w] * k[dx] for dx in range(3))
    p2 = jnp.pad(horiz, ((1, 1), (0, 0), (0, 0)), mode="edge")
    return sum(p2[dy:dy + h] * k[dy] for dy in range(3))


def _down2_p(img: jnp.ndarray) -> jnp.ndarray:
    """(C, h, w) plane-layout 2x box downsample."""
    c, h, w = img.shape
    h2, w2 = h // 2, w // 2
    return img[:, :h2 * 2, :w2 * 2].reshape(c, h2, 2, w2, 2).mean((2, 4))


def _blur3_p(img: jnp.ndarray) -> jnp.ndarray:
    """(C, h, w) separable 1-2-1 blur."""
    c, h, w = img.shape
    p = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    v = (p[:, :h] + 2.0 * p[:, 1:h + 1] + p[:, 2:h + 2]) * 0.25
    p = jnp.pad(v, ((0, 0), (0, 0), (1, 1)), mode="edge")
    return (p[:, :, :w] + 2.0 * p[:, :, 1:w + 1] + p[:, :, 2:w + 2]) * 0.25


def _up2_p(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(C, h2, w2) -> (C, h, w): pixel-repeat + tent smooth (cheaper than
    jax.image.resize's general bilinear; bloom is blurry by construction)."""
    up = jnp.repeat(jnp.repeat(img, 2, 1), 2, 2)
    ph, pw = h - up.shape[1], w - up.shape[2]
    if ph > 0 or pw > 0:
        up = jnp.pad(up, ((0, 0), (0, max(ph, 0)), (0, max(pw, 0))),
                     mode="edge")
    return _blur3_p(up[:, :h, :w])


def bloom(hdr: jnp.ndarray, threshold, intensity, mips: int = 5) -> jnp.ndarray:
    """Threshold -> mip down chain -> blurred up chain -> add.

    TPU notes: the whole chain runs in (3, H, W) PLANE layout — image ops
    on (H, W, 3) arrays put the 3-channel dim in the 128-lane axis (the
    first downsample alone profiled at 5.2 ms) — and starts at HALF
    resolution (bloom is low-frequency; skipping the full-res level halves
    the cost again)."""
    lum = hdr[..., 0] * 0.2126 + hdr[..., 1] * 0.7152 + hdr[..., 2] * 0.0722
    scale = jnp.clip((lum - threshold) / jnp.maximum(threshold, 1e-3), 0.0, 1e3)
    bright = hdr * scale[..., None]
    # First downsample stays in channel-minor with CONTIGUOUS reads (row
    # point-slice + column pair-mean), and the plane transpose happens at
    # quarter size — transposing/downsampling the full-res (H, W, 3) image
    # profiled at 6.4 ms.
    H0, W0 = bright.shape[:2]
    h2, w2 = H0 // 2, W0 // 2
    rows = bright[:h2 * 2].reshape(h2, 2, W0, 3)[:, 0]
    half = rows[:, :w2 * 2].reshape(h2, w2, 2, 3).mean(2)
    chain = [half.transpose(2, 0, 1)]
    for _ in range(mips - 2):
        chain.append(_blur3_p(_down2_p(chain[-1])))
    up = chain[-1]
    for m in range(len(chain) - 2, -1, -1):
        _c, h, w = chain[m].shape
        up = chain[m] + _up2_p(up, h, w)
    H, W = hdr.shape[:2]
    return hdr + _up2_p(up, H, W).transpose(1, 2, 0) * (intensity / mips)


# ---------------------------------------------------------------------------
# Luminance histogram + auto exposure (reference: luminanceHistogram*.hlsl)
# ---------------------------------------------------------------------------

def luminance_histogram(hdr: jnp.ndarray, bins: int = 256,
                        log_min: float = -10.0, log_max: float = 6.0,
                        downscale: int = 4) -> jnp.ndarray:
    """TPU note: a scatter-add histogram serializes (~15 ms at 2M pixels);
    a one-hot matmul on a downsampled grid is exact enough for exposure
    and runs on the MXU."""
    # Luma FIRST (2-D plane), then the reshape point-sample — a strided
    # [::ds, ::ds] slice of the (H, W, 3) image compiles to a gather fusion
    # (~5 ms at 1080p; see shadows.downsample2d).
    lum = hdr[..., 0] * 0.2126 + hdr[..., 1] * 0.7152 + hdr[..., 2] * 0.0722
    ds = downscale
    h, w = lum.shape
    if ds > 1 and h % ds == 0 and w % ds == 0:
        lum = lum.reshape(h // ds, ds, w // ds, ds)[:, 0, :, 0]
    elif ds > 1:
        lum = lum[:h // ds * ds, :w // ds * ds].reshape(
            h // ds, ds, w // ds, ds)[:, 0, :, 0]
    loglum = jnp.log2(jnp.maximum(lum, 1e-6))
    t = jnp.clip((loglum - log_min) / (log_max - log_min), 0.0, 1.0)
    idx = jnp.clip((t * bins).astype(jnp.int32), 0, bins - 1)
    oh = jax.nn.one_hot(idx.reshape(-1), bins, dtype=jnp.float32)
    return jnp.sum(oh, axis=0).astype(jnp.int32) * (downscale * downscale)


def auto_exposure(hdr: jnp.ndarray, target_gray: float = 0.18,
                  low_clip: float = 0.05, high_clip: float = 0.95,
                  bins: int = 256, log_min: float = -10.0, log_max: float = 6.0
                  ) -> jnp.ndarray:
    """Histogram-clipped geometric-mean exposure (the reference's exposure
    average pass). Returns a scalar multiplier."""
    hist = luminance_histogram(hdr, bins, log_min, log_max).astype(jnp.float32)
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    lo = low_clip * total
    hi = high_clip * total
    # Weight bins inside the clip range only.
    prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), cdf[:-1]])
    inside = jnp.clip(jnp.minimum(cdf, hi) - jnp.maximum(prev, lo), 0.0, None)
    centers = log_min + (jnp.arange(bins, dtype=jnp.float32) + 0.5) \
        / bins * (log_max - log_min)
    avg_log = jnp.sum(inside * centers) / jnp.maximum(jnp.sum(inside), 1.0)
    avg_lum = jnp.exp2(avg_log)
    return target_gray / jnp.maximum(avg_lum, 1e-5)


# ---------------------------------------------------------------------------
# GTAO (XeGTAO-style, shift-tap TPU variant)
# ---------------------------------------------------------------------------

def linearize_depth(depth: jnp.ndarray, near: jnp.ndarray) -> jnp.ndarray:
    """Reverse-Z NDC -> view-space distance (infinite-far projection)."""
    return near / jnp.maximum(depth, 1e-6)


def gtao(depth: jnp.ndarray, normal: jnp.ndarray, view: "ViewData",
         near, radius, intensity, frame_index,
         num_dirs: int = 2, num_steps: int = 3,
         pad: int = 96) -> jnp.ndarray:
    """(H, W) ground-truth ambient occlusion in [0, 1] (1 = unoccluded).

    The XeGTAO algorithm (reference: shaders/Intel/XeGTAO.hlsli:242-430):
    per slice, march both sides for the max horizon angles measured from
    the view vector, project the surface NORMAL onto the slice plane, and
    evaluate the cosine-weighted visible-arc integral
    `(cosN + 2h sin(n) - cos(2h - n)) / 4` per side, weighted by the
    projected-normal length. TPU redesign of the sampling only: XeGTAO's
    per-pixel random tap directions would need per-lane gathers, so taps
    are FIXED per-frame screen-space offsets realized as shifted-image
    reads (dynamic slices of once-padded world-position planes), with the
    slice set rotating per frame so TAA accumulates the full pattern —
    the same temporal strategy XeGTAO uses for its noise. The distance
    falloff is the quadratic `1 - (d/R)^2` (XeGTAO uses a linear tail;
    visually equivalent at these tap counts).
    """
    H, W = depth.shape
    from ..utils import math3d
    # World-space reconstruction (column math, like ops/ssr.py).
    sx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    sy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    ndc_x = sx / W * 2.0 - 1.0
    ndc_y = 1.0 - sy / H * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    ux, uy, uz, uw = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, depth)
    iw = 1.0 / jnp.where(jnp.abs(uw) > 1e-12, uw, 1.0)
    px, py, pz = ux * iw, uy * iw, uz * iw
    # View vector (surface -> camera), unit.
    vx = view.cam_pos[0] - px
    vy = view.cam_pos[1] - py
    vz = view.cam_pos[2] - pz
    il = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-12))
    vx, vy, vz = vx * il, vy * il, vz * il
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]

    # World-space falloff radius; screen-space tap extent (matches the
    # pre-rewrite tuning so params.gtao_radius keeps its meaning).
    r_world = radius * 8.0
    # Pad the world-position planes ONCE; each tap is then three cheap
    # dynamic slices (per-tap edge pads cost a full-image copy each).
    pads = [jnp.pad(p, pad, mode="edge") for p in (px, py, pz)]

    base = jnp.pi * (frame_index.astype(jnp.float32) % 4.0) / (4.0 * num_dirs)
    half_pi = jnp.float32(jnp.pi / 2)
    visibility = jnp.zeros((H, W), jnp.float32)
    for d in range(num_dirs):
        ang = base + d * jnp.pi / num_dirs      # slices cover [0, pi)
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        # World direction of the +omega screen direction at each pixel
        # (unproject a 1px-offset at the same depth; exact per pixel).
        ox, oy, oz, ow = math3d.mat4_columns(
            inv_vp, ndc_x + ca * 2.0 / W, ndc_y - sa * 2.0 / H, depth)
        iow = 1.0 / jnp.where(jnp.abs(ow) > 1e-12, ow, 1.0)
        dxw = ox * iow - px
        dyw = oy * iow - py
        dzw = oz * iow - pz
        # Slice-plane frame: ortho = normalize(D - V dot(D,V)).
        t = dxw * vx + dyw * vy + dzw * vz
        gx, gy, gz = dxw - t * vx, dyw - t * vy, dzw - t * vz
        gl = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-18))
        gx, gy, gz = gx * gl, gy * gl, gz * gl
        # Normal projected into the slice plane: components along V and
        # ortho. n = signed angle of projN from V (positive toward +omega).
        n_v = nx * vx + ny * vy + nz * vz
        n_o = nx * gx + ny * gy + nz * gz
        proj_len = jnp.sqrt(jnp.maximum(n_v * n_v + n_o * n_o, 1e-12))
        cos_norm = jnp.clip(n_v / proj_len, 0.0, 1.0)
        n_ang = jnp.sign(n_o) * jnp.arccos(cos_norm)
        sin_n = jnp.sin(n_ang)
        # Horizon floors at the surface tangent plane (XeGTAO
        # lowHorizonCos0/1 = cos(n +- pi/2)).
        hcos_pos = -sin_n          # cos(n + pi/2), +omega side
        hcos_neg = sin_n           # cos(n - pi/2), -omega side
        for s in range(1, num_steps + 1):
            r_px = radius * s * 24.0 / num_steps
            dx = jnp.clip((ca * r_px).astype(jnp.int32), -pad, pad)
            dy = jnp.clip((sa * r_px).astype(jnp.int32), -pad, pad)
            for sgn in (1, -1):
                s0 = jax.lax.dynamic_slice(
                    pads[0], (pad + sgn * dy, pad + sgn * dx), (H, W))
                s1 = jax.lax.dynamic_slice(
                    pads[1], (pad + sgn * dy, pad + sgn * dx), (H, W))
                s2 = jax.lax.dynamic_slice(
                    pads[2], (pad + sgn * dy, pad + sgn * dx), (H, W))
                ex, ey, ez = s0 - px, s1 - py, s2 - pz
                dist2 = ex * ex + ey * ey + ez * ez
                idist = jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))
                cos_s = (ex * vx + ey * vy + ez * vz) * idist
                # Distance falloff: samples past r_world stop raising the
                # horizon (their weight lerps toward the tangent floor).
                w = jnp.clip(1.0 - dist2 / (r_world * r_world), 0.0, 1.0)
                w = jnp.where(dist2 > 1e-10, w, 0.0)
                if sgn > 0:
                    adj = hcos_pos + w * (cos_s - hcos_pos)
                    hcos_pos = jnp.maximum(hcos_pos, adj)
                else:
                    adj = hcos_neg + w * (cos_s - hcos_neg)
                    hcos_neg = jnp.maximum(hcos_neg, adj)
        # Visible-arc integral per side (XeGTAO XeGTAO_IntegrateArc).
        h_pos = n_ang + jnp.clip(
            jnp.arccos(jnp.clip(hcos_pos, -1.0, 1.0)) - n_ang,
            -half_pi, half_pi)
        h_neg = n_ang + jnp.clip(
            -jnp.arccos(jnp.clip(hcos_neg, -1.0, 1.0)) - n_ang,
            -half_pi, half_pi)
        arc = (cos_norm + 2.0 * h_pos * sin_n - jnp.cos(2.0 * h_pos - n_ang)
               + cos_norm + 2.0 * h_neg * sin_n
               - jnp.cos(2.0 * h_neg - n_ang)) * 0.25
        visibility = visibility + proj_len * arc
    vis = jnp.clip(visibility / num_dirs, 0.0, 1.0)
    ao = 1.0 - intensity * (1.0 - vis)
    return jnp.clip(_box3(ao), 0.0, 1.0)


def _shift2d(img: jnp.ndarray, dy, dx) -> jnp.ndarray:
    H, W = img.shape
    p = jnp.pad(img, ((H, H), (W, W)), mode="edge")
    return jax.lax.dynamic_slice(p, (H + dy, W + dx), (H, W))


def _box3(img: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    p = jnp.pad(img, 1, mode="edge")
    return sum(p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)) / 9.0


# ---------------------------------------------------------------------------
# TAA (jitter accumulation)
# ---------------------------------------------------------------------------

# Plain numpy: a module-level jnp constant would be captured as a tracer if
# this module is first imported inside an active jit trace.
import numpy as _np
HALTON_23 = _np.array([
    [0.5, 0.333333], [0.25, 0.666667], [0.75, 0.111111], [0.125, 0.444444],
    [0.625, 0.777778], [0.375, 0.222222], [0.875, 0.555556], [0.0625, 0.888889],
], _np.float32) - 0.5


def taa_jitter(frame_index: int):
    """Sub-pixel NDC jitter for the projection matrix (reference m_jitter)."""
    return HALTON_23[int(frame_index) % 8]


def taa_resolve(current: jnp.ndarray, history: Optional[jnp.ndarray],
                blend) -> jnp.ndarray:
    """History blend with 3x3 neighborhood clamp (disocclusion guard).
    Camera-static path: reprojection is identity (the jitter was applied in
    the projection matrix, so geometry samples different sub-pixels each
    frame and converges to a supersampled result)."""
    if history is None:
        return current
    H, W = current.shape[:2]
    p = jnp.pad(current, ((1, 1), (1, 1), (0, 0)), mode="edge")
    neigh = jnp.stack([p[dy:dy + H, dx:dx + W]
                       for dy in range(3) for dx in range(3)])
    lo = neigh.min(0)
    hi = neigh.max(0)
    hist = jnp.clip(history, lo, hi)
    return current * blend + hist * (1.0 - blend)


def taa_resolve_mv(current: jnp.ndarray, history: Optional[jnp.ndarray],
                   blend, tile_dy: jnp.ndarray, tile_dx: jnp.ndarray,
                   residual: jnp.ndarray, tile_h: int, tile_w: int,
                   use_kernel: bool = True, interpret: bool = False,
                   reject_px: float = 1.5) -> jnp.ndarray:
    """Motion-vector TAA resolve (reference: UpscalingManager motion-vector
    tagging + the TAA history resample, UpscalingManager.h:23-80).

    History is warped per TILE (ops/taa_warp.py) by the tile's mean motion;
    `residual` ((h', w') any reduced rate) is each pixel's own motion
    disagreement vs the tile mean in full-res pixels — pixels above
    `reject_px` drop history entirely (correct-but-noisy beats ghosting).
    The 3x3 neighborhood clamp still guards everything else."""
    if history is None:
        return current
    from .taa_warp import warp_history_ref, warp_history_tiles
    H, W = current.shape[:2]
    ph, pw = (-H) % tile_h, (-W) % tile_w
    hist_p = jnp.pad(history, ((0, ph), (0, pw), (0, 0)), mode="edge") \
        if (ph or pw) else history
    if use_kernel:
        hist = warp_history_tiles(hist_p, tile_dy, tile_dx, tile_h, tile_w,
                                  interpret=interpret)
    else:
        hist = warp_history_ref(hist_p, tile_dy, tile_dx, tile_h, tile_w)
    hist = hist[:H, :W]
    p = jnp.pad(current, ((1, 1), (1, 1), (0, 0)), mode="edge")
    neigh = jnp.stack([p[dy:dy + H, dx:dx + W]
                       for dy in range(3) for dx in range(3)])
    hist = jnp.clip(hist, neigh.min(0), neigh.max(0))
    if residual.shape != (H, W):
        residual = jax.image.resize(residual, (H, W), method="nearest")
    w_cur = jnp.where(residual > reject_px, 1.0, blend)[..., None]
    return current * w_cur + hist * (1.0 - w_cur)

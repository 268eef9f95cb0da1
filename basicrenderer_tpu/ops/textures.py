"""Runtime texture sampling from the packed mip-pyramid atlas.

Reference analogue: bindless SRV sampling with HW trilinear filtering in the
material-evaluation shaders (reference: VisUtilEvaluate.hlsl / gbuffer.hlsl
texture fetches through the descriptor heap; mips from
TextureProcessingManager). TPU redesign, driven by measurement:

- XLA gathers serialize at ~0.6 ns/float, so the byte-per-tap budget is the
  whole game. Texels are stored as RGBA8 PACKED INTO ONE uint32 (models/
  textures.py) — one gathered word per tap instead of four floats, a 4x cut.
  8-bit is also what the reference samples (BC7 decodes to UNORM8).
- The full mip chain lives in ONE flat array per layer (offsets are static
  Python constants), so per-pixel mip selection just changes the computed
  index — mip'd sampling costs exactly the same gather as mip-0.
- Mip level comes from screen-space UV derivatives (the ddx/ddy the
  reference's pixel shaders get from the quad): per-axis min(|forward|,
  |backward|) differences reject the spikes at triangle/UV-seam boundaries.
- Filters: "nearest" = 1 gather/tap; "bilinear" = 4 (decode-to-linear per
  tap, blend in linear space). Reduced-rate mode (downscale > 1) samples the
  decimated grid and bilinearly upsamples the RESULT; the decimated UV grid
  automatically biases the derivative-computed mip, keeping it alias-free.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

MIN_MIP = 4  # coarsest mip edge in texels


@functools.lru_cache(maxsize=None)
def mip_layout(resolution: int) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Static (sizes, offsets) of the flat per-layer mip chain."""
    sizes = []
    offsets = []
    off = 0
    r = resolution
    while r >= MIN_MIP:
        sizes.append(r)
        offsets.append(off)
        off += r * r
        r //= 2
    return tuple(sizes), tuple(offsets)


def layer_words(resolution: int) -> int:
    """Flat u32 words per layer (the pyramid's second dim)."""
    sizes, offsets = mip_layout(resolution)
    return offsets[-1] + sizes[-1] * sizes[-1]


@functools.lru_cache(maxsize=None)
def infer_resolution(words: int) -> int:
    """Recover the mip-0 edge from the pyramid's static per-layer length
    (the chain-to-MIN_MIP sum is unique per power-of-two resolution)."""
    r = MIN_MIP
    while r <= 1 << 16:
        if layer_words(r) == words:
            return r
        r *= 2
    raise ValueError(f"no power-of-two mip chain has {words} words")


def _unpack_rgba8(word: jnp.ndarray, srgb: jnp.ndarray) -> jnp.ndarray:
    """(...,) uint32 -> (..., 4) f32 linear. `srgb` (...,) bool selects
    sRGB->linear decode of the rgb lanes (exact 2.4 curve)."""
    w = word.astype(jnp.uint32)
    c = jnp.stack([w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF,
                   (w >> 24) & 0xFF], axis=-1).astype(jnp.float32) / 255.0
    lin = jnp.where(c <= 0.04045, c / 12.92,
                    jnp.power((c + 0.055) / 1.055, 2.4))
    rgb = jnp.where(srgb[..., None], lin[..., :3], c[..., :3])
    return jnp.concatenate([rgb, c[..., 3:]], axis=-1)


def _min_abs_grad(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Per-pixel min(|forward diff|, |backward diff|) along an image axis —
    a seam-robust ddx/ddy (a one-sided spike at a triangle/UV-wrap boundary
    doesn't force a blurry mip on the whole edge)."""
    fwd = jnp.abs(jnp.diff(img, axis=axis, append=jnp.take(
        img, jnp.array([-1]), axis=axis)))
    bwd = jnp.abs(jnp.diff(img, axis=axis, prepend=jnp.take(
        img, jnp.array([0]), axis=axis)))
    return jnp.minimum(fwd, bwd)


def compute_mip(uv: jnp.ndarray, resolution: int, num_mips: int
                ) -> jnp.ndarray:
    """(H, W, 2) uv -> (H, W) f32 mip level in [0, num_mips-1]."""
    dudx = _min_abs_grad(uv[..., 0], 1)
    dudy = _min_abs_grad(uv[..., 0], 0)
    dvdx = _min_abs_grad(uv[..., 1], 1)
    dvdy = _min_abs_grad(uv[..., 1], 0)
    rho = jnp.sqrt(jnp.maximum(dudx * dudx + dvdx * dvdx,
                               dudy * dudy + dvdy * dvdy)) * resolution
    mip = jnp.log2(jnp.maximum(rho, 1e-6))
    return jnp.clip(mip, 0.0, num_mips - 1.0)


def sample_pyramid(pyramid: jnp.ndarray, tex_flags: jnp.ndarray,
                   tex_id: jnp.ndarray, uv: jnp.ndarray,
                   downscale: int = 1, filter: str = "bilinear"
                   ) -> jnp.ndarray:
    """Sample the packed atlas: pyramid (N, S) uint32, tex_flags (N,) i32
    (bit 0 = sRGB), tex_id (H, W) i32 (-1 = none -> white), uv (H, W, 2).
    Returns (H, W, 4) f32 linear."""
    N, S = pyramid.shape
    R = infer_resolution(S)
    sizes, offsets = mip_layout(R)
    H, W = tex_id.shape
    tid = tex_id[::downscale, ::downscale]
    st = uv[::downscale, ::downscale]
    mip = compute_mip(st, R, len(sizes))
    mip_i = jnp.round(mip).astype(jnp.int32)

    layer = jnp.clip(tid, 0, N - 1)
    srgb = (tex_flags[layer] & 1) > 0
    flat = pyramid.reshape(-1)
    base = layer * S

    # Static per-mip constants selected per pixel (len(sizes) ~ 7 selects).
    rm = jnp.zeros(tid.shape, jnp.int32)
    om = jnp.zeros(tid.shape, jnp.int32)
    for m, (sz, off) in enumerate(zip(sizes, offsets)):
        rm = jnp.where(mip_i == m, sz, rm)
        om = jnp.where(mip_i == m, off, om)
    rf = rm.astype(jnp.float32)

    u = st[..., 0] - jnp.floor(st[..., 0])      # wrap
    v = st[..., 1] - jnp.floor(st[..., 1])

    def tap(xi, yi):
        idx = base + om + yi * rm + xi
        return _unpack_rgba8(flat[idx.reshape(-1)].reshape(idx.shape),
                             srgb)

    if filter == "nearest":
        xi = jnp.clip((u * rf).astype(jnp.int32), 0, rm - 1)
        yi = jnp.clip((v * rf).astype(jnp.int32), 0, rm - 1)
        smp = tap(xi, yi)
    elif filter == "bilinear":
        x = u * rf - 0.5
        y = v * rf - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        xi0 = jnp.mod(x0.astype(jnp.int32), rm)
        yi0 = jnp.mod(y0.astype(jnp.int32), rm)
        xi1 = jnp.mod(xi0 + 1, rm)
        yi1 = jnp.mod(yi0 + 1, rm)
        smp = (tap(xi0, yi0) * (1 - fx) * (1 - fy)
               + tap(xi1, yi0) * fx * (1 - fy)
               + tap(xi0, yi1) * (1 - fx) * fy
               + tap(xi1, yi1) * fx * fy)
    else:
        raise ValueError(f"unknown texture filter {filter!r}")

    smp = jnp.where((tid >= 0)[..., None], smp, 1.0)
    if downscale > 1:
        smp = jax.image.resize(smp, (H, W, 4), method="bilinear")
    return smp


def _ddx(img):
    return jnp.concatenate([img[:, 1:] - img[:, :-1], img[:, -1:] * 0], axis=1)


def _ddy(img):
    return jnp.concatenate([img[1:] - img[:-1], img[-1:] * 0], axis=0)


def apply_normal_map(normal: jnp.ndarray, world_pos: jnp.ndarray,
                     uv: jnp.ndarray, pyramid: jnp.ndarray,
                     tex_flags: jnp.ndarray, normal_tex: jnp.ndarray,
                     normal_scale=1.0, downscale: int = 1,
                     filter: str = "bilinear") -> jnp.ndarray:
    """Perturb G-buffer normals with a tangent-space normal map.

    The tangent frame is reconstructed from SCREEN-SPACE DERIVATIVES of
    world position and UV (the classic deferred-renderer trick — equivalent
    to what ddx/ddy give the reference's pixel shaders), so the raster
    payload needs no tangent channels. All derivative math is shifted-image
    arithmetic — fully vectorized, no gathers beyond the texture taps.
    """
    smp = sample_pyramid(pyramid, tex_flags, normal_tex, uv, downscale,
                         filter)
    n_ts = smp[..., :3] * 2.0 - 1.0
    n_ts = n_ts.at[..., :2].multiply(normal_scale)

    dpdx = _ddx(world_pos)
    dpdy = _ddy(world_pos)
    dudx = _ddx(uv[..., 0])
    dudy = _ddy(uv[..., 0])
    dvdx = _ddx(uv[..., 1])
    dvdy = _ddy(uv[..., 1])
    det = dudx * dvdy - dudy * dvdx
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    t = (dpdx * dvdy[..., None] - dpdy * dvdx[..., None]) / safe[..., None]
    # Gram-Schmidt against the interpolated normal.
    t = t - normal * jnp.sum(t * normal, -1, keepdims=True)
    tlen = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = t / jnp.maximum(tlen, 1e-9)
    b = jnp.cross(normal, t)
    n2 = (t * n_ts[..., 0:1] + b * n_ts[..., 1:2] + normal * n_ts[..., 2:3])
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-9)
    # Fall back to the geometric normal where no map / degenerate frame.
    ok = (normal_tex >= 0) & (jnp.abs(det) > 1e-12) & (tlen[..., 0] > 1e-9)
    return jnp.where(ok[..., None], n2, normal)

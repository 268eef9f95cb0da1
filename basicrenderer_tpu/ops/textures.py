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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    fl = tex_flags[layer]
    srgb = (fl & 1) > 0
    # Texture streaming: bits 1-5 of the flag word carry the texture's
    # finest RESIDENT mip (models/texstream.py) — sampling clamps to it,
    # so missing fine mips degrade to the resident coarse content instead
    # of reading stale rows.
    mip_i = jnp.clip(jnp.maximum(mip_i, (fl >> 1) & 31), 0, len(sizes) - 1)
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


# ---------------------------------------------------------------------------
# Block-window sampler: the full-rate path.
#
# Measured on v5e: XLA's per-element gather costs ~7 ns/element regardless of
# table size or coherence — per-pixel taps are therefore ~15 ms per 2M-pixel
# channel and can never reach full rate. ROW gathers amortize (~4-6 ns per
# row up to 256 elements wide), and batched MXU einsums with K=128 are fast.
# The sampler exploits both:
#
#   1. pixels are processed in 16x16 screen blocks; each block picks ONE
#      (layer, mip, window): mip = max(per-pixel mip, smallest mip whose
#      texel footprint fits a 20-texel window) — blocks that straddle UV
#      seams/material edges gracefully blur instead of reading wrong memory;
#   2. each mip row is stored as 128-texel strips at two x phases (0, 64)
#      (models/textures.strip_pyramid), so a block's 24-row window is 24
#      GATHERED ROWS — the only gathers in the pipeline, ~100k-800k rows;
#   3. per-pixel bilinear selection inside the window is ONE batched MXU
#      einsum (blocks, 256 px, 128) @ (blocks, 128, 24*4K) with the bilinear
#      x weights encoded in a 2-nonzero one-hot matrix, then a 24-way
#      select-sum for y on the VPU. K channel samples (base/normal/orm/
#      emissive) share the window geometry and ride the same einsum.
# ---------------------------------------------------------------------------

BLOCK = 16            # pixel block edge
WROWS = 24            # window rows (y texels)
FIT_TEXELS = 20.0     # max block footprint per axis before mip bump


@functools.lru_cache(maxsize=None)
def strip_layout(resolution: int) -> Tuple[Tuple[int, ...], int]:
    """(row offset of each mip, rows per layer) in the strip pyramid."""
    sizes, _ = mip_layout(resolution)
    offs = []
    off = 0
    for sz in sizes:
        offs.append(off)
        off += sz if sz <= 128 else (sz // 64 - 1) * sz
    return tuple(offs), off


def _blockify(img: jnp.ndarray) -> jnp.ndarray:
    """(h, w, ...) -> (nb, BLOCK*BLOCK, ...)."""
    h, w = img.shape[:2]
    hb, wb = h // BLOCK, w // BLOCK
    x = img.reshape((hb, BLOCK, wb, BLOCK) + img.shape[2:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((hb * wb, BLOCK * BLOCK) + img.shape[2:])


def _unblockify(blocks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    hb, wb = h // BLOCK, w // BLOCK
    x = blocks.reshape((hb, wb, BLOCK, BLOCK) + blocks.shape[2:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h, w) + blocks.shape[2:])


def sample_pyramid_blocked(strips: jnp.ndarray, tex_flags: jnp.ndarray,
                           tex_ids: jnp.ndarray, uv: jnp.ndarray,
                           downscale: int = 1, filter: str = "bilinear",
                           block_chunk: int = 2048, kernel: bool = None,
                           interpret: bool = False,
                           fmt: str = "rgba8") -> jnp.ndarray:
    """Full-rate sampling of K channel layers sharing one UV image.

    strips: (N * rows_per_layer, 128) uint32 (models/textures.strip_pyramid)
    tex_flags: (N,) i32; tex_ids: (K, H, W) i32 (-1 = none -> white);
    uv: (H, W, 2). Returns (K, H, W, 4) f32 linear.

    TPU note: when downscale > 1 prefer sample_pyramid_blocked_planes —
    strided `[::ds]` slices of channel-minor images compile to gather
    fusions (~8 ms at 1080p; the planes entry point slices cheap 2-D
    arrays instead).

    Block limitations (documented contract): two layers per block for the
    first channel, one for the rest; blocks straddling UV wrap seams or
    with oversized footprints sample a coarser mip (blur, never wrong
    memory).
    """
    ds = downscale
    st = uv[::ds, ::ds]
    tids = tex_ids[:, ::ds, ::ds]
    return sample_pyramid_blocked_planes(
        strips, tex_flags, tids, st[..., 0], st[..., 1],
        uv.shape[0], uv.shape[1], ds, filter, block_chunk,
        kernel=kernel, interpret=interpret, fmt=fmt)


def sample_pyramid_blocked_planes(strips: jnp.ndarray, tex_flags: jnp.ndarray,
                                  tids: jnp.ndarray, u_ds: jnp.ndarray,
                                  v_ds: jnp.ndarray, H: int, W: int,
                                  ds: int = 1, filter: str = "bilinear",
                                  block_chunk: int = 2048,
                                  kernel: bool = None,
                                  interpret: bool = False,
                                  upsample: bool = True,
                                  mipf: jnp.ndarray = None,
                                  fmt: str = "rgba8") -> jnp.ndarray:
    """Plane-input variant: tids (K, h, w), u_ds/v_ds (h, w) ALREADY at the
    sampling rate (h = H//ds). Returns (K, H, W, 4) upsampled to full res;
    `upsample=False` returns the ds-rate image (K, h, w, 4) — screen-row
    shards upsample with a seam halo instead (graph/frame halo_upsample).
    `mipf` (h, w) overrides the internal per-pixel mip estimate (shards
    pass a halo-computed one so row derivatives at seams match the
    single-chip frame)."""
    K = tids.shape[0]
    N = tex_flags.shape[0]
    NR, _sw = strips.shape
    RPL_total = NR // N
    bc = fmt == "bc3"
    R = (_infer_strip_resolution_bc(RPL_total) if bc
         else _infer_strip_resolution(RPL_total))
    sizes, _ = mip_layout(R)
    M = len(sizes)
    row_offs, RPL = strip_layout_bc(R) if bc else strip_layout(R)
    # BC3: gather 7 BLOCK rows per window (28 texel rows after decode);
    # RGBA8: 24 texel rows directly.
    WR_G = 7 if bc else WROWS
    WR = 28 if bc else WROWS
    h, w = u_ds.shape
    ph = (-h) % BLOCK
    pw = (-w) % BLOCK

    st = jnp.stack([u_ds, v_ds], axis=-1)
    if mipf is None:
        mipf = compute_mip(st, R, M)
    if ph or pw:
        st = jnp.pad(st, ((0, ph), (0, pw), (0, 0)), mode="edge")
        mipf = jnp.pad(mipf, ((0, ph), (0, pw)), mode="edge")
        tids = jnp.pad(tids, ((0, 0), (0, ph), (0, pw)),
                       constant_values=-1)
    hp, wp = h + ph, w + pw

    u = st[..., 0] - jnp.floor(st[..., 0])
    v = st[..., 1] - jnp.floor(st[..., 1])
    ub = _blockify(u)                      # (nb, P)
    vb = _blockify(v)
    mb_px = _blockify(jnp.round(mipf).astype(jnp.int32))
    tb = jnp.stack([_blockify(tids[k]) for k in range(K)])  # (K, nb, P)
    nb, P = ub.shape

    # One sampling JOB per (channel, layer-rank): rank 0 = the block's
    # dominant layer for that channel, rank 1 = the runner-up. Every job
    # gets its OWN mask -> mip -> window -> weights, so a block straddling
    # two materials samples both at the right detail (shared geometry
    # blurred the whole block to the union footprint — visible squares).
    btid = jnp.max(tb, axis=2)                                  # (K, nb)
    tb2m = jnp.where(tb == btid[:, :, None], -1, tb)
    btid2 = jnp.max(tb2m, axis=2)                               # (K, nb)
    mask = (tb == btid[:, :, None]) & (tb >= 0)
    mask2 = (tb == btid2[:, :, None]) & (tb >= 0)
    # Runner-up job for the FIRST channel only (base color): boundary
    # errors in normal/roughness channels are visually negligible, and
    # each extra job costs a full fetch+einsum slice.
    jtid = jnp.concatenate([btid, btid2[:1]], 0)                # (J, nb)
    jmask = jnp.concatenate([mask, mask2[:1]], 0)               # (J, nb, P)
    J = K + 1
    layer_j = jnp.clip(jtid, 0, N - 1)                          # (J, nb)

    inf = jnp.float32(jnp.inf)

    def jmin(x):   # (nb, P) -> (J, nb) masked min
        return jnp.min(jnp.where(jmask, x[None], inf), axis=2)

    def jmax(x):
        return jnp.max(jnp.where(jmask, x[None], -inf), axis=2)

    any_live = jmask.any(axis=2)                                # (J, nb)
    ext = jnp.where(any_live,
                    jnp.maximum(jmax(ub) - jmin(ub), jmax(vb) - jmin(vb)),
                    0.0)
    m_fit = jnp.ceil(jnp.log2(jnp.maximum(ext * R / FIT_TEXELS, 1e-6)))
    # Robust block mip: the MEAN of the job's pixel mips (rounded up). A
    # max picks up derivative spikes at silhouette corners (both-sided UV
    # discontinuities) and flattened whole blocks to the coarsest mip —
    # the visible square blotches around objects.
    cnt = jnp.maximum(jnp.sum(jmask, axis=2), 1)
    m0 = jnp.ceil(jnp.sum(jnp.where(jmask, mb_px[None], 0), axis=2)
                  / cnt).astype(jnp.int32)
    fl_j = tex_flags[layer_j]                                   # (J, nb)
    # Streaming min-mip clamp (flag bits 1-5; see sample_pyramid).
    m0 = jnp.maximum(m0, (fl_j >> 1) & 31)
    mb = jnp.clip(jnp.maximum(m0, m_fit.astype(jnp.int32)), 0, M - 1)

    # Static per-mip constants -> per-job-block values (J, nb).
    rm = jnp.zeros((J, nb), jnp.int32)
    rm_b = jnp.zeros((J, nb), jnp.int32)     # bc3: BLOCK rows per mip
    off = jnp.zeros((J, nb), jnp.int32)
    for m, sz in enumerate(sizes):
        rm = jnp.where(mb == m, sz, rm)
        rm_b = jnp.where(mb == m, max(sz // 4, 1), rm_b)
        off = jnp.where(mb == m, row_offs[m], off)
    rf = rm.astype(jnp.float32)
    wide = rm > 128                          # phase-strip regime

    txf = ub[None] * rf[:, :, None] - 0.5    # (J, nb, P)
    tyf = vb[None] * rf[:, :, None] - 0.5
    txmin = jnp.where(any_live,
                      jnp.min(jnp.where(jmask, txf, inf), axis=2), 0.0)
    tymin = jnp.where(any_live,
                      jnp.min(jnp.where(jmask, tyf, inf), axis=2), 0.0)
    xb = jnp.clip((jnp.floor(txmin).astype(jnp.int32) // 64) * 64,
                  0, jnp.maximum(rm - 128, 0))
    xb = jnp.where(wide, xb, 0)
    y0 = jnp.floor(tymin).astype(jnp.int32)

    # Window row ids (J, nb, WR_G) in each job's layer. BC3 rows are
    # block rows: the window starts at the 4-aligned block row containing
    # y0, wraps at the mip's block-row count, and decodes to 4 texel rows
    # each — texel-level wrap is exact because mip heights are multiples
    # of 4 (tiny mips wrap-fill their one block at encode time).
    jrow = jnp.arange(WR_G, dtype=jnp.int32)[None, None, :]
    if bc:
        y0b = jnp.floor_divide(y0, 4)
        yrow = jnp.remainder(y0b[:, :, None] + jrow, rm_b[:, :, None])
        phase_rows = jnp.where(wide, (xb // 64) * rm_b, 0)
        y0_win = y0b * 4                     # first decoded texel row
    else:
        yrow = jnp.remainder(y0[:, :, None] + jrow, rm[:, :, None])
        phase_rows = jnp.where(wide, (xb // 64) * rm, 0)
        y0_win = y0
    rows_k = layer_j[:, :, None] * RPL + off[:, :, None] \
        + phase_rows[:, :, None] + yrow                         # (J, nb, W)

    # Per-pixel window coordinates + weights (J, nb, P).
    ix0f = jnp.floor(txf)
    fx = txf - ix0f
    ix0 = ix0f.astype(jnp.int32)
    ix0 = jnp.where(wide[:, :, None],
                    jnp.clip(ix0 - xb[:, :, None], 0, 126),
                    jnp.remainder(ix0, 128))
    ix1 = jnp.where(wide[:, :, None], ix0 + 1, jnp.remainder(ix0 + 1, 128))
    iy0f = jnp.floor(tyf)
    fy = tyf - iy0f
    wy0 = jnp.clip(iy0f.astype(jnp.int32) - y0_win[:, :, None], 0, WR - 2)

    if filter == "nearest":
        ixn = jnp.where(fx > 0.5, ix1, ix0)
        fx = jnp.zeros_like(fx)
        ix0 = ix1 = ixn
        wy0 = jnp.clip(wy0 + (fy > 0.5), 0, WR - 1).astype(jnp.int32)
        fy = jnp.zeros_like(fy)

    flat = strips  # (NR, 128)
    bf16 = jnp.bfloat16   # texel values 0..255 are exact in bf16; weight
    #                       rounding ~0.4% is invisible — single MXU pass.

    use_kernel = (jax.default_backend() == "tpu") if kernel is None else kernel
    if use_kernel or interpret:
        # Fused Mosaic path: the XLA pipeline below materializes ~600 MB of
        # one-hot/unpack intermediates in HBM per frame (measured ~9 ms at
        # 1080p ds2); the kernel keeps everything per-job in VMEM (~2.5 ms).
        # The hat-function identity builds both bilinear one-hots on the
        # VPU: hat(l - x) = max(0, 1-|l-x|) IS the two-tap weight row, and
        # hat(l - x + 128) covers the lane-127 -> 0 wrap. The mapped ix0/fx
        # already encode the filter (nearest zeroes fx) and the window
        # clamp/wrap, so the fractional tap center is just their sum.
        x_hat = ix0.astype(jnp.float32) + fx
        yf = wy0.astype(jnp.float32) + fy
        out = _blocked_kernel_eval(flat, rows_k, x_hat, yf, P,
                                   interpret=interpret,
                                   decode=bc3_decode_rows if bc else None,
                                   wrows=WR)              # (J, nb, P, 4)
    else:
        lanes = jnp.arange(128, dtype=jnp.int32)[None, None, None, :]
        jj = jnp.arange(WR, dtype=jnp.int32)[None, None, None, :]

        def chunk_fn(args):
            rows_c, ix0c, ix1c, fxc, wy0c, fyc = args
            # rows_c (J, cb, WR_G); the rest (J, cb, P).
            cb = ix0c.shape[1]
            wx = ((lanes == ix0c[..., None]).astype(bf16)
                  * (1 - fxc)[..., None].astype(bf16)
                  + (lanes == ix1c[..., None]).astype(bf16)
                  * fxc[..., None].astype(bf16))            # (J, cb, P, 128)
            win = flat[rows_c.reshape(-1)]                  # row gathers
            w32 = win.reshape(J * cb, WR_G, 128).astype(jnp.uint32)
            if bc:
                w32 = bc3_decode_rows(w32)                  # (J*cb, WR, 128)
            ch = jnp.stack([(w32 >> s) & 0xFF for s in (0, 8, 16, 24)],
                           axis=-1).astype(bf16)        # (J*cb, WR, 128, 4)
            op = ch.transpose(0, 2, 1, 3).reshape(J * cb, 128, WR * 4)
            x_red = jnp.einsum("bpx,bxc->bpc", wx.reshape(J * cb, P, 128), op,
                               precision=jax.lax.Precision.DEFAULT)
            x_red = x_red.reshape(J, cb, P, WR, 4)          # stays bf16
            wy = ((jj == wy0c[..., None]).astype(bf16) * (1 - fyc)[..., None]
                  .astype(bf16)
                  + (jj == (wy0c + 1)[..., None]).astype(bf16)
                  * fyc[..., None].astype(bf16))            # (J, cb, P, WR)
            return jnp.sum(x_red * wy[..., None], axis=3,
                           dtype=jnp.float32)               # (J, cb, P, 4)

        if nb > block_chunk:
            pad_b = (-nb) % block_chunk
            nchunk = (nb + pad_b) // block_chunk

            def padc(x):
                cfg = [(0, 0)] * x.ndim
                cfg[1] = (0, pad_b)
                return jnp.pad(x, cfg)

            rows_p = padc(rows_k).reshape(J, nchunk, block_chunk, WR_G) \
                .transpose(1, 0, 2, 3)
            parts = [padc(x).reshape(J, nchunk, block_chunk, P)
                     .transpose(1, 0, 2, 3)
                     for x in (ix0, ix1, fx, wy0, fy)]
            res = jax.lax.map(chunk_fn, (rows_p, *parts))   # (nc, J, cb, P, 4)
            out = res.transpose(1, 0, 2, 3, 4).reshape(
                J, nchunk * block_chunk, P, 4)[:, :nb]
        else:
            out = chunk_fn((rows_k, ix0, ix1, fx, wy0, fy))
    out = out / 255.0                                   # (J, nb, P, 4)

    # sRGB decode (per job layer) + per-pixel job select.
    srgb = ((fl_j & 1) > 0)                             # (J, nb)
    dec = jnp.where(out <= 0.04045, out / 12.92,
                    jnp.power(jnp.maximum((out + 0.055) / 1.055, 1e-6), 2.4))
    out = jnp.where(srgb[:, :, None, None],
                    jnp.concatenate([dec[..., :3], out[..., 3:]], -1), out)
    out = jnp.where(jmask[..., None], out, 0.0)
    # Channel 0 merges its two disjoint-masked jobs; the rest keep rank 0.
    sel = out[:K].at[0].add(out[K])
    covered = mask.at[0].set(mask[0] | mask2[0])[..., None]
    out = jnp.where(covered, sel, 1.0).transpose(1, 2, 0, 3)  # (nb, P, K, 4)

    img = _unblockify(out, hp, wp)[:h, :w]              # (h, w, K, 4)
    img = img.transpose(2, 0, 1, 3)                     # (K, h, w, 4)
    if ds > 1 and upsample:
        img = jax.image.resize(img, (K, H, W, 4), method="bilinear")
    return img


def _tex_block_kernel(win_ref, wt_ref, out_ref, *, js: int,
                      wrows: int = WROWS):
    """Fused window evaluation for `js` block jobs per grid step.

    win_ref: (js, wrows, 128) u32 window rows (gathered; BC3 mode decodes
    block rows to these RGBA8 texel rows first);
    wt_ref:  (js, 8, P) f32 — row 0 = fractional x tap center in window
             lanes, row 1 = fractional y tap center in window rows;
    out_ref: (js, 4, P) f32 RGBA in [0, 255].

    Per job: unpack the 4 byte channels to bf16, build the two-tap bilinear
    weight rows with the hat identity, contract lanes on the MXU
    ((WROWS, 128) @ (128, P) per channel), then the y two-tap select +
    24-row group sums on the VPU. Everything stays in VMEM — the XLA
    formulation of the same math moves ~600 MB of intermediates through HBM.
    """
    # Mosaic iota must be integer-typed; cast after.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0).astype(
        jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1), 0).astype(
        jnp.float32)
    for j in range(js):
        w32 = win_ref[j]                               # (wrows, 128) u32
        x = wt_ref[j, 0:1, :]                          # (1, P)
        d = lanes - x                                  # (128, P)
        wx = (jnp.maximum(1.0 - jnp.abs(d), 0.0)
              + jnp.maximum(1.0 - jnp.abs(d + 128.0), 0.0)).astype(
                  jnp.bfloat16)
        yf = wt_ref[j, 1:2, :]                         # (1, P)
        wy = jnp.maximum(1.0 - jnp.abs(jj - yf), 0.0)  # (WROWS, P)
        outs = []
        for s in (0, 8, 16, 24):
            # Mosaic has no u32->bf16 cast; hop through i32/f32.
            bc = ((w32 >> s) & 0xFF).astype(jnp.int32).astype(
                jnp.float32).astype(jnp.bfloat16)           # (WROWS, 128)
            xr = jax.lax.dot_general(
                bc, wx, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,   # bf16 operands: the
                # package-wide 'highest' default would ask for an fp32
                # contract on bf16 vectors — Mosaic rejects that.
                preferred_element_type=jnp.float32)    # (WROWS, P)
            outs.append(jnp.sum(xr * wy, axis=0, keepdims=True))
        out_ref[j] = jnp.concatenate(outs, axis=0)     # (4, P)


def _blocked_kernel_eval(strips: jnp.ndarray, rows_k: jnp.ndarray,
                         x_hat: jnp.ndarray, yf: jnp.ndarray, P: int,
                         js: int = 8, interpret: bool = False,
                         decode=None, wrows: int = WROWS) -> jnp.ndarray:
    """Gather window rows (XLA row gather — cheap) and run the fused Mosaic
    evaluator. rows_k (J, nb, R); x_hat/yf (J, nb, P). `decode` maps the
    gathered (JN, R, 128) rows to (JN, wrows, 128) RGBA8 texel rows (BC3
    block decode); identity when None (R == wrows).
    Returns (J, nb, P, 4) f32 in [0, 255]."""
    J, nb, R = rows_k.shape
    JN = J * nb
    pad = (-JN) % js
    win = strips[rows_k.reshape(-1)].reshape(JN, R, 128)
    if decode is not None:
        win = decode(win)
    wt = jnp.stack([x_hat.reshape(JN, P), yf.reshape(JN, P)], axis=1)
    wt = jnp.pad(wt, ((0, pad), (0, 6), (0, 0)))       # (JN', 8, P)
    win = jnp.pad(win, ((0, pad), (0, 0), (0, 0)))
    steps = (JN + pad) // js

    out = pl.pallas_call(
        functools.partial(_tex_block_kernel, js=js, wrows=wrows),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((js, wrows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((js, 8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((js, 4, P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((JN + pad, 4, P), jnp.float32),
        interpret=interpret,
    )(win, wt)
    return out[:JN].transpose(0, 2, 1).reshape(J, nb, P, 4)


@functools.lru_cache(maxsize=None)
def strip_layout_bc(resolution: int) -> Tuple[Tuple[int, ...], int]:
    """(row offset of each mip, rows per layer) in the BC3 strip pyramid:
    rows are BLOCK rows (one row = 32 BC3 blocks = 128 texels x 4 texel
    rows, interleaved [a_lo, a_hi, c_ends, c_idx] per block). Mips below
    4 texels wrap-fill one block row."""
    sizes, _ = mip_layout(resolution)
    offs = []
    off = 0
    for sz in sizes:
        offs.append(off)
        nbr = max(sz // 4, 1)
        off += nbr if sz <= 128 else (sz // 64 - 1) * nbr
    return tuple(offs), off


def bc3_decode_rows(win: jnp.ndarray) -> jnp.ndarray:
    """(B, R, 128) u32 BC3 block rows -> (B, R*4, 128) u32 RGBA8-packed
    texel rows. Pure lane math, no gathers: the per-texel sub-x and
    texel-row indices are STATIC (block rows are 4-texel-aligned), so
    every bit extraction is a static-shift vector op. Matches
    models/texprocess.bc3_decode (encoder guarantees 4-color BC1 mode and
    8-step a0>=a1 BC4 mode)."""
    B, R, _ = win.shape
    w = win.reshape(B, R, 32, 4)

    def rep(x):   # one value per block -> its 4 texel lanes
        return jnp.repeat(x, 4, axis=-1)               # (B, R, 128)

    a_lo = rep(w[..., 0])
    a_hi = rep(w[..., 1])
    c_end = rep(w[..., 2])
    c_idx = rep(w[..., 3])
    a0 = (a_lo & 0xFF).astype(jnp.float32)
    a1 = ((a_lo >> 8) & 0xFF).astype(jnp.float32)
    low = (a_lo >> 16) | ((a_hi & 0xFFFF) << 16)       # alpha idx bits 0-31
    hi16 = a_hi >> 16                                  # alpha idx bits 32-47
    q0 = c_end & 0xFFFF
    q1 = c_end >> 16
    # RGB565 bit-replicating expand (same as texprocess._dequant565).
    r0 = ((q0 >> 11) & 31).astype(jnp.float32) * (255.0 / 31.0)
    g0 = ((q0 >> 5) & 63).astype(jnp.float32) * (255.0 / 63.0)
    b0 = (q0 & 31).astype(jnp.float32) * (255.0 / 31.0)
    r1 = ((q1 >> 11) & 31).astype(jnp.float32) * (255.0 / 31.0)
    g1 = ((q1 >> 5) & 63).astype(jnp.float32) * (255.0 / 63.0)
    b1 = (q1 & 31).astype(jnp.float32) * (255.0 / 31.0)
    sx = jnp.arange(128, dtype=jnp.int32) % 4          # (128,) static

    def q8(x):
        return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint32)

    rows = []
    for yy in range(4):
        t = 4 * yy + sx                                # (128,) static
        ci = (c_idx >> (2 * t)) & 3
        # 4-color palette weight of c0: [1, 0, 2/3, 1/3][ci].
        w0 = jnp.where(ci == 0, 1.0,
                       jnp.where(ci == 1, 0.0,
                                 jnp.where(ci == 2, 2.0 / 3.0, 1.0 / 3.0)))
        rr = q8(r0 * w0 + r1 * (1.0 - w0))
        gg = q8(g0 * w0 + g1 * (1.0 - w0))
        bb = q8(b0 * w0 + b1 * (1.0 - w0))
        bp = 3 * t                                     # static, 0..45
        ai = jnp.where(
            bp <= 29, (low >> bp) & 7,
            jnp.where(bp == 30,
                      ((low >> 30) & 3) | ((hi16 & 1) << 2),
                      (hi16 >> jnp.maximum(bp - 32, 0)) & 7)
        ).astype(jnp.float32)
        # 8-step palette: [a0, a1, lerp (8-k)/7 for k>=2].
        aa = q8(jnp.where(ai == 0.0, a0,
                          jnp.where(ai == 1.0, a1,
                                    (a0 * (8.0 - ai) + a1 * (ai - 1.0))
                                    * (1.0 / 7.0))))
        rows.append(rr | (gg << 8) | (bb << 16) | (aa << 24))
    return jnp.stack(rows, axis=2).reshape(B, R * 4, 128)


@functools.lru_cache(maxsize=None)
def _infer_strip_resolution(rows_per_layer: int) -> int:
    r = MIN_MIP
    while r <= 1 << 16:
        if strip_layout(r)[1] == rows_per_layer:
            return r
        r *= 2
    raise ValueError(f"no strip layout has {rows_per_layer} rows")


def infer_strip_resolution(rows_per_layer: int, fmt: str = "rgba8") -> int:
    """Atlas resolution from rows-per-layer for either strip format."""
    return (_infer_strip_resolution_bc(rows_per_layer) if fmt == "bc3"
            else _infer_strip_resolution(rows_per_layer))


@functools.lru_cache(maxsize=None)
def _infer_strip_resolution_bc(rows_per_layer: int) -> int:
    r = MIN_MIP
    while r <= 1 << 16:
        if strip_layout_bc(r)[1] == rows_per_layer:
            return r
        r *= 2
    raise ValueError(f"no BC3 strip layout has {rows_per_layer} rows")


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
    return apply_normal_map_sampled(normal, world_pos, uv, smp, normal_tex,
                                    normal_scale)


def apply_normal_map_sampled(normal: jnp.ndarray, world_pos: jnp.ndarray,
                             uv: jnp.ndarray, smp: jnp.ndarray,
                             normal_tex: jnp.ndarray,
                             normal_scale=1.0, frame=None) -> jnp.ndarray:
    """Tangent-frame perturbation from an already-sampled normal map `smp`
    (H, W, 4) — the variant the frame uses with the block-window sampler.

    `frame` = (T, B) supplies an explicit per-pixel tangent frame (the
    mikktspace vertex tangents, shade.tangent_from_theta) — exact on
    mirrored/atlased UVs where the derivative frame below breaks at seams
    (reference: src/Utilities/mikktspace.c feeding the vertex stream)."""
    n_ts = smp[..., :3] * 2.0 - 1.0
    n_ts = n_ts.at[..., :2].multiply(normal_scale)
    if frame is not None:
        t, b = frame
        n2 = (t * n_ts[..., 0:1] + b * n_ts[..., 1:2]
              + normal * n_ts[..., 2:3])
        n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True),
                              1e-9)
        return jnp.where((normal_tex >= 0)[..., None], n2, normal)

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


def wanted_mips(tex_flags: jnp.ndarray, tids: jnp.ndarray, u_ds: jnp.ndarray,
                v_ds: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Texture-streaming feedback: (N,) i32 FINEST mip each texture wants
    this frame (UNclamped by residency — the streamer compares against the
    resident level; reference: sampler-feedback-style texture streaming).
    tids (K, h, w) at sampling rate, u/v (h, w). Uses a broadcast-compare
    masked min over the small texture axis (no scatter)."""
    N = tex_flags.shape[0]
    sizes, _ = mip_layout(resolution)
    M = len(sizes)
    mipf = compute_mip(jnp.stack([u_ds, v_ds], -1), resolution, M)
    mip_i = jnp.round(mipf).astype(jnp.int32)[None]     # (1, h, w)
    flat_m = jnp.broadcast_to(mip_i, tids.shape).reshape(-1)
    flat_t = tids.reshape(-1)
    ids = jnp.arange(N, dtype=jnp.int32)[:, None]       # (N, 1)
    masked = jnp.where(flat_t[None, :] == ids, flat_m[None, :], M)
    return jnp.min(masked, axis=1).astype(jnp.int32)    # M = "not sampled"

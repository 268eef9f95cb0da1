"""Texture registry + packed mip-pyramid atlas.

Reference analogue: TextureFactory/Texture + TextureProcessingManager
(reference: BasicRenderer/src/Factories/TextureFactory.cpp,
src/Resources/Texture.cpp, TextureProcessingManager — GPU BC7 encode, mip
generation, streaming metadata). TPU redesign: all textures share one fixed
square resolution and live in a single flat atlas of RGBA8 texels PACKED
INTO uint32 words — one gathered word per sample tap (XLA gathers serialize,
so bytes-per-tap is the whole cost model; see ops/textures.py). Each layer
carries its full mip chain contiguously (mip offsets are static), the TPU
analogue of the reference's mip-chain subresources.

Color data is stored sRGB8 (like the reference's *_SRGB formats) and decoded
after the tap; data textures (normal/metallic-roughness) are stored linear —
a per-layer flag word tells the sampler which. No BC compression: RGBA8 is
already the decoded form BC7 produces, and HBM capacity is not the
bottleneck at these budgets.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..ops.textures import layer_words, mip_layout

FLAG_SRGB = 1


class TextureRegistry:
    def __init__(self, resolution: int = 256, processed_cache=None):
        self.resolution = resolution
        self.images: List[np.ndarray] = []   # (R, R, 4) f32 LINEAR
        self.srgb: List[bool] = []           # stored-encoding flag per layer
        self.alpha_cutoffs: List[float] = []  # >=0: MASK coverage-fix mips
        # Optional texprocess.ProcessedTextureCache the importers route
        # image bytes through (decode+resize+BC skip on hit).
        self.processed_cache = processed_cache

    def add(self, image: np.ndarray, srgb: bool = True,
            alpha_cutoff: float = -1.0) -> int:
        """Register an (H, W, 3|4) uint8/float image; returns texture id.
        `srgb=True` marks color data (decoded to linear here, re-encoded
        sRGB8 in the atlas); False marks data textures (normals, ORM).
        `alpha_cutoff >= 0` marks an alpha-MASK layer whose mip chain gets
        coverage-preserving alpha scaling (texprocess)."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
            if srgb:
                img = np.where(img <= 0.04045, img / 12.92,
                               ((img + 0.055) / 1.055) ** 2.4)
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, -1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
        self.images.append(_resize(img, self.resolution))
        self.srgb.append(bool(srgb))
        self.alpha_cutoffs.append(float(alpha_cutoff))
        return len(self.images) - 1

    def _downsample(self, level: np.ndarray, sz: int, layer: int
                    ) -> np.ndarray:
        """Half-res box filter + alpha-coverage fix for MASK layers."""
        out = level.reshape(sz // 2, 2, sz // 2, 2, 4).mean((1, 3))
        cutoff = self.alpha_cutoffs[layer]
        if cutoff >= 0.0:
            from .texprocess import alpha_coverage_scale
            ref = float(np.mean(self.images[layer][..., 3] > cutoff))
            s = alpha_coverage_scale(out[..., 3], cutoff, ref)
            out = out.copy()
            out[..., 3] = np.minimum(out[..., 3] * s, 1.0)
        return out

    def checkerboard(self, a=(0.9, 0.9, 0.9), b=(0.2, 0.2, 0.2),
                     squares: int = 8) -> int:
        r = self.resolution
        yy, xx = np.mgrid[0:r, 0:r]
        mask = ((yy * squares // r) + (xx * squares // r)) % 2 == 0
        img = np.where(mask[..., None], np.asarray(a, np.float32),
                       np.asarray(b, np.float32))
        return self.add(np.concatenate([img, np.ones((r, r, 1), np.float32)], -1),
                        srgb=False)

    def _layer_chain(self, i: int, sizes, offsets, S: int) -> np.ndarray:
        """One layer's flat packed mip chain (S,) uint32."""
        out = np.full((S,), 0xFFFFFFFF, np.uint32)
        level = self.images[i]
        for sz, off in zip(sizes, offsets):
            out[off:off + sz * sz] = _pack_rgba8(
                level, self.srgb[i]).reshape(-1)
            if sz > sizes[-1]:             # box-filter down (in linear space)
                level = self._downsample(level, sz, i)
        return out

    def pyramid(self, capacity: Optional[int] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (pyramid (N, S) uint32, flags (N,) int32). S is the flat
        per-layer mip chain length (ops/textures.mip_layout). Missing layers
        are opaque white. Layers build in parallel on the shared task pool
        (reference: TaskSchedulerManager import workers)."""
        n = capacity or max(len(self.images), 1)
        sizes, offsets = mip_layout(self.resolution)
        S = layer_words(self.resolution)
        pyr = np.full((n, S), 0xFFFFFFFF, np.uint32)
        flags = np.zeros((n,), np.int32)
        live = range(min(len(self.images), n))
        chains = self._map_layers(
            lambda i: self._layer_chain(i, sizes, offsets, S), live)
        for i, chain in zip(live, chains):
            flags[i] = FLAG_SRGB if self.srgb[i] else 0
            pyr[i] = chain
        return pyr, flags

    @staticmethod
    def _map_layers(fn, layers) -> list:
        layers = list(layers)
        if len(layers) < 4:                # pool overhead not worth it
            return [fn(i) for i in layers]
        from ..utils.taskpool import shared_pool
        return shared_pool().map(fn, layers)

    def strip_pyramid(self, capacity: Optional[int] = None,
                      fmt: str = "rgba8"
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Strip-layout atlas for the block-window sampler
        (ops/textures.sample_pyramid_blocked): every mip row is stored as
        128-texel strips at TWO x phases (0 and 64), so any 128-wide
        x window whose base is 64-aligned is ONE gathered row. Returns
        (strips (N * ROWS, 128) uint32, flags (N,) int32); row layout is
        given by strip_layout(resolution).

        fmt="bc3" stores BC3-COMPRESSED block rows instead (4x less HBM
        and 4x less sampler gather bandwidth; the sampler decodes blocks
        with pure lane math — ops/textures.bc3_decode_rows). One strip
        row = 32 BC3 blocks = a 128-texel x window by 4 texel rows;
        layout strip_layout_bc. Reference: compressed-at-rest VRAM
        textures (TextureProcessingManager + bc7_compress_mode6.hlsl —
        BC3 here; BC7 needs per-block mode search the TPU sampler would
        have to undo per tap)."""
        if fmt == "bc3":
            return self._strip_pyramid_bc3(capacity)
        from ..ops.textures import strip_layout
        n = capacity or max(len(self.images), 1)
        r = self.resolution
        sizes, _offsets = mip_layout(r)
        row_of_mip, rows_per_layer = strip_layout(r)
        strips = np.full((n * rows_per_layer, 128), 0xFFFFFFFF, np.uint32)
        flags = np.zeros((n,), np.int32)

        def one_layer(i: int) -> np.ndarray:
            out = np.full((rows_per_layer, 128), 0xFFFFFFFF, np.uint32)
            level = self.images[i]
            for m, sz in enumerate(sizes):
                packed = _pack_rgba8(level, self.srgb[i])   # (sz, sz)
                base = row_of_mip[m]
                if sz <= 128:
                    # Whole row fits one strip; tile x to fill 128 (wrap
                    # addressing comes free for REPEAT sampling).
                    reps = 128 // sz
                    out[base:base + sz] = np.tile(packed, (1, reps))
                else:
                    nph = sz // 64 - 1   # phases 0,64,...,sz-128
                    for ph in range(nph):
                        sl = packed[:, ph * 64: ph * 64 + 128]
                        out[base + ph * sz: base + (ph + 1) * sz] = sl
                if sz > sizes[-1]:
                    level = self._downsample(level, sz, i)
            return out

        live = range(min(len(self.images), n))
        for i, rows in zip(live, self._map_layers(one_layer, live)):
            flags[i] = FLAG_SRGB if self.srgb[i] else 0
            strips[i * rows_per_layer:(i + 1) * rows_per_layer] = rows
        return strips, flags

    def _strip_pyramid_bc3(self, capacity: Optional[int] = None
                           ) -> Tuple[np.ndarray, np.ndarray]:
        from ..ops.textures import strip_layout_bc
        from .texprocess import bc3_encode
        n = capacity or max(len(self.images), 1)
        r = self.resolution
        sizes, _offsets = mip_layout(r)
        row_of_mip, rows_per_layer = strip_layout_bc(r)
        strips = np.zeros((n * rows_per_layer, 128), np.uint32)
        flags = np.zeros((n,), np.int32)

        def band_rows(band_u8: np.ndarray) -> np.ndarray:
            """(4*R, 128, 4) u8 texel band -> (R, 128) u32 interleaved
            BC3 block rows ([a_lo, a_hi, c_ends, c_idx] per block)."""
            blocks = bc3_encode(band_u8)                 # (R*32, 16) u8
            w = np.ascontiguousarray(blocks).view('<u4') # (R*32, 4)
            return w.reshape(-1, 128)

        def encode_u8(level: np.ndarray, srgb: bool) -> np.ndarray:
            rgb = level[..., :3]
            if srgb:
                rgb = np.where(rgb <= 0.0031308, rgb * 12.92,
                               1.055 * np.maximum(rgb, 1e-8) ** (1 / 2.4)
                               - 0.055)
            q = np.clip(np.concatenate([rgb, level[..., 3:]], -1)
                        * 255.0 + 0.5, 0, 255).astype(np.uint8)
            return q

        def one_layer(i: int) -> np.ndarray:
            out = np.zeros((rows_per_layer, 128), np.uint32)
            level = self.images[i]
            for m, sz in enumerate(sizes):
                img8 = encode_u8(level, self.srgb[i])    # (sz, sz, 4) u8
                base = row_of_mip[m]
                nbr = max(sz // 4, 1)
                if sz <= 128:
                    ys = np.arange(4 * nbr) % sz         # wrap-fill tiny
                    xs = np.arange(128) % sz             # mips and tile x
                    out[base:base + nbr] = band_rows(img8[ys][:, xs])
                else:
                    nph = sz // 64 - 1
                    for ph in range(nph):
                        band = img8[:, ph * 64: ph * 64 + 128]
                        out[base + ph * nbr: base + (ph + 1) * nbr] = \
                            band_rows(band)
                if sz > sizes[-1]:
                    level = self._downsample(level, sz, i)
            return out

        live = range(min(len(self.images), n))
        for i, rows in zip(live, self._map_layers(one_layer, live)):
            flags[i] = FLAG_SRGB if self.srgb[i] else 0
            strips[i * rows_per_layer:(i + 1) * rows_per_layer] = rows
        return strips, flags

    def __len__(self):
        return len(self.images)


def _pack_rgba8(img: np.ndarray, srgb: bool) -> np.ndarray:
    """(H, W, 4) f32 linear -> (H, W) uint32 packed (R | G<<8 | B<<16 | A<<24),
    rgb sRGB-encoded when flagged."""
    rgb = img[..., :3]
    if srgb:
        rgb = np.where(rgb <= 0.0031308, rgb * 12.92,
                       1.055 * np.maximum(rgb, 1e-8) ** (1 / 2.4) - 0.055)
    q = np.clip(np.concatenate([rgb, img[..., 3:]], -1) * 255.0 + 0.5,
                0, 255).astype(np.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)


def _resize(img: np.ndarray, r: int) -> np.ndarray:
    """Area-average resize to (r, r) — correct for both down- and upscale
    is overkill; downscale uses box binning, upscale nearest."""
    h, w = img.shape[:2]
    if (h, w) == (r, r):
        return img
    if h >= r and w >= r and h % r == 0 and w % r == 0:
        return img.reshape(r, h // r, r, w // r, -1).mean((1, 3))
    ys = (np.arange(r) * (h / r)).astype(np.int32).clip(0, h - 1)
    xs = (np.arange(r) * (w / r)).astype(np.int32).clip(0, w - 1)
    return img[ys][:, xs]

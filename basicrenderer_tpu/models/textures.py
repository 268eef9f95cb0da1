"""Texture registry + layered atlas.

Reference analogue: TextureFactory/Texture + TextureProcessingManager
(reference: BasicRenderer/src/Factories/TextureFactory.cpp,
src/Resources/Texture.cpp, TextureProcessingManager — GPU BC7, mips,
streaming metadata). TPU redesign: textures live in one fixed-shape
LAYERED atlas (N, R, R, 4) f32 — the layer index IS the texture id, so
sampling needs no rect packing and a texture's address is computable from
(id, uv) alone. Mip 1 of every layer is kept in a second half-res atlas
(R/2) for the reduced-rate sampling path (TPU gathers are the bottleneck;
see ops/textures.py).

No BC compression (TPU reads f32/bf16 natively); the reference's
processed-texture disk cache is unnecessary since atlas building is a
one-time numpy resize.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class TextureRegistry:
    def __init__(self, resolution: int = 256):
        self.resolution = resolution
        self.images: List[np.ndarray] = []

    def add(self, image: np.ndarray, srgb: bool = True) -> int:
        """Register an (H, W, 3|4) uint8/float image; returns texture id."""
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
        return len(self.images) - 1

    def checkerboard(self, a=(0.9, 0.9, 0.9), b=(0.2, 0.2, 0.2),
                     squares: int = 8) -> int:
        r = self.resolution
        yy, xx = np.mgrid[0:r, 0:r]
        mask = ((yy * squares // r) + (xx * squares // r)) % 2 == 0
        img = np.where(mask[..., None], np.asarray(a, np.float32),
                       np.asarray(b, np.float32))
        return self.add(np.concatenate([img, np.ones((r, r, 1), np.float32)], -1),
                        srgb=False)

    def atlas(self, capacity: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (mip0 (N, R, R, 4), mip1 (N, R/2, R/2, 4)) f32 atlases."""
        n = capacity or max(len(self.images), 1)
        r = self.resolution
        a0 = np.zeros((n, r, r, 4), np.float32)
        a0[..., :] = 1.0  # missing texture = white
        for i, img in enumerate(self.images[:n]):
            a0[i] = img
        a1 = a0.reshape(n, r // 2, 2, r // 2, 2, 4).mean((2, 4))
        return a0, a1

    def __len__(self):
        return len(self.images)


def _resize(img: np.ndarray, r: int) -> np.ndarray:
    h, w = img.shape[:2]
    if (h, w) == (r, r):
        return img
    ys = (np.arange(r) * (h / r)).astype(np.int32).clip(0, h - 1)
    xs = (np.arange(r) * (w / r)).astype(np.int32).clip(0, w - 1)
    return img[ys][:, xs]

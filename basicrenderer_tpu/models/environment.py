"""Environment (HDRI) management: precompute + caching.

Reference analogue: EnvironmentManager (reference:
BasicRenderer/src/Managers/EnvironmentManager.cpp — equirect->cubemap, SH
coefficients, prefiltered specular cubemaps, with filtered results cached to
disk via the readback path). Here precompute runs in jnp once per
environment and results are cached to an .npz next to the source (the
reference's ProcessedTextureCache/readback-cache analogue).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops import ibl

CACHE_DIR = os.path.expanduser("~/.cache/basicrenderer_tpu/env")
SPEC_RES = 64   # all prefiltered mips resampled to this (mip = lerp index)
SPEC_MIPS = 5


class Environment:
    def __init__(self, sh: np.ndarray, spec_mips: np.ndarray, name: str = ""):
        self.sh = sh                # (9, 3)
        self.spec_mips = spec_mips  # (SPEC_MIPS, 6, SPEC_RES, SPEC_RES, 3)
        self.name = name

    @staticmethod
    def precompute(equirect_or_cubemap: np.ndarray, name: str = "",
                   cubemap_res: int = 128, use_cache: bool = True
                   ) -> "Environment":
        arr = np.asarray(equirect_or_cubemap, np.float32)
        key = None
        if use_cache:
            key = hashlib.sha1(arr.tobytes()).hexdigest()[:16]
            path = os.path.join(CACHE_DIR, f"{key}.npz")
            if os.path.exists(path):
                z = np.load(path)
                return Environment(z["sh"], z["spec"], name)
        if arr.ndim == 3:                      # equirect (H, W, 3)
            cube = ibl.equirect_to_cubemap(jnp.asarray(arr), cubemap_res)
        else:                                  # (6, R, R, 3) cubemap
            cube = jnp.asarray(arr)
        sh = np.asarray(ibl.project_sh(cube))
        mips = ibl.prefilter_specular(cube, mips=SPEC_MIPS)
        import jax
        spec = np.stack([
            np.asarray(jax.image.resize(m, (6, SPEC_RES, SPEC_RES, 3), "linear"))
            for m in mips])
        if use_cache and key is not None:
            os.makedirs(CACHE_DIR, exist_ok=True)
            np.savez(os.path.join(CACHE_DIR, f"{key}.npz"), sh=sh, spec=spec)
        return Environment(sh.astype(np.float32), spec.astype(np.float32), name)

    @staticmethod
    def from_hdr(path: str, cubemap_res: int = 128,
                 use_cache: bool = True) -> "Environment":
        """Load a Radiance .hdr equirect panorama (reference: TextureFactory
        HDR path feeding EnvironmentManager) and precompute SH + prefilter."""
        from .texprocess import load_hdr
        with open(path, "rb") as f:
            img = load_hdr(f.read())
        return Environment.precompute(img, name=os.path.basename(path),
                                      cubemap_res=cubemap_res,
                                      use_cache=use_cache)

    @staticmethod
    def procedural(intensity: float = 1.0, sun_dir=(-0.45, -1.0, -0.3),
                   res: int = 128) -> "Environment":
        cube = np.asarray(ibl.make_procedural_environment(res, intensity, sun_dir))
        return Environment.precompute(cube.reshape(6, res, res, 3),
                                      name="procedural", use_cache=True)

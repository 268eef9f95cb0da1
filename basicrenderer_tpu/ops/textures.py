"""Runtime texture sampling from the layered atlas.

Reference analogue: bindless SRV sampling in the material-evaluation shaders
(reference: VisUtilEvaluate.hlsl / gbuffer.hlsl texture fetches through the
descriptor heap). TPU constraint: XLA gathers serialize (~9 ns/row measured),
so full-res multi-tap sampling is unaffordable. The design:

- sample at 1/downscale resolution, NEAREST tap from the half-res (mip 1)
  atlas layer, bilinearly upsample the RESULT image — with the atlas mips
  prefiltered this behaves like trilinear-at-mip1 quality at 1/4 - 1/16 of
  the gather cost;
- pixels without a texture (id < 0) pass their material factor through
  unchanged, so untextured scenes pay nothing but the (cheap) blend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_layered_atlas(atlas: jnp.ndarray, tex_id: jnp.ndarray,
                         uv: jnp.ndarray, downscale: int = 2) -> jnp.ndarray:
    """atlas: (N, R, R, 4); tex_id: (H, W) i32 (-1 = none); uv: (H, W, 2).
    Returns (H, W, 4) with white (1,1,1,1) where tex_id < 0."""
    N, R = atlas.shape[0], atlas.shape[1]
    H, W = tex_id.shape
    tid = tex_id[::downscale, ::downscale]
    st = uv[::downscale, ::downscale]
    u = jnp.mod(st[..., 0], 1.0)
    v = jnp.mod(st[..., 1], 1.0)
    ui = jnp.clip((u * R).astype(jnp.int32), 0, R - 1)
    vi = jnp.clip((v * R).astype(jnp.int32), 0, R - 1)
    layer = jnp.clip(tid, 0, N - 1)
    flat = atlas.reshape(-1, 4)
    smp = flat[(layer * R + vi) * R + ui]                  # the ONE gather
    smp = jnp.where((tid >= 0)[..., None], smp, 1.0)
    if downscale > 1:
        smp = jax.image.resize(smp, (H, W, 4), method="bilinear")
    return smp

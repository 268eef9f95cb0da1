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


def _ddx(img):
    return jnp.concatenate([img[:, 1:] - img[:, :-1], img[:, -1:] * 0], axis=1)


def _ddy(img):
    return jnp.concatenate([img[1:] - img[:-1], img[-1:] * 0], axis=0)


def apply_normal_map(normal: jnp.ndarray, world_pos: jnp.ndarray,
                     uv: jnp.ndarray, atlas: jnp.ndarray,
                     normal_tex: jnp.ndarray, normal_scale=1.0,
                     downscale: int = 2) -> jnp.ndarray:
    """Perturb G-buffer normals with a tangent-space normal map.

    The tangent frame is reconstructed from SCREEN-SPACE DERIVATIVES of
    world position and UV (the classic deferred-renderer trick — equivalent
    to what ddx/ddy give the reference's pixel shaders), so the raster
    payload needs no tangent channels. All derivative math is shifted-image
    arithmetic — fully vectorized, no gathers beyond the one texture tap.
    """
    smp = sample_layered_atlas(atlas, normal_tex, uv, downscale)
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

"""Image-based lighting: environment precompute + runtime ambient terms.

Reference analogue: the environment pipeline (reference:
shaders/envToCubemap.hlsl equirect->cubemap, sphericalHarmonics.hlsl SH
projection, specularIBL.hlsl GGX prefilter, brdfIntegration.hlsl split-sum
LUT, skybox.hlsl; orchestrated by EnvironmentManager — EnvironmentManager.h:
20-94 — with results cached to disk).

TPU mapping:
- Precompute (once per environment, off the frame path): pure jnp — XLA
  gathers are acceptable here.
- Runtime diffuse: SH irradiance evaluation — closed-form polynomial per
  pixel, zero gathers (the reference evaluates the same 9-coefficient SH).
- Runtime specular: the split-sum environment BRDF uses the Karis analytic
  fit instead of the 2D LUT (a per-pixel LUT fetch would serialize on TPU);
  the prefiltered radiance comes from a LOW-RESOLUTION cubemap sampled at
  configurable fraction of screen resolution and bilinearly upsampled —
  prefiltered mips are low-frequency, so quarter/half-res sampling is
  visually lossless while cutting the (expensive) per-pixel gather 4-16x.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Cubemap helpers. Faces ordered +X,-X,+Y,-Y,+Z,-Z (D3D order like the ref).
# ---------------------------------------------------------------------------

def face_directions(res: int) -> jnp.ndarray:
    """(6, res, res, 3) unit direction for each cubemap texel center."""
    t = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * 2.0 - 1.0
    v, u = jnp.meshgrid(t, t, indexing="ij")   # v = down the face rows
    one = jnp.ones_like(u)
    faces = [
        jnp.stack([one, -v, -u], -1),    # +X
        jnp.stack([-one, -v, u], -1),    # -X
        jnp.stack([u, one, v], -1),      # +Y
        jnp.stack([u, -one, -v], -1),    # -Y
        jnp.stack([u, -v, one], -1),     # +Z
        jnp.stack([-u, -v, -one], -1),   # -Z
    ]
    d = jnp.stack(faces)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def sample_equirect(equirect: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample an equirect (H, W, 3) image along (..., 3) dirs.
    Precompute-only (uses XLA gathers)."""
    H, W = equirect.shape[:2]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    u = (jnp.arctan2(x, -z) / (2 * jnp.pi) + 0.5) * W - 0.5
    v = (jnp.arccos(jnp.clip(y, -1, 1)) / jnp.pi) * H - 0.5
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    flat = equirect.reshape(-1, 3)

    def tex(ui, vi):
        ui = jnp.mod(ui, W)
        vi = jnp.clip(vi, 0, H - 1)
        return flat[vi * W + ui]

    c = (tex(u0, v0) * ((1 - fu) * (1 - fv))[..., None]
         + tex(u0 + 1, v0) * (fu * (1 - fv))[..., None]
         + tex(u0, v0 + 1) * ((1 - fu) * fv)[..., None]
         + tex(u0 + 1, v0 + 1) * (fu * fv)[..., None])
    return c


def equirect_to_cubemap(equirect: jnp.ndarray, res: int = 128) -> jnp.ndarray:
    """(H, W, 3) equirect -> (6, res, res, 3) cubemap (precompute)."""
    return sample_equirect(equirect, face_directions(res))


# ---------------------------------------------------------------------------
# Spherical harmonics irradiance (reference: sphericalHarmonics.hlsl)
# ---------------------------------------------------------------------------

def _sh_basis(d):
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        0.282095 * jnp.ones_like(x),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3 * z * z - 1.0),
        1.092548 * x * z, 0.546274 * (x * x - y * y),
    ], axis=-1)


def project_sh(cubemap: jnp.ndarray) -> jnp.ndarray:
    """Cubemap radiance -> 9 RGB SH coefficients with solid-angle weights."""
    res = cubemap.shape[1]
    d = face_directions(res)
    t = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * 2.0 - 1.0
    v, u = jnp.meshgrid(t, t, indexing="ij")
    # Solid angle of a cube face texel: dw = du*dv / (1+u^2+v^2)^(3/2).
    tmp = 1.0 + u * u + v * v
    dw = (2.0 / res) ** 2 / (jnp.sqrt(tmp) * tmp)
    dw = jnp.broadcast_to(dw, (6, res, res))
    basis = _sh_basis(d)                                   # (6, R, R, 9)
    coeffs = jnp.einsum("frcb,frc,frck->bk", basis, dw, cubemap)
    return coeffs                                          # (9, 3)


def eval_sh_irradiance(sh: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Convolved irradiance E(n) from radiance SH (Ramamoorthi-Hanrahan
    cosine-lobe weights) -> (..., 3) linear irradiance / pi (diffuse)."""
    A = jnp.array([3.141593, 2.094395, 2.094395, 2.094395,
                   0.785398, 0.785398, 0.785398, 0.785398, 0.785398],
                  jnp.float32)
    basis = _sh_basis(normals)                             # (..., 9)
    e = jnp.einsum("...b,b,bk->...k", basis, A, sh)
    return jnp.maximum(e, 0.0) / jnp.pi


# ---------------------------------------------------------------------------
# GGX prefilter (reference: specularIBL.hlsl) — precompute
# ---------------------------------------------------------------------------

def _hammersley(n):
    i = np.arange(n)
    bits = i.astype(np.uint32)
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    return np.stack([i / n, bits.astype(np.float64) * 2.3283064365386963e-10], -1)


def prefilter_specular(cubemap: jnp.ndarray, mips: int = 5, samples: int = 64
                       ) -> List[jnp.ndarray]:
    """GGX importance-sampled prefiltered radiance mips (precompute).
    Returns list of (6, r, r, 3), r halving per mip; mip m ~ roughness
    m/(mips-1)."""
    base = cubemap.shape[1]
    out = []
    for m in range(mips):
        r = max(base >> m, 8)
        rough = m / max(mips - 1, 1)
        dirs = face_directions(r)                          # N = R (= V)
        if rough < 1e-3:
            out.append(equirect_like_resample(cubemap, dirs))
            continue
        xi = jnp.asarray(_hammersley(samples), jnp.float32)
        a = rough * rough
        phi = 2 * jnp.pi * xi[:, 0]
        cos_t = jnp.sqrt((1 - xi[:, 1]) / (1 + (a * a - 1) * xi[:, 1]))
        sin_t = jnp.sqrt(jnp.maximum(1 - cos_t ** 2, 0))
        hx = sin_t * jnp.cos(phi)
        hy = sin_t * jnp.sin(phi)
        hz = cos_t                                          # (S,)
        n = dirs[..., None, :]                              # (6,r,r,1,3)
        up = jnp.where(jnp.abs(n[..., 2:3]) < 0.999,
                       jnp.array([0, 0, 1.0]), jnp.array([1.0, 0, 0]))
        tgx = jnp.cross(up, n)
        tgx = tgx / jnp.maximum(jnp.linalg.norm(tgx, axis=-1, keepdims=True), 1e-9)
        tgy = jnp.cross(n, tgx)
        h = (tgx * hx[:, None] + tgy * hy[:, None] + n * hz[:, None])
        v = n
        l = 2.0 * jnp.sum(v * h, -1, keepdims=True) * h - v  # (6,r,r,S,3)
        ndl = jnp.maximum(l[..., 2:3] * 0 + jnp.sum(n * l, -1, keepdims=True), 0.0)
        rad = sample_cubemap_precompute(cubemap, l)          # (6,r,r,S,3)
        col = jnp.sum(rad * ndl, axis=-2) / jnp.maximum(jnp.sum(ndl, axis=-2), 1e-4)
        out.append(col)
    return out


def sample_cubemap_precompute(cubemap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel cubemap sample along (..., 3) dirs (precompute-only)."""
    res = cubemap.shape[1]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # Select face.
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(is_x, jnp.where(x > 0, 0, 1),
                     jnp.where(is_y, jnp.where(y > 0, 2, 3),
                               jnp.where(z > 0, 4, 5)))
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    # Face-local (u, v) matching face_directions.
    u = jnp.where(is_x, jnp.where(x > 0, -z, z),
                  jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
    uu = (u / jnp.maximum(ma, 1e-9) + 1.0) * 0.5 * res - 0.5
    vv = (v / jnp.maximum(ma, 1e-9) + 1.0) * 0.5 * res - 0.5
    ui = jnp.clip(jnp.round(uu).astype(jnp.int32), 0, res - 1)
    vi = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, res - 1)
    flat = cubemap.reshape(-1, 3)
    return flat[(face * res + vi) * res + ui]


def equirect_like_resample(cubemap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    return sample_cubemap_precompute(cubemap, dirs)


def env_brdf_karis(n_dot_v: jnp.ndarray, roughness: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Karis mobile analytic fit of the split-sum environment BRDF (scale,
    bias) — replaces the 2D LUT (brdfIntegration.hlsl) to avoid per-pixel
    LUT gathers."""
    c0 = jnp.array([-1.0, -0.0275, -0.572, 0.022], jnp.float32)
    c1 = jnp.array([1.0, 0.0425, 1.04, -0.04], jnp.float32)
    r = roughness[..., None] * c0 + c1
    a004 = jnp.minimum(r[..., 0] * r[..., 0],
                       jnp.exp2(-9.28 * n_dot_v)) * r[..., 0] + r[..., 1]
    scale = a004 * -1.04 + r[..., 2]
    bias = a004 * 1.04 + r[..., 3]
    return scale, bias


def make_procedural_environment(res: int = 128, intensity: float = 1.0,
                                sun_dir=(-0.45, -1.0, -0.3)):
    """Bake the procedural gradient sky (ops/shade.procedural_sky) plus a sun
    disk into a cubemap — keeps IBL consistent with the background when no
    HDRI is loaded."""
    d = face_directions(res)
    t = jnp.clip(d[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    horizon = jnp.array([0.45, 0.55, 0.70], jnp.float32)
    zenith = jnp.array([0.10, 0.25, 0.55], jnp.float32)
    ground = jnp.array([0.18, 0.16, 0.14], jnp.float32)
    sky = horizon * (1 - t) + zenith * t
    col = jnp.where(d[..., 1:2] >= 0.0, sky, ground) * intensity
    sun = -jnp.asarray(sun_dir, jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    cd = jnp.sum(d * sun, -1, keepdims=True)
    col = col + jnp.where(cd > 0.9995, 50.0, 0.0) * jnp.array([1.0, 0.95, 0.85])
    return col


def runtime_specular_ibl(normals: jnp.ndarray, view_dirs: jnp.ndarray,
                         roughness: jnp.ndarray, env_mips: jnp.ndarray,
                         downscale: int = 2) -> jnp.ndarray:
    """Low-res prefiltered-radiance lookup, bilinearly upsampled.

    normals/view_dirs: (H, W, 3); env_mips: (M, 6, r, r, 3) stacked at one
    resolution r (mips pre-resampled to equal size so mip selection is a
    lerp, not a shape change). Returns (H, W, 3) prefiltered radiance."""
    from .shadows import downsample2d
    H, W = roughness.shape
    h, w = H // downscale, W // downscale
    # Strided [::ds, ::ds] slices of channel-minor (H, W, 3) images compile
    # to gather fusions (~1 ms each at 1080p); downsample per 2-D plane via
    # the reshape point-slice instead.
    n = jnp.stack([downsample2d(normals[..., c], downscale)
                   for c in range(3)], axis=-1)
    v = jnp.stack([downsample2d(view_dirs[..., c], downscale)
                   for c in range(3)], axis=-1)
    rg = downsample2d(roughness, downscale)
    r_refl = 2.0 * jnp.sum(n * v, -1, keepdims=True) * n - v
    M = env_mips.shape[0]
    mip_f = jnp.clip(rg * (M - 1), 0, M - 1)
    m0 = jnp.floor(mip_f).astype(jnp.int32)
    fm = (mip_f - m0)[..., None]
    # Sample the two surrounding mips (low-res gathers).
    res = env_mips.shape[2]
    flat = env_mips.reshape(-1, 3)

    def samp(mi):
        x, y, z = r_refl[..., 0], r_refl[..., 1], r_refl[..., 2]
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        is_x = (ax >= ay) & (ax >= az)
        is_y = (ay > ax) & (ay >= az)
        face = jnp.where(is_x, jnp.where(x > 0, 0, 1),
                         jnp.where(is_y, jnp.where(y > 0, 2, 3),
                                   jnp.where(z > 0, 4, 5)))
        ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
        u = jnp.where(is_x, jnp.where(x > 0, -z, z),
                      jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
        vv = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
        ui = jnp.clip(jnp.round((u / jnp.maximum(ma, 1e-9) + 1) * 0.5 * res - 0.5
                                ).astype(jnp.int32), 0, res - 1)
        vi = jnp.clip(jnp.round((vv / jnp.maximum(ma, 1e-9) + 1) * 0.5 * res - 0.5
                                ).astype(jnp.int32), 0, res - 1)
        return flat[((mi * 6 + face) * res + vi) * res + ui]

    c = samp(m0) * (1 - fm) + samp(jnp.minimum(m0 + 1, M - 1)) * fm
    # Bilinear upsample back to full res.
    c = jax.image.resize(c, (H, W, 3), method="bilinear")
    return c

"""Visibility-buffer resolve + deferred PBR shading.

TPU-native equivalent of the reference's VisUtil material evaluation +
deferred shading (reference: shaders/VisUtilEvaluate.hlsl:10-36 —
EvaluateMaterialGroupCS decodes barycentrics and writes the GBuffer;
shaders/deferred.hlsl:11-40 + PBR.hlsli + lighting.hlsli — full-screen
Cook-Torrance with clustered lights).

Differences from the reference, by design:
- The reference histograms pixels by material and runs one indirect dispatch
  per material group. On TPU, divergence has no warp cost inside vectorized
  selects, so a single fused resolve over the whole image (material params
  gathered per pixel) is both simpler and faster; a per-tile material
  specialization pass is a later optimization.
- Barycentrics come from the triangle's normalized edge planes (computed in
  raster_setup) evaluated at the pixel center, then perspective-corrected
  with per-vertex 1/w — the same math VisUtil.hlsl uses.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import SceneBuffers, ViewData
from ..models.materials import MAT_STRIDE
from .raster_setup import TriangleSetup


class GBuffer(NamedTuple):
    """Reference analogue: the GBuffer targets created in
    RenderGraphBuildHelper.h:37-220 (albedo, normals, metal-rough, emissive,
    world pos is reconstructed from depth there; we carry it directly)."""
    world_pos: jnp.ndarray   # (H, W, 3) f32
    normal: jnp.ndarray      # (H, W, 3) f32 (world space, normalized)
    albedo: jnp.ndarray      # (H, W, 3) f32 (linear)
    metallic: jnp.ndarray    # (H, W) f32
    roughness: jnp.ndarray   # (H, W) f32
    emissive: jnp.ndarray    # (H, W, 3) f32
    valid: jnp.ndarray       # (H, W) bool (covered by geometry)
    depth: jnp.ndarray       # (H, W) f32 (reverse-Z NDC)
    material_id: jnp.ndarray # (H, W) i32
    uv: jnp.ndarray          # (H, W, 2) f32
    alpha: jnp.ndarray = None  # (H, W) f32 material base alpha (OIT)
    base_tex: jnp.ndarray = None  # (H, W) i32 base-color texture id (-1 none)
    normal_tex: jnp.ndarray = None  # (H, W) i32 normal texture id (-1 none)
    mr_tex: jnp.ndarray = None      # (H, W) i32 metallic-roughness tex id
    emissive_tex: jnp.ndarray = None  # (H, W) i32 emissive texture id
    coat_weight: jnp.ndarray = None   # (H, W) f32 OpenPBR coat weight
    coat_rough: jnp.ndarray = None    # (H, W) f32 coat roughness
    normal_scale: jnp.ndarray = None  # (H, W) f32 glTF normalTexture.scale
    object_id: jnp.ndarray = None     # (H, W) i32 owning object (-1 = sky)
    fuzz_weight: jnp.ndarray = None   # (H, W) f32 OpenPBR fuzz weight
    fuzz_rough: jnp.ndarray = None    # (H, W) f32 OpenPBR fuzz roughness
    trans_weight: jnp.ndarray = None  # (H, W) f32 OpenPBR transmission
    trans_color: jnp.ndarray = None   # (H, W, 3) f32 transmission tint
    trans_depth: jnp.ndarray = None   # (H, W) f32 Beer-Lambert depth
    sss_weight: jnp.ndarray = None    # (H, W) f32 OpenPBR subsurface
    sss_color: jnp.ndarray = None     # (H, W, 3) f32 subsurface tint
    sss_radius: jnp.ndarray = None    # (H, W) f32 wrap-diffusion width
    aniso_strength: jnp.ndarray = None  # (H, W) f32 GGX anisotropy
    aniso_rotation: jnp.ndarray = None  # (H, W) f32 tangent rotation (rad)
    ior: jnp.ndarray = None           # (H, W) f32 index of refraction
    tangent_theta: jnp.ndarray = None  # (H, W) f32 encoded mikktspace
    #                                   tangent (tangent_from_theta); only
    #                                   meaningful under
    #                                   FrameConfig.enable_vertex_tangents


def resolve_gbuffer(vis: jnp.ndarray, depth: jnp.ndarray,
                    setup_edges: jnp.ndarray, setup_inv_w: jnp.ndarray,
                    scene: SceneBuffers, world_positions: jnp.ndarray,
                    world_normals: jnp.ndarray, row0=0, col0=0) -> GBuffer:
    """Per-pixel visibility-id -> interpolated surface attributes.

    vis/depth are the *cropped* (H, W) framebuffers; `world_positions` /
    `world_normals` are the per-vertex world-space arrays from the vertex
    stage (so skinning, when enabled, is already applied). `row0`/`col0`
    offset pixel coordinates when shading a screen-space shard (multi-chip
    tile sharding, parallel/tile_sharding.py).
    """
    H, W = vis.shape
    tri = jnp.maximum(vis - 1, 0)                     # (H, W)
    covered = vis > 0

    tri_flat = tri.reshape(-1)
    vid = scene.indices[tri_flat]                     # (HW, 3)
    mat_id = scene.tri_material[tri_flat]             # (HW,)

    # Barycentric weights from normalized edge planes at pixel centers.
    px = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5 + col0).reshape(-1)
    py = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5 + row0).reshape(-1)
    e = setup_edges[tri_flat]                         # (HW, 3, 3)
    b = e[:, :, 0] * px[:, None] + e[:, :, 1] * py[:, None] + e[:, :, 2]  # (HW, 3)
    # Perspective correction: weight by 1/w and renormalize.
    iw = setup_inv_w[tri_flat]                        # (HW, 3)
    bw = b * iw
    denom = jnp.sum(bw, axis=-1, keepdims=True)
    bary = bw / jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)

    def interp(attr):                                  # attr: (V, C)
        a = attr[vid]                                  # (HW, 3, C)
        return jnp.sum(a * bary[..., None], axis=1)    # (HW, C)

    wp = interp(world_positions).reshape(H, W, 3)
    nrm = interp(world_normals)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    nrm = nrm.reshape(H, W, 3)
    uv = interp(scene.uvs).reshape(H, W, 2)

    # Material params (textures land with the texture-atlas milestone; base
    # factors already give full material variety for the procedural scenes).
    mat = scene.material_table[mat_id]                # (HW, MAT_STRIDE)
    albedo = mat[:, 0:3].reshape(H, W, 3)
    metallic = mat[:, 4].reshape(H, W)
    roughness = mat[:, 5].reshape(H, W)
    emissive = mat[:, 6:9].reshape(H, W, 3)

    zero3 = jnp.zeros((H, W, 3), jnp.float32)
    c3 = covered[..., None]
    return GBuffer(
        world_pos=jnp.where(c3, wp, zero3),
        normal=jnp.where(c3, nrm, zero3),
        albedo=jnp.where(c3, albedo, zero3),
        metallic=jnp.where(covered, metallic, 0.0),
        roughness=jnp.where(covered, roughness, 1.0),
        emissive=jnp.where(c3, emissive, zero3),
        valid=covered,
        depth=depth,
        material_id=jnp.where(covered, mat_id.reshape(H, W), -1),
        uv=jnp.where(c3[..., :2], uv, 0.0),
    )


def oct_decode_cols(ou, ov):
    """Octahedral (ou, ov) in [-1, 1] -> unit normal component planes
    (inverse of raster_setup.oct_encode_cols; the raster interpolates the
    encoded coordinates perspective-correctly)."""
    z = 1.0 - jnp.abs(ou) - jnp.abs(ov)
    t = jnp.maximum(-z, 0.0)
    x = ou - jnp.where(ou >= 0.0, t, -t)
    y = ov - jnp.where(ov >= 0.0, t, -t)
    rl = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * rl, y * rl, z * rl


def _onb(n: jnp.ndarray):
    """Branchless canonical ONB of a unit normal (Duff et al. / revised
    Frisvad) — MUST match scene/bridge._tangent_theta's numpy twin."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t0 = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]],
                   -1)
    b0 = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t0, b0


def tangent_from_theta(n: jnp.ndarray, enc: jnp.ndarray):
    """Decode the per-tri mikktspace tangent angle (+4pi = w < 0; encoded
    by scene/bridge._tangent_theta) against the INTERPOLATED pixel normal.
    Returns (T, B) each (..., 3), orthonormal to n, B carrying the
    handedness (reference: mikktspace.c per-wedge frames)."""
    neg = enc > 2.0 * jnp.pi
    w = jnp.where(neg, -1.0, 1.0)
    theta = enc - jnp.where(neg, 4.0 * jnp.pi, 0.0)
    t0, b0 = _onb(n)
    t = jnp.cos(theta)[..., None] * t0 + jnp.sin(theta)[..., None] * b0
    t = t - n * jnp.sum(t * n, -1, keepdims=True)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    return t, jnp.cross(n, t) * w[..., None]


def inv_w_from_depth(depth: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """1/clip.w recovered from the depth buffer — exactly.

    For any perspective projection of the math3d form (clip.z = A*vz + B,
    clip.w = P32*vz), z_ndc = A/P32 + B*(1/w) per clip-space POINT, and
    both the rasterized z and the old 1/w channel were screen-affine
    interpolations of per-vertex values satisfying that same relation, so
    (z - za)/zb reproduces the interpolated 1/w bit-for-fp-bit. This frees
    the raster kernels' 1/w plane (3 vector ops/hit row + 3 payload lanes;
    ops/raster_setup.py lane layout)."""
    za = proj[2, 2] / jnp.where(jnp.abs(proj[3, 2]) > 1e-20,
                                proj[3, 2], 1.0)
    zb = jnp.where(jnp.abs(proj[2, 3]) > 1e-20, proj[2, 3], 1.0)
    return (depth - za) / zb


def gbuffer_from_channels(channels: jnp.ndarray, depth: jnp.ndarray,
                          vis: jnp.ndarray, view: ViewData,
                          material_table: jnp.ndarray,
                          full_w: int, full_h: int, row0=0) -> GBuffer:
    """Build the GBuffer from resolve-pass channel images (no gathers).

    channels: (8, H, W) = [octu/w, octv/w, u/w, v/w, mat_id, tangent,
    unused, accum] cropped to the visible region (1/w derives from
    `depth`; normals decode from the two octahedral channels).
    `full_w/full_h` are the full framebuffer dimensions (differ from H/W
    when shading a screen shard at `row0`).
    """
    H, W = depth.shape
    covered = vis > 0
    inv_w = inv_w_from_depth(depth, view.proj)
    safe_iw = jnp.where(jnp.abs(inv_w) > 1e-12, inv_w, 1.0)
    nrm = jnp.stack(oct_decode_cols(channels[0] / safe_iw,
                                    channels[1] / safe_iw), axis=-1)
    uv = jnp.stack([channels[2] / safe_iw, channels[3] / safe_iw], axis=-1)
    # Lane 10 carries material + OBJ_COMBO * object (ops/raster_setup.py);
    # the object id rides along for the motion-vector pass.
    from .raster_setup import OBJ_COMBO
    combo = jnp.round(channels[4]).astype(jnp.int32)
    mat_id = combo % OBJ_COMBO
    object_id = combo // OBJ_COMBO
    tangent_theta = channels[5]

    # World position from depth (reverse-Z NDC) + inverse viewproj
    # (column math — see math3d.mat4_columns TPU note).
    from ..utils import math3d
    ndc_x = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5) / full_w * 2.0 - 1.0
    ndc_y = 1.0 - (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5 + row0) / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    wx, wy, wz, ww = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, depth)
    iw = 1.0 / jnp.where(jnp.abs(ww) > 1e-12, ww, 1.0)
    wp = jnp.stack([wx * iw, wy * iw, wz * iw], axis=-1)

    # Material params via one-hot MXU lookup (XLA row-gather serializes).
    from .raster_setup import gather_rows_onehot
    flat_ids = jnp.clip(mat_id.reshape(-1), 0, material_table.shape[0] - 1)
    mat = gather_rows_onehot(material_table, flat_ids)    # (HW, MAT_STRIDE)
    albedo = mat[:, 0:3].reshape(H, W, 3)
    alpha = mat[:, 3].reshape(H, W)
    metallic = mat[:, 4].reshape(H, W)
    roughness = mat[:, 5].reshape(H, W)
    emissive = mat[:, 6:9].reshape(H, W, 3)

    zero3 = jnp.zeros((H, W, 3), jnp.float32)
    c3 = covered[..., None]
    return GBuffer(
        world_pos=jnp.where(c3, wp, zero3),
        normal=jnp.where(c3, nrm, zero3),
        albedo=jnp.where(c3, albedo, zero3),
        metallic=jnp.where(covered, metallic, 0.0),
        roughness=jnp.where(covered, roughness, 1.0),
        emissive=jnp.where(c3, emissive, zero3),
        valid=covered,
        depth=depth,
        material_id=jnp.where(covered, mat_id, -1),
        uv=jnp.where(c3[..., :2], uv, 0.0),
        alpha=jnp.where(covered, alpha, 0.0),
        base_tex=jnp.where(covered, jnp.round(mat[:, 13]).astype(jnp.int32)
                           .reshape(H, W), -1),
        normal_tex=jnp.where(covered, jnp.round(mat[:, 14]).astype(jnp.int32)
                             .reshape(H, W), -1),
        mr_tex=jnp.where(covered, jnp.round(mat[:, 15]).astype(jnp.int32)
                         .reshape(H, W), -1),
        emissive_tex=jnp.where(covered, jnp.round(mat[:, 16]).astype(jnp.int32)
                               .reshape(H, W), -1),
        coat_weight=jnp.where(covered, mat[:, 18].reshape(H, W), 0.0),
        coat_rough=jnp.clip(mat[:, 19].reshape(H, W), 0.05, 1.0),
        normal_scale=jnp.where(covered, mat[:, 9].reshape(H, W), 1.0),
        object_id=jnp.where(covered, object_id, -1),
        fuzz_weight=jnp.where(covered, mat[:, 22].reshape(H, W), 0.0),
        fuzz_rough=jnp.clip(mat[:, 23].reshape(H, W), 0.05, 1.0),
        trans_weight=jnp.where(covered, mat[:, 30].reshape(H, W), 0.0),
        trans_color=jnp.where(c3, mat[:, 32:35].reshape(H, W, 3), 1.0),
        trans_depth=jnp.maximum(mat[:, 31].reshape(H, W), 1e-4),
        sss_weight=jnp.where(covered, mat[:, 36].reshape(H, W), 0.0),
        sss_color=jnp.where(c3, mat[:, 37:40].reshape(H, W, 3), 1.0),
        sss_radius=jnp.clip(mat[:, 40].reshape(H, W), 0.0, 1.0),
        aniso_strength=jnp.where(covered, mat[:, 41].reshape(H, W), 0.0),
        aniso_rotation=mat[:, 42].reshape(H, W),
        ior=jnp.where(covered, mat[:, 12].reshape(H, W), 1.5),
        tangent_theta=tangent_theta,
    )


# ---------------------------------------------------------------------------
# GGX / Cook-Torrance BRDF (reference: shaders/Include/PBR.hlsli)
# ---------------------------------------------------------------------------

def _d_ggx(n_dot_h, alpha):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-8)


def _g_smith(n_dot_v, n_dot_l, alpha):
    # Height-correlated Smith visibility (matches UE4/reference's PBR.hlsli)
    a2 = alpha * alpha
    gv = n_dot_l * jnp.sqrt(jnp.maximum(n_dot_v * n_dot_v * (1 - a2) + a2, 1e-12))
    gl = n_dot_v * jnp.sqrt(jnp.maximum(n_dot_l * n_dot_l * (1 - a2) + a2, 1e-12))
    return 0.5 / jnp.maximum(gv + gl, 1e-8)


def _f_schlick(v_dot_h, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - v_dot_h, 0.0, 1.0), 5.0)


def tangent_frame(world_pos: jnp.ndarray, uv: jnp.ndarray,
                  normal: jnp.ndarray, rotation=None):
    """Screen-derivative cotangent frame (Schueler), optionally rotated
    about the normal by `rotation` (H, W) radians — the anisotropy tangent
    (reference: OpenPBR anisotropy rotation, ShaderBuffers.h:277-334).
    Returns (T, B) each (H, W, 3); degenerate UV areas fall back to an
    arbitrary normal-orthogonal frame."""
    from .textures import _ddx, _ddy
    dpdx, dpdy = _ddx(world_pos), _ddy(world_pos)
    dudx, dudy = _ddx(uv[..., 0]), _ddy(uv[..., 0])
    dvdx, dvdy = _ddx(uv[..., 1]), _ddy(uv[..., 1])
    det = dudx * dvdy - dudy * dvdx
    t = dpdx * dvdy[..., None] - dpdy * dvdx[..., None]
    t = t - normal * jnp.sum(t * normal, -1, keepdims=True)
    tlen = jnp.linalg.norm(t, axis=-1, keepdims=True)
    # Arbitrary fallback frame where UVs are degenerate.
    up = jnp.where(jnp.abs(normal[..., 1:2]) < 0.9,
                   jnp.array([0.0, 1.0, 0.0], jnp.float32),
                   jnp.array([1.0, 0.0, 0.0], jnp.float32))
    alt = jnp.cross(up * jnp.ones_like(normal), normal)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True),
                            1e-9)
    ok = (jnp.abs(det) > 1e-12) & (tlen[..., 0] > 1e-9)
    t = jnp.where(ok[..., None], t / jnp.maximum(tlen, 1e-9), alt)
    b = jnp.cross(normal, t)
    if rotation is not None:
        c = jnp.cos(rotation)[..., None]
        s = jnp.sin(rotation)[..., None]
        t = t * c + b * s
        b = jnp.cross(normal, t)
    return t, b


def eval_brdf(n, v, l, albedo, metallic, roughness, spec_scale=None,
              sss=None, trans_w=None, aniso=None):
    """Cook-Torrance specular + Lambert diffuse; all (..., 3)/(...,) arrays.
    Returns radiance factor to multiply by (light color * NdotL).
    `spec_scale` (..., 3) multiplies the specular lobe only — the
    Kulla-Conty multi-scatter compensation term (ops/brdf_energy.py).
    OpenPBR extensions (reference ShaderBuffers.h:277-334):
    - `sss` = (weight, color3, radius): wrap-diffusion subsurface replaces
      the Lambert term by weight (light bleeds past the terminator by the
      radius, tinted — the diffusion-approximation analogue).
    - `trans_w` (H, W): transmission weight removes the diffuse lobe (the
      light passes through; ops/oit.py tints the background instead).
    - `aniso` = (T, B, strength): anisotropic GGX along the tangent frame.
    """
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    ndl_s = jnp.sum(n * l, -1, keepdims=True)
    n_dot_l = jnp.maximum(ndl_s, 0.0)
    n_dot_v = jnp.maximum(jnp.sum(n * v, -1, keepdims=True), 1e-4)
    n_dot_h = jnp.maximum(jnp.sum(n * h, -1, keepdims=True), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(v * h, -1, keepdims=True), 0.0)
    alpha = jnp.maximum(roughness[..., None] ** 2, 1e-3)
    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    F = _f_schlick(v_dot_h, f0)
    if aniso is not None:
        T, B, strength = aniso
        # Burley parameterization; Heitz height-correlated anisotropic
        # visibility (same lobes the reference's PBR.hlsli family uses).
        s = jnp.clip(strength, 0.0, 0.98)[..., None]
        ax = jnp.maximum(alpha * (1.0 + s), 1e-3)
        ay = jnp.maximum(alpha * (1.0 - s), 1e-3)
        t_h = jnp.sum(T * h, -1, keepdims=True)
        b_h = jnp.sum(B * h, -1, keepdims=True)
        t_v = jnp.sum(T * v, -1, keepdims=True)
        b_v = jnp.sum(B * v, -1, keepdims=True)
        t_l = jnp.sum(T * l, -1, keepdims=True)
        b_l = jnp.sum(B * l, -1, keepdims=True)
        d = (t_h / ax) ** 2 + (b_h / ay) ** 2 + n_dot_h ** 2
        D = 1.0 / jnp.maximum(jnp.pi * ax * ay * d * d, 1e-8)
        lv = n_dot_l * jnp.sqrt(jnp.maximum(
            (t_v * ax) ** 2 + (b_v * ay) ** 2 + n_dot_v ** 2, 1e-12))
        ll = n_dot_v * jnp.sqrt(jnp.maximum(
            (t_l * ax) ** 2 + (b_l * ay) ** 2 + n_dot_l ** 2, 1e-12))
        Vis = 0.5 / jnp.maximum(lv + ll, 1e-8)
    else:
        D = _d_ggx(n_dot_h, alpha)
        Vis = _g_smith(n_dot_v, n_dot_l, alpha)
    specular = D * Vis * F
    if spec_scale is not None:
        specular = specular * spec_scale
    kd = (1.0 - F) * (1.0 - metallic[..., None])
    diffuse = kd * albedo / jnp.pi * n_dot_l
    if sss is not None:
        w8, scol, rad = sss
        # Wrap-diffusion: terminator softens by the radius; the wrapped
        # region is tinted by the subsurface color (normalized so the
        # hemisphere integral matches Lambert — furnace stays white for
        # scol = 1).
        wrap = jnp.clip(rad, 0.0, 1.0)[..., None]
        wrapped = jnp.clip((ndl_s + wrap) / ((1.0 + wrap) ** 2), 0.0, 1.0)
        sss_d = kd * albedo * scol / jnp.pi * wrapped
        diffuse = diffuse + w8[..., None] * (sss_d - diffuse)
    if trans_w is not None:
        diffuse = diffuse * (1.0 - trans_w[..., None])
    return diffuse + specular * n_dot_l


def apply_coat(base: jnp.ndarray, gb: GBuffer, n: jnp.ndarray,
               v: jnp.ndarray, l: jnp.ndarray, radiance: jnp.ndarray
               ) -> jnp.ndarray:
    """OpenPBR clear-coat: a second GGX lobe at the coat roughness over an
    attenuated base (reference: OpenPBR canonicalization in
    MaterialManager.cpp + PerMaterialOpenPBRCB, ShaderBuffers.h:139-361).
    Coat F0 ~0.05 (ior 1.6); energy: base *= (1 - Fc * weight)."""
    w = gb.coat_weight[..., None]
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    n_dot_l = jnp.maximum(jnp.sum(n * l, -1, keepdims=True), 0.0)
    n_dot_v = jnp.maximum(jnp.sum(n * v, -1, keepdims=True), 1e-4)
    n_dot_h = jnp.maximum(jnp.sum(n * h, -1, keepdims=True), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(v * h, -1, keepdims=True), 0.0)
    alpha = jnp.maximum(gb.coat_rough[..., None] ** 2, 1e-3)
    Fc = _f_schlick(v_dot_h, jnp.float32(0.05))
    spec = _d_ggx(n_dot_h, alpha) * _g_smith(n_dot_v, n_dot_l, alpha) * Fc
    return base * (1.0 - Fc * w) + spec * n_dot_l * radiance * w


def openpbr_terms(gb: GBuffer, v: jnp.ndarray, n: jnp.ndarray,
                  energy: bool, fuzz: bool):
    """Light-independent OpenPBR factors, computed ONCE per frame and
    shared by every light pass: the Kulla-Conty specular compensation
    (..., 3) and the fuzz layer's directional albedo (H, W). Each is a
    fitted-polynomial FMA chain (ops/brdf_energy.py) — cheap, no gathers."""
    from . import brdf_energy
    ndv = jnp.maximum(jnp.sum(n * v, -1), 1e-4)
    spec_comp = None
    if energy:
        f0 = 0.04 * (1.0 - gb.metallic[..., None]) \
            + gb.albedo * gb.metallic[..., None]
        spec_comp = brdf_energy.energy_compensation(f0, ndv, gb.roughness)
    fuzz_e = None
    if fuzz and gb.fuzz_weight is not None:
        fuzz_e = gb.fuzz_weight * brdf_energy.sheen_energy(ndv, gb.fuzz_rough)
    return spec_comp, fuzz_e


def shade_one_light(gb: GBuffer, row: jnp.ndarray, v: jnp.ndarray,
                    n: jnp.ndarray, directional_only: bool = False,
                    coat: bool = False, spec_comp=None,
                    fuzz_e=None, sss=None, trans_w=None,
                    aniso=None) -> jnp.ndarray:
    """Full-screen contribution of ONE packed light row (H, W, 3).
    Shared by the deferred loop and the shadowed-local-light pass.
    `spec_comp`/`fuzz_e` are the precomputed light-independent OpenPBR
    factors from openpbr_terms()."""
    lpos, ltype = row[0:3], row[3]
    ldir, intensity = row[4:7], row[7]
    color, rng = row[8:11], row[11]
    cos_in, cos_out = row[12], row[13]
    is_dir = ltype == 0.0
    to_light = jnp.where(is_dir, -ldir[None, None, :],
                         lpos[None, None, :] - gb.world_pos)
    dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
    l = to_light / jnp.maximum(dist, 1e-9)
    # Inverse-square falloff with range window (reference lighting.hlsli).
    att = jnp.where(is_dir, 1.0, 1.0 / jnp.maximum(dist * dist, 1e-4))
    window = jnp.clip(1.0 - (dist / jnp.maximum(rng, 1e-3)) ** 4, 0.0, 1.0) ** 2
    att = jnp.where(is_dir, att, att * window)
    # Spot cone.
    cd = jnp.sum(-l * ldir[None, None, :], axis=-1, keepdims=True)
    spot = jnp.clip((cd - cos_out) / jnp.maximum(cos_in - cos_out, 1e-4), 0.0, 1.0)
    att = jnp.where(ltype == 2.0, att * spot * spot, att)
    radiance = color[None, None, :] * (intensity * att)
    brdf = eval_brdf(n, v, l, gb.albedo, gb.metallic, gb.roughness,
                     spec_scale=spec_comp, sss=sss, trans_w=trans_w,
                     aniso=aniso)
    out = brdf * radiance
    if fuzz_e is not None:
        # OpenPBR fuzz: Charlie-sheen lobe layered OVER the base, which is
        # attenuated by the layer's directional albedo (energy conserving
        # to within the LUT fit).
        from . import brdf_energy
        sheen = brdf_energy.eval_sheen(n, v, l, gb.fuzz_rough) \
            * gb.fuzz_weight[..., None]
        out = out * (1.0 - fuzz_e[..., None]) + sheen * radiance
    if coat and gb.coat_weight is not None:
        out = apply_coat(out, gb, n, v, l, radiance)
    if directional_only:
        # Local lights are handled by the tiled Pallas pass
        # (ops/lighting.py); only type-0 lights shade here.
        out = out * jnp.where(ltype == 0.0, 1.0, 0.0)
    return out


def shade_deferred(gb: GBuffer, scene: SceneBuffers, view: ViewData,
                   shadow_fn=None, ambient: float = 0.0,
                   max_lights: int = 0, directional_only: bool = False,
                   coat: bool = False, energy: bool = False,
                   fuzz: bool = False, sss: bool = False,
                   aniso: bool = False,
                   transmission: bool = False) -> jnp.ndarray:
    """Full-screen deferred lighting -> HDR (H, W, 3).

    `shadow_fn(light_index, world_pos, normal) -> (H, W) visibility` is
    injected by the frame graph when shadows are enabled. `max_lights` bounds
    the light loop statically (0 = use the full table scanned via fori_loop).
    Reference analogue: deferred.hlsl main loop over clustered light lists.
    """
    H, W = gb.valid.shape
    v = view.cam_pos[None, None, :] - gb.world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    n = gb.normal
    spec_comp, fuzz_e = openpbr_terms(gb, v, n, energy, fuzz)
    # Light-independent OpenPBR extension inputs, computed once and shared
    # by every light (reference: PerMaterialOpenPBRCB consumption in
    # PBR.hlsli; lobes ride the analytic-light path like coat/fuzz — the
    # tiled local-light kernel keeps the base BRDF).
    sss_t = (gb.sss_weight, gb.sss_color, gb.sss_radius) \
        if sss and gb.sss_weight is not None else None
    trans_t = gb.trans_weight \
        if transmission and gb.trans_weight is not None else None
    aniso_t = None
    if aniso and gb.aniso_strength is not None:
        T, B = tangent_frame(gb.world_pos, gb.uv, n, gb.aniso_rotation)
        aniso_t = (T, B, gb.aniso_strength)

    def light_contrib(i):
        out = shade_one_light(gb, scene.lights[i], v, n,
                              directional_only=directional_only, coat=coat,
                              spec_comp=spec_comp, fuzz_e=fuzz_e,
                              sss=sss_t, trans_w=trans_t, aniso=aniso_t)
        if shadow_fn is not None:
            vis = shadow_fn(i, gb.world_pos, n)
            out = out * vis[..., None]
        return out

    # Directional lights are packed first in the table; a directional-only
    # pass loops just that prefix (the tiled pass covers positional lights).
    bound = scene.num_dir_lights if directional_only else scene.num_lights
    if max_lights > 0:
        total = jnp.zeros((H, W, 3), jnp.float32)
        for i in range(max_lights):
            total = total + jnp.where(i < bound, 1.0, 0.0) * light_contrib(i)
    else:
        def body(i, acc):
            return acc + light_contrib(i)
        total = jax.lax.fori_loop(0, bound, body,
                                  jnp.zeros((H, W, 3), jnp.float32))

    total = total + gb.emissive + ambient * gb.albedo
    return jnp.where(gb.valid[..., None], total, 0.0)


# ---------------------------------------------------------------------------
# Tonemapping + sky (reference: Tonemapping.h AMD LPM path + skybox.hlsl)
# ---------------------------------------------------------------------------

def aces_tonemap(hdr: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz ACES fit (reference offers LPM/ACES variants)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = hdr
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.4) - 0.055)


def procedural_sky(view: ViewData, H: int, W: int, intensity=1.0,
                   row0=0, full_h: int = None) -> jnp.ndarray:
    """Simple gradient sky for pixels with no geometry (placeholder until the
    IBL skybox pass; reference: skybox.hlsl samples the environment cubemap).
    `row0`/`full_h` place an (H, W) screen-row shard inside the full frame
    (parallel/tile_sharding.py)."""
    if full_h is None:
        full_h = H
    # Reconstruct per-pixel view ray from the inverse viewproj.
    x = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5) / W * 2.0 - 1.0
    y = 1.0 - (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5 + row0) \
        / full_h * 2.0
    from ..utils import math3d
    inv_vp = jnp.linalg.inv(view.viewproj)
    wx, wy, wz, ww = math3d.mat4_columns(
        inv_vp, x, y, jnp.full((H, W), 0.5, jnp.float32))
    iw = 1.0 / jnp.where(jnp.abs(ww) > 1e-9, ww, 1.0)
    dx = wx * iw - view.cam_pos[0]
    dy = wy * iw - view.cam_pos[1]
    dz = wz * iw - view.cam_pos[2]
    inv_len = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-9)
    dirs = jnp.stack([dx * inv_len, dy * inv_len, dz * inv_len], axis=-1)
    t = jnp.clip(dirs[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    horizon = jnp.array([0.45, 0.55, 0.70], jnp.float32)
    zenith = jnp.array([0.10, 0.25, 0.55], jnp.float32)
    ground = jnp.array([0.18, 0.16, 0.14], jnp.float32)
    sky = horizon * (1 - t) + zenith * t
    col = jnp.where(dirs[..., 1:2] >= 0.0, sky, ground)
    return col * intensity

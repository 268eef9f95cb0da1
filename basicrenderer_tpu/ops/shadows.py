"""Cascaded shadow maps for directional lights.

Reference analogue: LightManager's directional cascades + shadow views
(reference: BasicRenderer/src/Managers/LightManager.cpp — shadow cameras via
ViewManager, cascade splits in PerFrameCB; shadows.hlsli sampling). Virtual
shadow maps (the reference's clipmapped VSM stack) layer on top of this in a
later milestone; CSM is the base path the reference also keeps.

TPU design notes:
- Each cascade is a depth-only run of the same binning + Pallas raster used
  for the main view (one FrameConfig specialization at shadow resolution).
- Screen-space sampling is the expensive part on TPU (XLA gathers
  serialize): the shadow term is evaluated at 1/downscale resolution with a
  single compare tap per pixel, bilinearly upsampled, then smoothed 3x3 —
  i.e. filtering happens on the *result mask* (cheap vectorized shifts)
  instead of multi-tap PCF (N gathers).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig, SceneBuffers, ViewData
from ..utils import math3d
from . import raster_setup
from .raster_pallas import raster_tiles_pallas
from .raster_ref import raster_tiles_ref


def shadow_config(config: FrameConfig) -> FrameConfig:
    """FrameConfig specialization for cascade rendering."""
    res = config.shadow_resolution
    return dataclasses.replace(
        config, width=res, height=res, enable_occlusion=False,
        near_clip_tris=0,   # ortho cascades: w == 1, nothing ever crosses
        max_pairs=min(config.max_pairs, 1 << 17),
        # Ortho shadow views bin the budgeted caster set; capping the
        # per-triangle span keeps the bin sort at ~0.5M keys per cascade
        # (K=32 here was ~1/3 of the old 45 ms CSM cost).
        max_tiles_per_tri=min(config.max_tiles_per_tri, 8))


def cascade_matrices(view: ViewData, light_dir: jnp.ndarray, num_cascades: int,
                     near: float = 0.1, max_dist: float = 60.0,
                     lam: float = 0.7) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit one ortho viewproj per cascade around exponential view-frustum
    slices (practical split scheme). Returns (vps (K, 4, 4), splits (K,))
    where splits[k] is the far view-distance of cascade k."""
    inv_vp = jnp.linalg.inv(view.viewproj)
    ks = jnp.arange(1, num_cascades + 1, dtype=jnp.float32) / num_cascades
    uniform = near + (max_dist - near) * ks
    logd = near * (max_dist / near) ** ks
    splits = lam * logd + (1 - lam) * uniform            # (K,)

    d = light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-9)
    up = jnp.where(jnp.abs(d[1]) < 0.95,
                   jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    s = jnp.cross(up, -d)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-9)
    u = jnp.cross(-d, s)
    # Light rotation (world->light view, looking down +d).
    R = jnp.stack([s, u, -d])                            # (3, 3)

    # Frustum slice corners in world space: unproject the 8 NDC corners of
    # each slice. Reverse-Z NDC: z = near/dist for slice boundaries.
    prev = jnp.concatenate([jnp.array([near], jnp.float32), splits[:-1]])

    def corners(dist):
        z = near / dist                                   # reverse-Z NDC
        ndc = jnp.array([[x, y, 1.0, 1.0] for x in (-1, 1) for y in (-1, 1)],
                        jnp.float32)
        ndc = ndc.at[:, 2].set(z)
        wpos = ndc @ inv_vp.T
        return wpos[:, :3] / wpos[:, 3:]

    vps = []
    for k in range(num_cascades):
        pts = jnp.concatenate([corners(prev[k]), corners(splits[k])])  # (8,3)
        lp = pts @ R.T                                     # light space
        mn = lp.min(0)
        mx = lp.max(0)
        pad = (mx - mn) * 0.05 + 1e-3
        mn = mn - pad
        # Light-space z = -d.p grows TOWARD the light (R's third row is -d),
        # so out-of-slice casters between the slice and the light live at
        # z > mx[2]: extend the far bound toward the light to capture them.
        mx = mx + pad + jnp.array([0, 0, 50.0])
        # Ortho: x' in [-1,1], y' in [-1,1], z' reverse-style in [0,1] with
        # 1 = nearest to light — matching the raster's reverse-Z max-keep
        # resolve and the `z + bias >= map` visibility test in
        # sample_shadow_cascades.
        sx = 2.0 / (mx[0] - mn[0])
        sy = 2.0 / (mx[1] - mn[1])
        sz = 1.0 / (mx[2] - mn[2])
        proj = jnp.array([
            [1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0],
        ], jnp.float32)
        proj = proj.at[0, 0].set(sx).at[0, 3].set(-(mx[0] + mn[0]) / (mx[0] - mn[0]))
        proj = proj.at[1, 1].set(sy).at[1, 3].set(-(mx[1] + mn[1]) / (mx[1] - mn[1]))
        proj = proj.at[2, 2].set(sz).at[2, 3].set(-mn[2] * sz)
        Rw = jnp.zeros((4, 4), jnp.float32).at[:3, :3].set(R).at[3, 3].set(1.0)
        vps.append(proj @ Rw)
    return jnp.stack(vps), splits


def render_cascade(scene: SceneBuffers, cascade_vp: jnp.ndarray,
                   config: FrameConfig, compacted=None) -> jnp.ndarray:
    """Depth-only raster of shadow casters from a cascade's viewproj.
    `compacted` = (indices, material, object, valid, overflow) from the
    cluster compaction (virtualized-geometry path). Returns (res', res')
    reverse-style depth (1 = nearest to light)."""
    scfg = shadow_config(config)
    if compacted is not None:
        lanes, bbox, valid, _ovf = raster_setup.setup_from_compacted(
            scene, compacted, cascade_vp, scfg)
    else:
        clip, _ = raster_setup.transform_vertices(
            scene.positions, scene.vert_object, scene.object_mats, cascade_vp)
        clip = jax.lax.optimization_barrier(clip)
        lanes, bbox, valid, _ovf = raster_setup.triangle_setup_packed(
            clip, scene.indices, scene.tri_object >= 0, scfg, None, None,
            None)
    bin_fn = raster_setup.bin_clustered if compacted is not None \
        else raster_setup.bin_pairs
    pairs = bin_fn(lanes, bbox, valid, scfg)
    if config.use_pallas_raster:
        depth, _, _ = raster_tiles_pallas(pairs, scfg,
                                          interpret=config.pallas_interpret)
    else:
        depth, _ = raster_tiles_ref(pairs, scfg)
    return depth


def downsample2d(x: jnp.ndarray, ds: int) -> jnp.ndarray:
    """(H, W) -> (H//ds, W//ds) point sample. Profiled: `x[::ds, ::ds]`
    compiles to a GATHER fusion on TPU (~5-6 ms at 1080p/3-chan); one
    combined reshape-index is ~2.3 ms; splitting into a ROW slice (fully
    contiguous) then a column select on the quarter-size result is
    ~1.05 ms. Only 2D planes should ever be downsampled — never (H, W, 3)
    images."""
    if ds == 1:
        return x
    h, w = x.shape
    rows = x.reshape(h // ds, ds, w)[:, 0]
    return rows.reshape(h // ds, w // ds, ds)[:, :, 0]


def sample_shadow_cascades(depth: jnp.ndarray, view, cascade_vps: jnp.ndarray,
                           shadow_maps: jnp.ndarray, bias: jnp.ndarray,
                           downscale: int = 2, row0: int = 0,
                           full_h: int = None) -> jnp.ndarray:
    """(H, W) shadow visibility in [0, 1] from the DEPTH buffer.

    depth: (H, W) reverse-Z NDC (the full gathered frame when sharded);
    cascade_vps (K, 4, 4); shadow_maps (K, R', R') from render_cascade.
    Receivers are unprojected from downsampled depth in column math — the
    profiler showed downsampling (H, W, 3) world-pos/normal images costs
    more than the entire rest of the pass. Slope bias comes from the
    light-space depth gradient (receiver-plane bias, shadows.hlsli's role),
    computed with cheap low-res shifts. One combined gather samples all
    cascades. Result upsampled + 3x3-smoothed.
    """
    H, W = depth.shape
    full_h = full_h or H
    K, Rp = shadow_maps.shape[0], shadow_maps.shape[1]
    d = downsample2d(depth, downscale)
    h, w = d.shape
    ds = downscale

    # Unproject at low res (column math; see math3d.mat4_columns TPU note).
    ndc_x = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5) \
        / W * 2.0 - 1.0
    ndc_y = 1.0 - (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds
                   + 0.5 + row0) / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    px, py, pz, pw = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, d)
    iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
    px, py, pz = px * iw, py * iw, pz * iw

    # Geometric normal from low-res world-pos gradients (column math):
    # drives the NORMAL-OFFSET bias below. Depth-only bias cannot fix
    # curved receivers — the depth range inside ONE shadow texel exceeds
    # any sane constant, so smooth spheres acne (caught by the ray-traced
    # ground-truth suite). Offsetting the receiver ~1.5 texels along the
    # surface normal is the standard fix (reference shadows.hlsli family).
    def _g(a, axis):
        app = a[:, -1:] if axis == 1 else a[-1:]
        return jnp.diff(a, axis=axis, append=app)

    txx, txy, txz = _g(px, 1), _g(py, 1), _g(pz, 1)
    tyx, tyy, tyz = _g(px, 0), _g(py, 0), _g(pz, 0)
    gnx = txy * tyz - txz * tyy
    gny = txz * tyx - txx * tyz
    gnz = txx * tyy - txy * tyx
    gnl = jnp.maximum(jnp.sqrt(gnx * gnx + gny * gny + gnz * gnz), 1e-20)
    gnx, gny, gnz = gnx / gnl, gny / gnl, gnz / gnl
    # Face the camera (gradient orientation is view-dependent).
    cx, cy, cz = view.cam_pos[0], view.cam_pos[1], view.cam_pos[2]
    face = gnx * (cx - px) + gny * (cy - py) + gnz * (cz - pz)
    sgn = jnp.where(face < 0.0, -1.0, 1.0)
    gnx, gny, gnz = gnx * sgn, gny * sgn, gnz * sgn

    flat_maps = shadow_maps.reshape(-1)
    sel_idx = jnp.zeros((h, w), jnp.int32)
    sel_z = jnp.zeros((h, w), jnp.float32)
    sel_bias = jnp.zeros((h, w), jnp.float32)
    chosen = jnp.zeros((h, w), bool)
    for k in range(K):
        # Normal-offset by ~1.5 shadow texels (world size from the
        # cascade's NDC scale: x_ndc spans 2 over Rp texels).
        scale_k = jnp.linalg.norm(cascade_vps[k, 0, :3])
        off = 1.5 * 2.0 / (Rp * jnp.maximum(scale_k, 1e-12))
        x, y, z, _w4 = math3d.mat4_columns(
            cascade_vps[k], px + gnx * off, py + gny * off, pz + gnz * off)
        inside = (jnp.abs(x) < 0.99) & (jnp.abs(y) < 0.99) & (z > 0) & (z < 1)
        use = inside & ~chosen
        u = jnp.clip(((x * 0.5 + 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
        v = jnp.clip(((0.5 - y * 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
        # Receiver-plane slope bias: light-depth change per shadow texel,
        # from screen-space gradients of the light-space coordinates.
        dzdx = jnp.abs(jnp.diff(z, axis=1, append=z[:, -1:]))
        dzdy = jnp.abs(jnp.diff(z, axis=0, append=z[-1:]))
        texels_x = jnp.abs(jnp.diff(x, axis=1, append=x[:, -1:])) * Rp * 0.5
        texels_y = jnp.abs(jnp.diff(y, axis=0, append=y[-1:])) * Rp * 0.5
        slope = (dzdx + dzdy) / jnp.maximum(texels_x + texels_y, 0.5)
        sel_bias = jnp.where(use, bias + jnp.minimum(slope * 2.0, 20.0 * bias),
                             sel_bias)
        sel_idx = jnp.where(use, (k * Rp + v) * Rp + u, sel_idx)
        sel_z = jnp.where(use, z, sel_z)
        chosen = chosen | inside
    smp = flat_maps[sel_idx]                              # the ONE gather
    # Reverse-style: fragment lit if its light depth >= map depth - bias.
    # Empty shadow texels (0 = nothing rendered) never occlude.
    lit = ((sel_z + sel_bias >= smp) | (smp <= 0.0)).astype(jnp.float32)
    lit = jnp.where(chosen & (d > 0.0), lit, 1.0)         # outside/sky: lit

    # Upsample + 3x3 box smooth (the PCF analogue on the result mask).
    lit = jax.image.resize(lit, (H, W), method="bilinear")
    p = jnp.pad(lit, 1, mode="edge")
    acc = sum(p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3))
    return acc / 9.0


# ---------------------------------------------------------------------------
# Local (spot) light shadow views — the reference's per-light shadow cameras
# (LightManager.cpp shadow views via ViewManager; shadow atlas slots).
# ---------------------------------------------------------------------------

def spot_shadow_matrices(lights: jnp.ndarray, max_slots: int,
                         near: float = 0.05):
    """Per-slot perspective viewproj for shadow-casting spot lights.

    Returns (vps (K, 4, 4), light_index (K,) i32, live (K,) bool). Slot ids
    live in light lane 14 (scene/bridge.py packs spots only)."""
    L = lights.shape[0]
    slot = lights[:, 14]
    vps, idxs, lives = [], [], []
    for k in range(max_slots):
        # One-hot select the light row owning slot k (small table matmul).
        sel = (jnp.abs(slot - k) < 0.5).astype(jnp.float32)
        live = jnp.sum(sel) > 0.5
        row = jnp.matmul(sel[None, :], lights,
                         precision=jax.lax.Precision.HIGH)[0]
        pos, d = row[0:3], row[4:7]
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
        rng = jnp.maximum(row[11], near * 2.0)
        outer = jnp.arccos(jnp.clip(row[13], -0.999, 0.999))
        fov = jnp.clip(outer * 2.0 * 1.05, 0.1, 3.0)
        up = jnp.where(jnp.abs(d[1]) < 0.95,
                       jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
        s = jnp.cross(d, up)
        s = s / jnp.maximum(jnp.linalg.norm(s), 1e-9)
        u = jnp.cross(s, d)
        # View: right-handed looking down -Z -> rows (s, u, -d).
        R = jnp.stack([s, u, -d])
        t = -R @ pos
        viewm = jnp.zeros((4, 4), jnp.float32).at[:3, :3].set(R) \
            .at[:3, 3].set(t).at[3, 3].set(1.0)
        proj = math3d.perspective(fov, 1.0, near, rng, reverse_z=True)
        vps.append(proj @ viewm)
        idxs.append(jnp.argmax(sel).astype(jnp.int32))
        lives.append(live)
    return jnp.stack(vps), jnp.stack(idxs), jnp.stack(lives)


def spot_shadow_config(config: FrameConfig) -> FrameConfig:
    res = config.spot_shadow_resolution
    return dataclasses.replace(
        config, width=res, height=res, enable_occlusion=False,
        max_pairs=min(config.max_pairs, 1 << 15),
        max_tiles_per_tri=min(config.max_tiles_per_tri, 8))


def sample_spot_shadow(depth: jnp.ndarray, view, vp: jnp.ndarray,
                       shadow_map: jnp.ndarray, bias, downscale: int = 4,
                       row0: int = 0, full_h: int = None) -> jnp.ndarray:
    """(H, W) visibility for one spot light from the camera DEPTH buffer
    (same depth-unprojection strategy as the cascades)."""
    H, W = depth.shape
    full_h = full_h or H
    Rp = shadow_map.shape[0]
    d = downsample2d(depth, downscale)
    h, w = d.shape
    ds = downscale
    ndc_x = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5) \
        / W * 2.0 - 1.0
    ndc_y = 1.0 - (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds
                   + 0.5 + row0) / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    px, py, pz, pw = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, d)
    iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
    x, y, z, wq = math3d.mat4_columns(vp, px * iw, py * iw, pz * iw)
    front = wq > 1e-6
    qi = 1.0 / jnp.where(front, wq, 1.0)
    x, y, z = x * qi, y * qi, z * qi
    inside = front & (jnp.abs(x) < 0.99) & (jnp.abs(y) < 0.99) \
        & (z > 0) & (z < 1)
    u = jnp.clip(((x * 0.5 + 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
    v = jnp.clip(((0.5 - y * 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
    smp = shadow_map.reshape(-1)[v * Rp + u]
    # Perspective reverse-Z depth is ~near/dist — its absolute range
    # collapses with far range, so the bias must be MULTIPLICATIVE:
    # z/smp = dist_caster/dist_receiver, lit iff the receiver is within
    # ~4% of the caster distance.
    lit = ((z >= smp * 0.96) | (smp <= 0.0)).astype(jnp.float32)
    lit = jnp.where(inside & (d > 0), lit, 1.0)
    lit = jax.image.resize(lit, (H, W), method="bilinear")
    p = jnp.pad(lit, 1, mode="edge")
    acc = sum(p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3))
    return acc / 9.0


# ---------------------------------------------------------------------------
# Point-light cube shadows (6 perspective faces; reference: LightManager's
# omni shadow cameras).
# ---------------------------------------------------------------------------

_CUBE_DIRS = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1),
              (0, 0, -1)]
_CUBE_UPS = [(0, 1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1), (0, 1, 0),
             (0, 1, 0)]


def point_cube_matrices(lights: jnp.ndarray, max_cubes: int,
                        near: float = 0.05):
    """(max_cubes, 6, 4, 4) face viewprojs + (max_cubes,) light index/live.
    Cube index lives in light lane 15 (scene/bridge.py)."""
    vps, idxs, lives = [], [], []
    for c in range(max_cubes):
        sel = (jnp.abs(lights[:, 15] - c) < 0.5).astype(jnp.float32)
        live = jnp.sum(sel) > 0.5
        row = jnp.matmul(sel[None, :], lights,
                         precision=jax.lax.Precision.HIGH)[0]
        pos = row[0:3]
        rng = jnp.maximum(row[11], near * 2.0)
        # 90-degree faces with a little overlap for seam-free selection.
        proj = math3d.perspective(jnp.pi / 2 * 1.02, 1.0, near, rng,
                                  reverse_z=True)
        face_vps = []
        for d, up in zip(_CUBE_DIRS, _CUBE_UPS):
            d = jnp.asarray(d, jnp.float32)
            up = jnp.asarray(up, jnp.float32)
            s = jnp.cross(d, up)
            s = s / jnp.maximum(jnp.linalg.norm(s), 1e-9)
            u = jnp.cross(s, d)
            R = jnp.stack([s, u, -d])
            t = -R @ pos
            viewm = jnp.zeros((4, 4), jnp.float32).at[:3, :3].set(R) \
                .at[:3, 3].set(t).at[3, 3].set(1.0)
            face_vps.append(proj @ viewm)
        vps.append(jnp.stack(face_vps))
        idxs.append(jnp.argmax(sel).astype(jnp.int32))
        lives.append(live)
    return jnp.stack(vps), jnp.stack(idxs), jnp.stack(lives)


def point_shadow_config(config: FrameConfig) -> FrameConfig:
    res = config.point_shadow_resolution
    return dataclasses.replace(
        config, width=res, height=res, enable_occlusion=False,
        max_pairs=min(config.max_pairs, 1 << 14),
        max_tiles_per_tri=min(config.max_tiles_per_tri, 8))


def sample_point_shadow(depth: jnp.ndarray, view, light_pos: jnp.ndarray,
                        face_vps: jnp.ndarray, face_maps: jnp.ndarray,
                        downscale: int = 4, row0: int = 0,
                        full_h: int = None) -> jnp.ndarray:
    """(H, W) visibility for one point light. face_maps (6, R', R');
    the face is selected per pixel by the dominant axis of (p - light),
    then ONE combined gather samples all faces (the cascade strategy)."""
    H, W = depth.shape
    full_h = full_h or H
    Rp = face_maps.shape[1]
    d = downsample2d(depth, downscale)
    h, w = d.shape
    ds = downscale
    ndc_x = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5) \
        / W * 2.0 - 1.0
    ndc_y = 1.0 - (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds
                   + 0.5 + row0) / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    px, py, pz, pw = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, d)
    iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
    px, py, pz = px * iw, py * iw, pz * iw

    tx = px - light_pos[0]
    ty = py - light_pos[1]
    tz = pz - light_pos[2]
    ax, ay, az = jnp.abs(tx), jnp.abs(ty), jnp.abs(tz)
    face = jnp.where((ax >= ay) & (ax >= az), jnp.where(tx > 0, 0, 1),
                     jnp.where(ay >= az, jnp.where(ty > 0, 2, 3),
                               jnp.where(tz > 0, 4, 5)))
    sel_idx = jnp.zeros((h, w), jnp.int32)
    sel_z = jnp.zeros((h, w), jnp.float32)
    inside_any = jnp.zeros((h, w), bool)
    for f in range(6):
        x, y, z, wq = math3d.mat4_columns(face_vps[f], px, py, pz)
        front = wq > 1e-6
        qi = 1.0 / jnp.where(front, wq, 1.0)
        x, y, z = x * qi, y * qi, z * qi
        use = (face == f) & front & (z > 0) & (z < 1)
        u = jnp.clip(((x * 0.5 + 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
        v = jnp.clip(((0.5 - y * 0.5) * Rp).astype(jnp.int32), 0, Rp - 1)
        sel_idx = jnp.where(use, (f * Rp + v) * Rp + u, sel_idx)
        sel_z = jnp.where(use, z, sel_z)
        inside_any = inside_any | use
    smp = face_maps.reshape(-1)[sel_idx]
    lit = ((sel_z >= smp * 0.96) | (smp <= 0.0)).astype(jnp.float32)
    lit = jnp.where(inside_any & (d > 0), lit, 1.0)
    lit = jax.image.resize(lit, (H, W), method="bilinear")
    p = jnp.pad(lit, 1, mode="edge")
    acc = sum(p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3))
    return acc / 9.0

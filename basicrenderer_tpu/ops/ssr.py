"""Screen-space reflections.

Reference analogue: the SSSR/FFX stochastic screen-space reflection pass +
its IBL-specular composite (reference: RenderGraphBuildHelper.h:532-585
BuildSSRPipeline, FFXManager). TPU redesign:

- The march runs at 1/downscale rate with a FIXED step count; every step is
  one combined gather over all pixels (per-pixel gathers are ~7 ns, so the
  budget is steps x pixels — 8 steps at ds4 is ~1 ms, ds2 ~4 ms).
- Under the infinite reverse-Z projection, NDC depth is proportional to
  1/view-distance, which IS linear in screen space along a world ray — so
  stepping linearly in (screen, z_ndc) simultaneously is exact, no
  per-step unprojection needed.
- Receivers unproject from the 2D depth plane (shadows.downsample2d);
  normals arrive as an (H, W, 3) image but are consumed at march rate.
- The first-hit search is branch-free: all steps' comparisons stack into a
  mask and argmax picks the first crossing; one final gather fetches the
  lit color at the hit. Roughness/edge/facing fades match the reference's
  composite weights.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig, ViewData
from ..utils import math3d
from .shadows import downsample2d


def ssr(hdr: jnp.ndarray, depth: jnp.ndarray, normal: jnp.ndarray,
        roughness: jnp.ndarray, metallic: jnp.ndarray, view: ViewData,
        config: FrameConfig, row0: int = 0, full_h: int = None):
    """Returns (reflection (H, W, 3), weight (H, W)) to composite into the
    specular term. All inputs full-res; march at config.ssr_downscale."""
    H, W = depth.shape
    full_h = full_h or H
    ds = config.ssr_downscale
    steps = config.ssr_steps
    d = downsample2d(depth, ds)
    h, w = d.shape

    nx = downsample2d(normal[..., 0], ds)
    ny = downsample2d(normal[..., 1], ds)
    nz = downsample2d(normal[..., 2], ds)
    rg = downsample2d(roughness, ds)

    # Unproject (column math).
    sx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5
    sy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds + 0.5 + row0
    ndc_x = sx / W * 2.0 - 1.0
    ndc_y = 1.0 - sy / full_h * 2.0
    inv_vp = jnp.linalg.inv(view.viewproj)
    px, py, pz, pw = math3d.mat4_columns(inv_vp, ndc_x, ndc_y, d)
    iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
    px, py, pz = px * iw, py * iw, pz * iw

    vx = px - view.cam_pos[0]
    vy = py - view.cam_pos[1]
    vz = pz - view.cam_pos[2]
    vl = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    il = 1.0 / jnp.maximum(vl, 1e-6)
    vx, vy, vz = vx * il, vy * il, vz * il
    vdotn = vx * nx + vy * ny + vz * nz
    rx = vx - 2.0 * vdotn * nx
    ry = vy - 2.0 * vdotn * ny
    rz = vz - 2.0 * vdotn * nz

    # Ray end: march a view-depth-proportional distance along r.
    dist = config.ssr_max_distance
    cx, cy, cz, cw = math3d.mat4_columns(
        view.viewproj, px + rx * dist, py + ry * dist, pz + rz * dist)
    wv = jnp.where(jnp.abs(cw) > 1e-6, cw, 1e-6)
    ex = (cx / wv * 0.5 + 0.5) * W
    ey = (0.5 - cy / wv * 0.5) * full_h - row0
    ez = cz / wv
    behind = cw <= 1e-4                    # ray leaves the view volume

    x0, y0, z0 = sx, sy, d

    # --- Hierarchical two-level march (HZB-march analogue) ---------------
    # A per-pixel HZB traversal state machine would serialize on TPU;
    # instead ALL rays take Sc lockstep COARSE steps against a
    # conservative nearest-depth mip (block max under reverse-Z: no
    # surface between coarse samples can be missed), then Sf lockstep
    # FINE steps inside each ray's first bracketing coarse interval —
    # Sc*Sf effective resolution for Sc+Sf gathers. (Reference: SSSR's
    # HZB ray march, FFXManager/sssr shaders.)
    coarse = config.ssr_coarse_steps
    cc = 4                                   # coarse cell = cc march texels
    # Floor at one cell: tiny shard heights (narrow screen-row shards on a
    # big mesh) must not produce an empty coarse mip.
    hc, wc = max(h // cc, 1), max(w // cc, 1)
    dsrc = d
    if h < hc * cc or w < wc * cc:
        dsrc = jnp.pad(d, ((0, max(hc * cc - h, 0)),
                           (0, max(wc * cc - w, 0))))
    dc = dsrc[:hc * cc, :wc * cc].reshape(hc, cc, wc, cc).max((1, 3))
    dx_c = (ex - x0) / coarse
    dy_c = (ey - y0) / coarse
    dz_c = (ez - z0) / coarse

    c_any = jnp.zeros((h, w), bool)
    c_step = jnp.full((h, w), coarse, jnp.float32)
    for s in range(1, coarse + 1):
        xs = x0 + dx_c * s
        ys = y0 + dy_c * s
        zs = z0 + dz_c * s
        ui = jnp.clip((xs / (ds * cc)).astype(jnp.int32), 0, wc - 1)
        vi = jnp.clip((ys / (ds * cc)).astype(jnp.int32), 0, hc - 1)
        zd = dc.reshape(-1)[vi * wc + ui]
        on = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < full_h)
        crossed = on & (zd > zs)             # conservative bracket
        first = crossed & ~c_any
        c_step = jnp.where(first, jnp.float32(s), c_step)
        c_any = c_any | crossed

    # Fine refinement inside [c_step-1, c_step] of the coarse march:
    # BISECTION on the crossing predicate instead of a linear sub-march —
    # ceil(log2(steps)) gathers give >= `steps` subdivisions (5 gathers
    # resolve 32 sub-steps where the linear loop paid 12; each gather is
    # ~7 ns/pixel, so this halves the fine-march cost at HIGHER precision).
    # The coarse bracket came from a block-MAX mip (conservative under
    # reverse-Z), so the fine surface may not actually cross inside the
    # bracket — bisection then converges to the bracket end and the final
    # thickness test rejects the hit, same as the linear loop's no-hit.
    nbis = max(1, math.ceil(math.log2(steps))) if steps > 1 else 1
    lo = c_step - 1.0
    hi = c_step
    thick = config.ssr_thickness

    def sample(t):
        xs = x0 + dx_c * t
        ys = y0 + dy_c * t
        zs = z0 + dz_c * t
        ui = jnp.clip((xs / ds).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip((ys / ds).astype(jnp.int32), 0, h - 1)
        zd = d.reshape(-1)[vi * w + ui]
        on = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < full_h)
        return xs, ys, zs, zd, on

    for _ in range(nbis):
        mid = 0.5 * (lo + hi)
        _, _, zs, zd, on = sample(mid)
        crossed = on & (zd > zs)     # reverse-Z: surface nearer than ray
        lo = jnp.where(crossed, lo, mid)
        hi = jnp.where(crossed, mid, hi)

    # Final sample at the converged crossing, with the thickness band so
    # rays pass BEHIND thin silhouettes (matches the linear march's test).
    xs, ys, zs, zd, on = sample(hi)
    hit_any = c_any & on & (zd > 0) & (zd > zs) & (zd < zs + thick)
    cidx = (jnp.clip(ys.astype(jnp.int32), 0, H - 1) * W
            + jnp.clip(xs.astype(jnp.int32), 0, W - 1))
    col = hdr.reshape(-1, 3)[cidx]          # (h, w, 3)

    # Composite weights: smooth surfaces, forward rays, screen-edge fade,
    # hit only.
    wgt = jnp.clip(1.0 - rg * 2.0, 0.0, 1.0)
    wgt = wgt * jnp.clip(-vdotn * 4.0, 0.0, 1.0)
    edge_x = jnp.clip(jnp.minimum(xs, W - xs) / (0.1 * W), 0.0, 1.0)
    edge_y = jnp.clip(jnp.minimum(ys, full_h - ys) / (0.1 * full_h), 0.0, 1.0)
    wgt = wgt * edge_x * edge_y
    wgt = jnp.where(hit_any & ~behind & (d > 0), wgt, 0.0)

    if ds > 1:
        col = jax.image.resize(col, (H, W, 3), method="bilinear")
        wgt = jax.image.resize(wgt, (H, W), method="bilinear")
    return col, wgt

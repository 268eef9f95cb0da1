"""Order-independent transparency via K-layer depth peeling.

Reference analogue: the CLod transparency modes (reference: CLodCommon.h:
82-86 — linked-list deep visibility and AVBOIT adaptive voxelized OIT;
DeepVisibilityOutput/Resolve shaders). Per SURVEY.md §7, the TPU-friendly
variant is the capacity-bounded K-buffer: per-pixel linked lists need
dynamic memory and per-lane pointer chasing, while K depth-peeling passes
reuse the existing Pallas raster unchanged (one extra compare per fragment)
and produce exactly the K nearest transparent layers, composited
back-to-front.

Transparent geometry rides the same cluster pipeline: clusters whose
material has alpha_blend set carry a transparency flag (cluster-table lane
10), are excluded from the opaque pass, and are compacted separately here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig, FrameParams, SceneBuffers, ViewData
from . import clod as clod_ops, raster_setup, shade as shade_ops
from .raster_pallas import NUM_CHANNELS, raster_tiles_pallas
from .raster_ref import raster_tiles_ref
from .resolve_pallas import resolve_attributes_ref


def composite_oit(scene: SceneBuffers, view: ViewData, config: FrameConfig,
                  params: FrameParams, opaque_depth_p: jnp.ndarray,
                  hdr: jnp.ndarray, lcfg: FrameConfig = None,
                  row0_tiles=0, localize=None) -> jnp.ndarray:
    """Renders K transparent layers behind-to-front onto `hdr` (H, W, 3).

    `lcfg`/`row0_tiles`/`localize` place a screen-row shard inside the full
    frame (graph/frame._render_body): binning is full-screen (replicated),
    peeling rasters only the shard's tile rows."""
    if lcfg is None:
        lcfg = config
    if localize is None:
        localize = lambda p: p
    tau = params.clod_error_px
    cut, _ = clod_ops.select_cluster_cut(scene, view, config, tau)
    flag = scene.cluster_table[:, 10]
    transparent = (flag > 0.5) & (flag < 1.5)  # 2 = alpha-MASK
    cut = cut & transparent
    comp = clod_ops.compact_visible_tris(
        cut=cut, scene=scene, max_visible=config.oit_clusters)
    lanes, bbox, valid, _clip_ovf = raster_setup.setup_from_compacted(
        scene, comp, view.viewproj, config)
    if config.oit_overflow_probe:
        # Pack per-triangle alpha + per-channel optical depth into payload
        # lanes 30/31 (8-bit quantized) for the beyond-K accumulation pass
        # — the AVBOIT transmittance-curve analogue: each material's layer
        # transmittance T_c = (1-tw)(1-a) + tw*tint_c gives od_c =
        # -ln(T_c), and the probe SUMS od over tail fragments so the
        # background attenuates by exp(-Σ od_c) per channel.
        # (Reference: AVBOITCapture/AdaptiveFit.hlsl, CLodCommon.h:117-120.)
        mat_ids = jnp.clip(
            (lanes[:, 10] % raster_setup.OBJ_COMBO).astype(jnp.int32),
            0, scene.material_table.shape[0] - 1)
        mrow = raster_setup.gather_rows_onehot(scene.material_table,
                                               mat_ids)
        a_tri = jnp.clip(mrow[:, 3], 0.0, 1.0)
        tw_tri = jnp.clip(mrow[:, 30], 0.0, 1.0)
        tint = jnp.clip(mrow[:, 32:35], 0.0, 1.0)
        t_c = jnp.clip((1.0 - tw_tri[:, None]) * (1.0 - a_tri[:, None])
                       + tw_tri[:, None] * tint, 0.02, 1.0)
        od8 = jnp.round(jnp.clip(-jnp.log(t_c) * (0.25), 0.0, 1.0) * 255.0)
        a8 = jnp.round(a_tri * 255.0)
        live = lanes[:, 9] > 0.5
        lanes = lanes.at[:, 30].set(jnp.where(
            live, a8 + od8[:, 0] * 256.0 + od8[:, 1] * 65536.0, 0.0))
        lanes = lanes.at[:, 31].set(jnp.where(live, od8[:, 2], 0.0))
        # Premultiplied tail-emission estimate (lane 28): albedo x the
        # non-transmissive coverage. The K exact layers carry full
        # shading; tail fragments only need a plausible color for the
        # depth-warp-weighted emission average (reference: the captured
        # fragment colors AVBOITCapture feeds the adaptive fit).
        c8 = jnp.round(jnp.clip(mrow[:, 0:3], 0.0, 1.0)
                       * (a_tri * (1.0 - tw_tri))[:, None] * 255.0)
        lanes = lanes.at[:, 28].set(jnp.where(
            live, c8[:, 0] + c8[:, 1] * 256.0 + c8[:, 2] * 65536.0, 0.0))
    # Transparent binning prices by CAPACITY (sort-based): use the
    # dedicated (smaller) transparent budget instead of the full-scene
    # max_pairs (VERDICT r4 weak-7: full_oit paid FULL's 2^18 sort per
    # frame for a few thousand glass pairs).
    import dataclasses as _dc
    bcfg = _dc.replace(config,
                       max_pairs=min(config.oit_max_pairs, config.max_pairs))
    pairs = localize(raster_setup.bin_clustered(lanes, bbox, valid,
                                                bcfg))

    H, W = lcfg.height, config.width
    Hp, Wp = lcfg.padded_height, lcfg.padded_width
    row0_px = row0_tiles * config.tile_h
    peel_bound = jnp.full((Hp, Wp), jnp.inf, jnp.float32)

    def raster_layer(pb):
        if lcfg.use_pallas_raster:
            d, v, ch = raster_tiles_pallas(pairs, lcfg,
                                           peel=(opaque_depth_p, pb),
                                           interpret=lcfg.pallas_interpret,
                                           tile_row0=row0_tiles)
        else:
            d, v = raster_tiles_ref(pairs, lcfg, tile_row0=row0_tiles,
                                    peel=(opaque_depth_p, pb))
            ch = resolve_attributes_ref(pairs, v, lcfg, tile_row0=row0_tiles)
        return d, v, ch

    layers = []
    prev_any = None
    for _k in range(config.oit_layers):
        if _k == 0:
            d, v, ch = raster_layer(peel_bound)
        else:
            # A layer can only exist where the previous one had coverage:
            # lax.cond skips the whole re-walk once the peel runs dry
            # (most frames have 0-2 real transparent layers; the
            # budgeted-K chain must not price the empty tail).
            d, v, ch = jax.lax.cond(
                prev_any, raster_layer,
                lambda pb: (jnp.zeros_like(layers[0][0]),
                            jnp.zeros_like(layers[0][1]),
                            jnp.zeros_like(layers[0][2])),
                peel_bound)
        prev_any = jnp.any(v > 0)
        layers.append((d, v, ch))
        # Next layer strictly farther. The relative epsilon absorbs
        # duplicate fragments from shared triangle edges: adjacent
        # triangles evaluate slightly different plane equations at the
        # same pixel, so a mesh-internal edge would otherwise peel as a
        # phantom extra layer (z a few ulps below the real one).
        peel_bound = jnp.where(v > 0, d * (1.0 - 1e-4), 0.0)

    # Shade the K exact layers.
    shaded = []
    for d, v, ch in layers:
        gb = shade_ops.gbuffer_from_channels(
            ch[:, :H, :W], d[:H, :W], v[:H, :W], view, scene.material_table,
            config.width, config.height, row0=row0_px)
        col = shade_ops.shade_deferred(
            gb, scene, view, transmission=config.enable_transmission,
            max_lights=config.oit_max_lights)
        a = jnp.clip(gb.alpha, 0.0, 1.0)
        covered = v[:H, :W] > 0
        if config.enable_transmission:
            # OpenPBR transmission (reference: PerMaterialOpenPBRCB
            # transmissionWeight/Color/Depth, ShaderBuffers.h:277-334):
            # the covered part of the layer splits into an opaque fraction
            # (1 - tw) that alpha-blends and a transmissive fraction that
            # multiplies the background by the Beer-Lambert tint
            # color^(depth_ratio) scaled by (1 - Fresnel) — the reflected
            # share stays in the specular lobe `col` already carries.
            tw = jnp.clip(gb.trans_weight, 0.0, 1.0)[..., None]
            vdir = view.cam_pos[None, None, :] - gb.world_pos
            vdir = vdir / jnp.maximum(
                jnp.linalg.norm(vdir, axis=-1, keepdims=True), 1e-9)
            ndv = jnp.maximum(jnp.sum(gb.normal * vdir, -1), 1e-4)
            f0 = ((gb.ior - 1.0) / (gb.ior + 1.0)) ** 2
            F = shade_ops._f_schlick(ndv[..., None], f0[..., None])
            tint = jnp.clip(gb.trans_color, 0.0, 1.0)
            trans3 = (1.0 - a[..., None]) * (1.0 - tw) \
                + tw * tint * (1.0 - F)
            surf3 = col * (a[..., None] * (1.0 - tw) + tw)
        else:
            trans3 = 1.0 - a[..., None]
            surf3 = col * a[..., None]
        shaded.append((surf3, trans3, covered[..., None]))

    # Beyond-K transmittance tail (reference: the AVBOIT tier —
    # CLodCommon.h:117-120, AVBOITCapture/AVBOITAdaptiveFit.hlsl —
    # bounded-memory handling of deep transparency). One accumulation
    # pass over the band behind the K-th layer sums each tail fragment's
    # per-channel optical depth (packed per-material into payload lanes
    # 30/31 above) plus the fragment count; the background then attenuates
    # by the closed-form curve exp(-Σ od_c) — per-material strength AND
    # per-channel color, instead of the tail being silently dropped.
    overflow = jnp.int32(0)
    if config.oit_overflow_probe:
        def accum_pass(pb):
            if lcfg.use_pallas_raster:
                _, _, a = raster_tiles_pallas(
                    pairs, lcfg, peel=(opaque_depth_p, pb),
                    interpret=lcfg.pallas_interpret, tile_row0=row0_tiles,
                    accum=True)
            else:
                _, a = raster_tiles_ref(pairs, lcfg, tile_row0=row0_tiles,
                                        peel=(opaque_depth_p, pb),
                                        accum=True)
            return a

        # No K-th layer anywhere -> no tail behind it: skip the walk.
        acc = jax.lax.cond(
            prev_any, accum_pass,
            lambda pb: jnp.zeros((NUM_CHANNELS,) + peel_bound.shape,
                                 jnp.float32),
            peel_bound)
        count = acc[7][:H, :W]
        overflow = jnp.sum(count > 0.5).astype(jnp.int32)
        # Adaptive per-channel tail transmittance: the accumulated optical
        # depth of every beyond-K fragment (its material's exact -ln T_c,
        # 8-bit quantized) closes the visibility curve in one pass —
        # deep red-glass stacks shadow the background red, and the
        # strength is per-material, not a global constant. Fragments whose
        # material carries no optical depth (a ~ 0) still count toward the
        # overflow telemetry but correctly leave the background alone.
        # The tail also EMITS: the depth-warp-weighted premultiplied color
        # average (nearer fragments dominate — the AVBOIT depth-warp/
        # adaptive-fit analogue) blends over the attenuated background
        # with the mean-od coverage, so a deep stack shows its own color
        # instead of only darkening what lies behind it.
        od = acc[4:7, :H, :W]                      # (3, H, W)
        t3 = jnp.exp(-od).transpose(1, 2, 0)
        wa = acc[0, :H, :W]
        cbar = acc[1:4, :H, :W].transpose(1, 2, 0) \
            / jnp.maximum(wa, 1e-6)[..., None]
        a_tail = 1.0 - jnp.exp(-jnp.mean(od, axis=0))
        hdr = hdr * t3 + cbar * a_tail[..., None]

    # Composite back-to-front (farthest layer first). Each layer carries a
    # premultiplied surface term and a per-channel background transmittance
    # (plain 1-alpha without transmission; Fresnel-weighted Beer-Lambert
    # tint with it).
    out = hdr
    for surf3, trans3, covered in reversed(shaded):
        out = jnp.where(covered, surf3 + out * trans3, out)
    return out, overflow

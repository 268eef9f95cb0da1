"""Frame graph: composes pass functions into one jit-compiled frame program.

TPU-native replacement for the reference's OpenRenderGraph runtime (reference:
SURVEY.md §1 L1 — RenderGraph::CompileStructural/Update/Execute). Where the
reference builds a pass DAG, solves barriers/queues/aliasing and caches a
schedule, here the *whole frame is a single traced function*: XLA performs
scheduling, fusion, memory aliasing and hazard ordering. The analogue of
"structural recompile on settings toggle" (Renderer.cpp:1794-1800) is a new
jit specialization keyed on FrameConfig.

Pass order mirrors Renderer::CreateRenderGraph (Renderer.cpp:2433-2754):
geometry -> visibility buffer -> GBuffer resolve -> deferred shade + sky ->
post (bloom/tonemap) -> sRGB output.

Multi-chip: the SAME frame body runs under shard_map with screen tile-rows
sharded over the mesh axis (parallel/tile_sharding.py). `_render_body` takes
(lcfg, row0_tiles, axis): geometry/binning/shadow-render are replicated
(cheap relative to per-pixel work), raster + shading run on the shard's own
rows, and the only cross-device traffic is an all_gather for the cross-row
image passes (HZB, GTAO, bloom, auto-exposure) — the tile-sharded CP/SP
analogue from SURVEY.md §2.4.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import culling, lighting, raster_setup
from ..ops.raster_pallas import raster_tiles_pallas
from ..ops.raster_ref import raster_tiles_ref
from ..ops.resolve_pallas import resolve_attributes_ref
from ..ops import shade as shade_ops
from .framedata import FrameConfig, FrameParams, SceneBuffers, ViewData


def object_mask_to_tris(object_visible: jnp.ndarray, tri_object: jnp.ndarray
                        ) -> jnp.ndarray:
    """(O,) object visibility -> (T,) triangle mask via one-hot MXU lookup
    (a direct row gather of T rows serializes on TPU)."""
    table = object_visible.astype(jnp.float32)[:, None]   # (O, 1)
    ok = raster_setup.gather_rows_onehot(table, jnp.maximum(tri_object, 0))
    return ok[:, 0] > 0.5


def _opaque_row_filter(config: FrameConfig):
    """Transparency-flag routing of the opaque pass (lane 10: 0 opaque,
    1 transparent, 2 MASK) as a per-row predicate."""
    if not (config.enable_oit or config.enable_alpha_mask):
        return None

    def filt(flag):
        ok = jnp.ones_like(flag, bool)
        if config.enable_oit:
            # Transparent clusters render through the OIT peeling passes
            # (ops/oit.py); keep only non-blended ones here.
            ok = ok & ~((flag > 0.5) & (flag < 1.5))
        if config.enable_alpha_mask:
            # Alpha-MASK clusters render through the masked pass.
            ok = ok & (flag < 1.5)
        return ok
    return filt


def clod_cut(scene: SceneBuffers, view: ViewData, config: FrameConfig,
             params: FrameParams, frustum: bool = True,
             return_bounds: bool = False):
    """Opaque-pass LOD cut mask (reference: cluster cull + LOD select,
    computeCulling.hlsl; ops/clod.py for the vectorized reformulation)."""
    from ..ops import clod as clod_ops
    tau = params.clod_error_px if params is not None else jnp.float32(1.0)
    out = clod_ops.select_cluster_cut(scene, view, config, tau, None,
                                      frustum=frustum,
                                      return_bounds=return_bounds)
    cut = out[0]
    filt = _opaque_row_filter(config)
    if filt is not None:
        cut = cut & filt(scene.cluster_table[:, 10])
    return (cut,) + out[2:] if return_bounds else cut


def clod_compact(scene: SceneBuffers, view: ViewData, config: FrameConfig,
                 params: FrameParams, frustum: bool = True,
                 max_visible: int = None):
    """Virtualized-geometry LOD cut + visible-triangle compaction. Returns
    (indices, material, object, valid, overflow) sized max_visible * 128.
    With config.cut_windows > 0 the cut runs the budgeted window pre-cull
    (cost tracks the cut, not the table — the DAG-frontier analogue)."""
    from ..ops import clod as clod_ops
    tau = params.clod_error_px if params is not None else jnp.float32(1.0)
    if config.cut_windows > 0:
        return clod_ops.cut_slots_windowed(
            scene, view, config, tau,
            max_visible or config.max_visible_clusters, frustum=frustum,
            row_filter=_opaque_row_filter(config))
    cut = clod_cut(scene, view, config, params, frustum=frustum)
    return clod_ops.compact_visible_tris(
        cut=cut, scene=scene,
        max_visible=max_visible or config.max_visible_clusters)


def geometry_pass(scene: SceneBuffers, view: ViewData, config: FrameConfig,
                  params: FrameParams = None):
    """Setup + culled binning. With enable_clod the pipeline goes through
    the visible-cluster compaction (cost scales with the visible budget);
    otherwise the full soup is set up with object-level frustum culling.
    Returns (clip, world_pos, world_normals, cluster_overflow, pairs)."""
    if config.enable_clod:
        # Virtualized-geometry fast path: nothing here touches the full
        # soup except the cluster table and the compaction gather.
        comp = clod_compact(scene, view, config, params)
        cl_overflow = comp.overflow
        lanes, bbox, valid, clip_ovf = raster_setup.setup_from_compacted(
            scene, comp, view.viewproj, config)
        pairs = raster_setup.bin_clustered(lanes, bbox, valid, config)
        return None, None, None, cl_overflow + clip_ovf, pairs
    clip, world_pos, world_normals = raster_setup.transform_geometry(
        scene.positions, scene.normals, scene.vert_object, scene.object_mats,
        scene.object_normal_mats, view.viewproj)
    clip, world_pos, world_normals = jax.lax.optimization_barrier(
        (clip, world_pos, world_normals))
    tri_valid = scene.tri_object >= 0
    vtheta = raster_setup.vertex_world_theta(scene, world_normals) \
        if config.enable_vertex_tangents else None
    lanes, bbox, valid, clip_ovf = raster_setup.triangle_setup_packed(
        clip, scene.indices, tri_valid, config, world_normals, scene.uvs,
        scene.tri_material, scene.tri_object, vertex_theta=vtheta)
    if config.enable_culling:
        obj_vis = culling.frustum_cull_spheres(
            view.viewproj, scene.object_bounds[:, :3],
            scene.object_bounds[:, 3], scene.object_valid)
        tri_mask = object_mask_to_tris(obj_vis, scene.tri_object)
        if valid.shape[0] != tri_mask.shape[0]:
            # Near-clip rows were appended past the soup (cannot belong to
            # a frustum-culled object: they intersect the camera plane).
            tri_mask = jnp.pad(
                tri_mask, (0, valid.shape[0] - tri_mask.shape[0]),
                constant_values=True)
        valid = valid & tri_mask
    pairs = raster_setup.bin_pairs(lanes, bbox, valid, config)
    return clip, world_pos, world_normals, clip_ovf, pairs


def geometry_setup(scene: SceneBuffers, view: ViewData, config: FrameConfig):
    """Vertex transform + triangle setup (phase-independent; the two-phase
    occlusion path re-bins the same setup per phase)."""
    clip, world_pos, world_normals = raster_setup.transform_geometry(
        scene.positions, scene.normals, scene.vert_object, scene.object_mats,
        scene.object_normal_mats, view.viewproj)
    # Stage barrier (2D arrays only — rank-3 intermediates pad to (8,128)
    # tiles in HBM and must never be materialized): stops XLA re-running the
    # vertex one-hot matmul inside downstream fusions.
    clip, world_pos, world_normals = jax.lax.optimization_barrier(
        (clip, world_pos, world_normals))
    tri_valid = scene.tri_object >= 0
    vtheta = raster_setup.vertex_world_theta(scene, world_normals) \
        if config.enable_vertex_tangents else None
    lanes, bbox, valid, _clip_ovf = raster_setup.triangle_setup_packed(
        clip, scene.indices, tri_valid, config, world_normals, scene.uvs,
        scene.tri_material, scene.tri_object, vertex_theta=vtheta)
    return clip, world_pos, world_normals, lanes, bbox, valid


def visibility_pass(pairs, lcfg: FrameConfig, init=None, tile_row0=0):
    """Rasterize binned triangles -> (depth, vis, channels) on the (local)
    PADDED tile grid. The Pallas path fuses the attribute resolve into the
    raster loop; the portable path runs the two reference kernels back to
    back. `init` seeds the buffers (two-phase occlusion replay). `pairs`
    must already carry the local tile_offsets slice when tile_row0 != 0."""
    if lcfg.use_pallas_raster:
        return raster_tiles_pallas(pairs, lcfg, init=init,
                                   interpret=lcfg.pallas_interpret,
                                   tile_row0=tile_row0)
    depth_p, vis_p = raster_tiles_ref(
        pairs, lcfg, tile_row0=tile_row0,
        init=None if init is None else (init[0], init[1]))
    channels = resolve_attributes_ref(pairs, vis_p, lcfg, tile_row0=tile_row0)
    if init is not None:
        # Merge: keep phase-1 channels where phase 2 didn't overwrite.
        fresh = vis_p != init[1]
        channels = jnp.where(fresh[None], channels, init[2])
    return depth_p, vis_p, channels


def _render_body(scene: SceneBuffers, view: ViewData, params: FrameParams,
                 prev_depth: Optional[jnp.ndarray],
                 taa_history: Optional[jnp.ndarray],
                 vsm_state=None, prev_viewproj: Optional[jnp.ndarray] = None,
                 moving_rel: Optional[jnp.ndarray] = None,
                 moving_ids: Optional[jnp.ndarray] = None,
                 *, config: FrameConfig, lcfg: FrameConfig,
                 row0_tiles, axis: Optional[str]) -> Dict[str, jnp.ndarray]:
    """The frame program — ONE implementation for single-chip and sharded
    execution. `config` is the full-frame config; `lcfg` the local (shard)
    config differing only in height; `row0_tiles` the shard's global tile-row
    offset (0 single-chip); `axis` the shard_map mesh axis (None single-chip).

    Sharded inputs: scene/view/params replicated; prev_depth/taa_history
    row-sharded. Output image/depth/vis are the shard's rows.
    """
    H, W = lcfg.height, config.width
    full_h = config.height
    row0_px = row0_tiles * config.tile_h

    def gather_rows(x):
        """Shard rows -> full frame (identity single-chip). The cross-device
        collective behind every cross-row pass (HZB, GTAO, bloom, exposure)."""
        if axis is None:
            return x
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)

    def local_rows(x):
        """Full frame -> this shard's rows (identity single-chip)."""
        if axis is None:
            return x
        return jax.lax.dynamic_slice_in_dim(x, row0_px, H, 0)

    def localize(pairs):
        """Full-screen tile_offsets -> this shard's slice."""
        if axis is None:
            return pairs
        start = row0_tiles * config.tiles_x
        off = jax.lax.dynamic_slice_in_dim(pairs.tile_offsets, start,
                                           lcfg.num_tiles + 1, 0)
        return pairs._replace(tile_offsets=off)

    def halo_rows(x, row_axis=0):
        """Extend a row-sharded array by one halo row from each neighbor
        shard (ppermute over ICI); frame edges clamp to the shard's own
        edge row — identical to the full-frame edge handling."""
        n = config.height // lcfg.height
        idx = jax.lax.axis_index(axis)
        h = x.shape[row_axis]

        def row(i):
            return jax.lax.slice_in_dim(x, i, i + 1, axis=row_axis)

        top = jax.lax.ppermute(row(h - 1), axis,
                               [(i, i + 1) for i in range(n - 1)])
        top = jnp.where(idx == 0, row(0), top)
        bot = jax.lax.ppermute(row(0), axis,
                               [(i + 1, i) for i in range(n - 1)])
        bot = jnp.where(idx == n - 1, row(h - 1), bot)
        return jnp.concatenate([top, x, bot], axis=row_axis)

    def halo_upsample(img_ds, ds, out_h, out_w, row_axis=1):
        """Bilinear ds->full upsample that is EXACT across screen-row shard
        seams: exchange one halo row with each neighbor, resize the
        extended image, crop. Single-chip this is a plain resize.
        img_ds: (..., h, w, C) with `row_axis` the row dim."""
        shp = list(img_ds.shape)
        shp[row_axis] = out_h
        shp[row_axis + 1] = out_w
        if axis is None or ds == 1:
            return jax.image.resize(img_ds, shp, method="bilinear")
        ext = halo_rows(img_ds, row_axis)
        eshp = list(shp)
        eshp[row_axis] = out_h + 2 * ds
        up = jax.image.resize(ext, eshp, method="bilinear")
        return jax.lax.slice_in_dim(up, ds, ds + out_h, axis=row_axis)

    def halo_mipf(u_ds, v_ds):
        """Per-pixel texture mip estimate with seam-exact row derivatives:
        the min-|grad| ddy at a shard's first/last row must see the
        neighbor shard's rows (single-chip: None — the sampler computes
        it internally, same math)."""
        if axis is None:
            return None
        from ..ops import textures as tex_ops
        R = tex_ops.infer_strip_resolution(
            scene.tex_strips.shape[0] // scene.tex_flags.shape[0],
            config.tex_format)
        M = len(tex_ops.mip_layout(R)[0])
        ext = halo_rows(jnp.stack([u_ds, v_ds], -1), 0)
        return tex_ops.compute_mip(ext, R, M)[1:-1]

    if config.enable_skinning:
        # Linear-blend skinning prepass rewrites positions/normals so
        # every downstream path consumes deformed geometry
        # (reference: skinningCommon.hlsli + SkeletonManager).
        from ..ops import skinning as skin_ops
        scene = skin_ops.apply_skinning(
            scene, scene.joint_palette, scene.vert_joints,
            scene.vert_weights)
    centers = scene.object_bounds[:, :3]
    radii = scene.object_bounds[:, 3]
    cluster_overflow = jnp.int32(0)
    if config.enable_occlusion and config.enable_clod \
            and prev_depth is not None:
        # Cluster-granular two-phase occlusion (reference: phase-1/phase-2
        # cluster culling with replay buffers, computeCulling.hlsl +
        # CLodExtension.cpp:1474-1514). Phase 1 rasters cut clusters that
        # pass the previous frame's HZB; phase 2 re-tests the rejected
        # candidates against the fresh HZB and rasters the newly-visible
        # ones into the seeded buffers.
        from ..ops import clod as clod_ops
        prev_hzb = culling.build_hzb(gather_rows(prev_depth),
                                     config.hzb_levels)

        def raster_cut(c, budget, init=None, comp=None, slot_keep=None):
            import dataclasses as _dc
            if comp is None:
                comp = clod_ops.compact_visible_tris(
                    cut=c, scene=scene, max_visible=budget)
            if slot_keep is not None:
                comp = comp._replace(valid=comp.valid & jnp.broadcast_to(
                    slot_keep[:, None], (budget, 128)).reshape(-1))
            ovf = comp.overflow
            lanes, bboxt, valid, clip_ovf = raster_setup.setup_from_compacted(
                scene, comp, view.viewproj, config)
            # Pair capacity sized to the pass's own triangle budget (2 tile
            # slots/tri average): the binned-pair gather + raster feed cost
            # scales with capacity, and the phase-2 replay budget is ~8x
            # smaller than phase 1 — binning it at the full max_pairs wastes
            # ~2.5 ms/frame. Overflow still surfaces via pairs.overflow.
            bcfg = _dc.replace(
                config,
                max_pairs=min(config.max_pairs,
                              max(budget * 256, 1 << 14)),
                max_group_pairs=min(config.max_group_pairs,
                                    max(budget * 1024
                                        // config.group_rows, 1 << 12)))
            prs = raster_setup.bin_clustered(lanes, bboxt, valid, bcfg)
            d, v, ch = visibility_pass(localize(prs), lcfg, init=init,
                                       tile_row0=row0_tiles)
            return d, v, ch, prs, ovf + clip_ovf

        # SLOT-granular two-phase HZB test: compact the cut first, then
        # 4-corner-test only the Kc budget slots with their TIGHT spheres.
        # Testing at table capacity needed the dilated single-tap
        # approximation to stay cheap (7 ns/element gathers x 64k rows) and
        # its coarse footprint culled ~3x less (city bench: 12% vs 20%);
        # at Kc=3k the exact 4-corner test costs ~0.1 ms.
        Kc = config.max_visible_clusters
        comp1 = clod_compact(scene, view, config, params, max_visible=Kc)
        cw, rw = clod_ops.slot_world_spheres(comp1, scene)
        bb, zn, behind = culling.project_sphere_bounds(
            view.viewproj, cw, rw, config.width, full_h)
        live_s = comp1.slot_cluster >= 0
        unocc = culling.occlusion_test_hzb(prev_hzb, bb, zn, behind,
                                           config.width, full_h)
        depth_p, vis_p, channels, pairs, ovf1 = raster_cut(
            None, Kc, comp=comp1, slot_keep=unocc)
        hzb_now = culling.build_hzb(gather_rows(depth_p), config.hzb_levels)
        retest_s = live_s & ~unocc & culling.occlusion_test_hzb(
            hzb_now, bb, zn, behind, config.width, full_h)
        # Slot verdicts -> (C,) mask for the phase-2 re-compaction: a
        # Kc-row scatter (dead/kept slots dropped out of range) — ~0.1 ms,
        # unlike table-capacity scatters.
        C = scene.cluster_table.shape[0]
        idx = jnp.where(retest_s, comp1.slot_cluster, C)
        retest = jnp.zeros((C,), bool).at[idx].set(True, mode='drop')
        depth_p, vis_p, channels, pairs2, ovf2 = raster_cut(
            retest, config.max_phase2_clusters,
            init=(depth_p, vis_p, channels))
        pairs = pairs._replace(
            overflow=pairs.overflow + pairs2.overflow,
            num_pairs=pairs.num_pairs + pairs2.num_pairs)
        cluster_overflow = ovf1 + ovf2
    elif config.enable_occlusion and not config.enable_clod \
            and prev_depth is not None:
        clip, world_pos, world_normals, lanes, bbox, valid = geometry_setup(
            scene, view, config)
        prev_hzb = culling.build_hzb(gather_rows(prev_depth),
                                     config.hzb_levels)
        vis1, cand = culling.two_phase_object_cull(
            view.viewproj, centers, radii, scene.object_valid, prev_hzb,
            config.width, config.height)

        def obj_tri_mask(ov):
            m = object_mask_to_tris(ov, scene.tri_object)
            if valid.shape[0] != m.shape[0]:
                # Appended near-clip rows (always kept — they cross the
                # camera plane, so their object cannot be culled/occluded).
                m = jnp.pad(m, (0, valid.shape[0] - m.shape[0]),
                            constant_values=True)
            return m

        valid1 = valid & obj_tri_mask(vis1)
        pairs = raster_setup.bin_pairs(lanes, bbox, valid1, config)
        depth_p, vis_p, channels = visibility_pass(
            localize(pairs), lcfg, tile_row0=row0_tiles)
        # Phase 2: re-test candidates against the fresh HZB.
        hzb_now = culling.build_hzb(gather_rows(depth_p), config.hzb_levels)
        bb2, zn2, behind2 = culling.project_sphere_bounds(
            view.viewproj, centers, radii, config.width, config.height)
        vis2 = cand & culling.occlusion_test_hzb(
            hzb_now, bb2, zn2, behind2, config.width, config.height)
        valid2 = valid & obj_tri_mask(vis2)
        pairs2 = raster_setup.bin_pairs(lanes, bbox, valid2, config)
        depth_p, vis_p, channels = visibility_pass(
            localize(pairs2), lcfg, init=(depth_p, vis_p, channels),
            tile_row0=row0_tiles)
        pairs = pairs._replace(
            overflow=pairs.overflow + pairs2.overflow,
            num_pairs=pairs.num_pairs + pairs2.num_pairs)
    else:
        _clip, _wp, _wn, cluster_overflow, pairs = geometry_pass(
            scene, view, config, params)
        depth_p, vis_p, channels = visibility_pass(
            localize(pairs), lcfg, tile_row0=row0_tiles)

    if config.enable_alpha_mask:
        # Alpha-cutoff (MASK) materials: raster the masked clusters into
        # their own buffers, evaluate base-texture alpha at their pixels,
        # and depth-merge surviving texels into the opaque targets
        # (reference: alpha-tested PSOs in the vis-buffer raster).
        # `mask_peels >= 2` adds farther masked layers behind failed-cutoff
        # texels (masked-behind-masked: foliage visible through foliage
        # holes), each peel strictly behind the previous via the OIT peel
        # band.
        from ..ops import clod as clod_ops
        from ..ops import textures as tex_ops
        from ..ops.raster_pallas import raster_tiles_pallas
        from ..ops.raster_ref import raster_tiles_ref
        from ..ops.resolve_pallas import resolve_attributes_ref
        tau = params.clod_error_px
        base_cut, _ = clod_ops.select_cluster_cut(scene, view, config, tau)
        cut_m = base_cut & (scene.cluster_table[:, 10] > 1.5)
        comp_m = clod_ops.compact_visible_tris(
            cut=cut_m, scene=scene, max_visible=config.mask_clusters)
        lanes_m, bbox_m, valid_m, _mask_clip_ovf = \
            raster_setup.setup_from_compacted(
                scene, comp_m, view.viewproj, config)
        pairs_m = localize(raster_setup.bin_clustered(lanes_m, bbox_m,
                                                      valid_m, config))

        def _mask_alpha_keep(dm, vm, chm, depth_ref_p):
            """Padded keep mask: covered, nearer than current depth, and
            the sampled base alpha beats the material cutoff. 1/w derives
            from the masked depth buffer (shade.inv_w_from_depth)."""
            iwm_p = shade_ops.inv_w_from_depth(dm, view.proj)
            iwm = jnp.where(jnp.abs(iwm_p) > 1e-12, iwm_p, 1.0)
            uv_m = jnp.stack([chm[2] / iwm, chm[3] / iwm], axis=-1)[:H, :W]
            mid_m = (jnp.round(chm[4]).astype(jnp.int32)
                     % raster_setup.OBJ_COMBO)[:H, :W]
            mrow = raster_setup.gather_rows_onehot(
                scene.material_table, jnp.clip(
                    mid_m.reshape(-1), 0,
                    scene.material_table.shape[0] - 1))
            cutoff = mrow[:, 11].reshape(H, W)
            factor_a = mrow[:, 3].reshape(H, W)
            ds_m, filt_m = config.texture_downscale, config.texture_filter
            if ds_m > 1 and H % ds_m == 0 and W % ds_m == 0:
                # Downsampled 2-D PLANES straight from the masked channels
                # — the [::ds] strided-slice entry point compiles to gather
                # fusions (~9 ms/frame at 1080p, profiled on the city
                # bench).
                from ..ops.shadows import downsample2d
                c0m = shade_ops.inv_w_from_depth(
                    downsample2d(dm[:H, :W], ds_m), view.proj)
                iw_ds = jnp.where(jnp.abs(c0m) > 1e-12, c0m, 1.0)
                um_ds = downsample2d(chm[2][:H, :W], ds_m) / iw_ds
                vm_ds = downsample2d(chm[3][:H, :W], ds_m) / iw_ds
                midm_ds = jnp.clip(
                    jnp.round(downsample2d(chm[4][:H, :W], ds_m))
                    .astype(jnp.int32) % raster_setup.OBJ_COMBO,
                    0, scene.material_table.shape[0] - 1)
                trow_ds = raster_setup.gather_rows_onehot(
                    scene.material_table[:, 13:17], midm_ds.reshape(-1))
                btex_ds = jnp.round(trow_ds[:, 0]).astype(jnp.int32) \
                    .reshape(midm_ds.shape)
                covered_ds = downsample2d(vm[:H, :W], ds_m) > 0
                btex_ds = jnp.where(covered_ds, btex_ds, -1)
                smp_a = halo_upsample(
                    tex_ops.sample_pyramid_blocked_planes(
                        scene.tex_strips, scene.tex_flags, btex_ds[None],
                        um_ds, vm_ds, H, W, ds_m, filt_m, upsample=False,
                        mipf=halo_mipf(um_ds, vm_ds),
                        fmt=config.tex_format),
                    ds_m, H, W, row_axis=1)[0]
            else:
                btex = jnp.round(mrow[:, 13]).astype(jnp.int32) \
                    .reshape(H, W)
                smp_a = tex_ops.sample_pyramid_blocked(
                    scene.tex_strips, scene.tex_flags, btex[None], uv_m,
                    ds_m, filt_m, fmt=config.tex_format)[0]
            alpha_m = jnp.pad(smp_a[..., 3] * factor_a,
                              ((0, lcfg.padded_height - H),
                               (0, lcfg.padded_width - W)))
            keep = (vm > 0) & (dm > depth_ref_p)
            return keep & (alpha_m >= jnp.pad(
                cutoff, ((0, lcfg.padded_height - H),
                         (0, lcfg.padded_width - W))))

        depth_pre_mask = depth_p
        dm, vm, chm = visibility_pass(pairs_m, lcfg, tile_row0=row0_tiles)
        keep = _mask_alpha_keep(dm, vm, chm, depth_p)
        depth_p = jnp.where(keep, dm, depth_p)
        vis_p = jnp.where(keep, vm, vis_p)
        channels = jnp.where(keep[None], chm, channels)
        for _peel in range(config.mask_peels - 1):
            # Next-farther masked layer: the peel band excludes the
            # previous layer's fragments; the depth merge then only admits
            # texels where every nearer masked texel failed its cutoff.
            if lcfg.use_pallas_raster:
                dm, vm, chm = raster_tiles_pallas(
                    pairs_m, lcfg,
                    peel=(depth_pre_mask, dm * (1.0 - 1e-4)),
                    interpret=lcfg.pallas_interpret, tile_row0=row0_tiles)
            else:
                dm, vm = raster_tiles_ref(
                    pairs_m, lcfg, tile_row0=row0_tiles,
                    peel=(depth_pre_mask, dm * (1.0 - 1e-4)))
                chm = resolve_attributes_ref(pairs_m, vm, lcfg,
                                             tile_row0=row0_tiles)
            keep = _mask_alpha_keep(dm, vm, chm, depth_p)
            depth_p = jnp.where(keep, dm, depth_p)
            vis_p = jnp.where(keep, vm, vis_p)
            channels = jnp.where(keep[None], chm, channels)

    depth = depth_p[:H, :W]
    vis = vis_p[:H, :W]
    gb = shade_ops.gbuffer_from_channels(
        channels[:, :H, :W], depth, vis, view, scene.material_table,
        config.width, config.height, row0=row0_px)

    tex_wanted = None
    if config.enable_textures:
        # Material texture fetches (reference: VisUtilEvaluate/gbuffer.hlsl
        # through the descriptor heap). All live channels ride ONE call of
        # the block-window MXU sampler (ops/textures.py) sharing window
        # geometry: base color + alpha (sRGB), tangent-space normal,
        # metallic-roughness (glTF: G=rough B=metal), emissive (sRGB).
        # Texture factors multiply per glTF semantics.
        from ..ops import textures as tex_ops
        from ..ops.shadows import downsample2d
        ds, filt = config.texture_downscale, config.texture_filter
        chans = config.tex_channels
        if ds > 1 and H % ds == 0 and W % ds == 0:
            # Feed the sampler pre-downsampled 2-D PLANES straight from the
            # resolve channels — strided [::ds] slices of channel-minor
            # images compile to gather fusions (~8 ms/frame at 1080p).
            c0 = shade_ops.inv_w_from_depth(
                downsample2d(depth, ds), view.proj)
            iwm = jnp.where(jnp.abs(c0) > 1e-12, c0, 1.0)
            u_ds = downsample2d(channels[2][:H, :W], ds) / iwm
            v_ds = downsample2d(channels[3][:H, :W], ds) / iwm
            mid_ds = jnp.clip(
                jnp.round(downsample2d(channels[4][:H, :W], ds))
                .astype(jnp.int32) % raster_setup.OBJ_COMBO,
                0, scene.material_table.shape[0] - 1)
            covered_ds = downsample2d(vis, ds) > 0
            trow = raster_setup.gather_rows_onehot(
                scene.material_table[:, 13:17], mid_ds.reshape(-1))
            lane_of = {"base": 0, "normal": 1, "mr": 2, "emissive": 3}
            tids_ds = jnp.stack([
                jnp.where(covered_ds,
                          jnp.round(trow[:, lane_of[c]]).astype(jnp.int32)
                          .reshape(covered_ds.shape), -1)
                for c in chans])
            smp = tex_ops.sample_pyramid_blocked_planes(
                scene.tex_strips, scene.tex_flags, tids_ds, u_ds, v_ds,
                H, W, ds, filt, upsample=False,
                mipf=halo_mipf(u_ds, v_ds), fmt=config.tex_format)
            # Seam-exact ds->full upsample (halo row exchange when sharded).
            smp = halo_upsample(smp, ds, H, W, row_axis=1)
            if config.enable_texture_streaming:
                # Sampler feedback for the texture streamer (readback ->
                # models/texstream.py; reference: sampler-feedback
                # residency).
                tex_wanted = tex_ops.wanted_mips(
                    scene.tex_flags, tids_ds, u_ds, v_ds,
                    tex_ops.infer_strip_resolution(
                        scene.tex_strips.shape[0]
                        // scene.tex_flags.shape[0], config.tex_format))
                if axis is not None:
                    # Sharded: each device saw only its rows' samples —
                    # the FINEST wanted mip is the cross-shard min.
                    tex_wanted = jax.lax.pmin(tex_wanted, axis)
        else:
            id_of = {"base": gb.base_tex, "normal": gb.normal_tex,
                     "mr": gb.mr_tex, "emissive": gb.emissive_tex}
            tex_ids = jnp.stack([id_of[c] for c in chans])
            smp = tex_ops.sample_pyramid_blocked(
                scene.tex_strips, scene.tex_flags, tex_ids, gb.uv, ds, filt,
                fmt=config.tex_format)
        # Barrier in (K*4, H, W) layout: stops XLA from re-running the whole
        # sampler inside every consumer fusion (producer duplication — the
        # measured cost was 13x), and keeps the padded minor dims image-
        # shaped instead of padding the 4-lane channel dim to 128.
        K = len(chans)
        H_, W_ = gb.uv.shape[:2]
        smp = jax.lax.optimization_barrier(
            smp.transpose(0, 3, 1, 2).reshape(K * 4, H_, W_))
        smp = smp.reshape(K, 4, H_, W_).transpose(0, 2, 3, 1)
        s_of = {c: smp[k] for k, c in enumerate(chans)}
        rep = {}
        if "base" in s_of:
            rep["albedo"] = gb.albedo * s_of["base"][..., :3]
            if gb.alpha is not None:
                rep["alpha"] = gb.alpha * s_of["base"][..., 3]
        if "normal" in s_of:
            tb = None
            if config.enable_vertex_tangents and gb.tangent_theta is not None:
                tb = shade_ops.tangent_from_theta(gb.normal,
                                                  gb.tangent_theta)
            rep["normal"] = tex_ops.apply_normal_map_sampled(
                gb.normal, gb.world_pos, gb.uv, s_of["normal"],
                gb.normal_tex,
                normal_scale=gb.normal_scale[..., None], frame=tb)
        if "mr" in s_of:
            rep["roughness"] = gb.roughness * s_of["mr"][..., 1]
            rep["metallic"] = gb.metallic * s_of["mr"][..., 2]
        if "emissive" in s_of:
            rep["emissive"] = gb.emissive * s_of["emissive"][..., :3]
        gb = gb._replace(**rep)

    shadow_fn = None
    vsm_state_out = None
    if config.enable_vsm and vsm_state is not None:
        # Virtual shadow maps: clipmap page cache for the primary
        # directional light (ops/vsm.py; reference: VSM pass stack,
        # VirtualShadowMapSetupPass.cpp). Pages raster through the same
        # cluster-cut machinery with the CAMERA's LOD selection and the
        # PAGE's frustum.
        from ..ops import clod as clod_ops
        from ..ops import vsm as vsm_ops
        from ..utils import math3d

        def page_compact(vp):
            cut, cw, rw = clod_cut(scene, view, config, params,
                                   frustum=False, return_bounds=True)
            planes = math3d.frustum_planes(vp)
            cut = cut & math3d.sphere_in_frustum(planes, cw, rw)
            return clod_ops.compact_visible_tris(
                cut=cut, scene=scene,
                max_visible=config.vsm_page_clusters)

        # One independent page cache per VSM'd directional light (the
        # bridge packs directional lights first; vsm_num_lights > 1
        # threads a tuple of VsmStates through the frame).
        nl_vsm = getattr(config, "vsm_num_lights", 1)
        vsm_states_in = (vsm_state,) if nl_vsm <= 1 else tuple(vsm_state)
        gdepth = gather_rows(depth)
        vsm_terms, vsm_states_new = [], []
        vsm_stats = None
        for k in range(nl_vsm):
            term_k, st_k, stats_k = vsm_ops.update_vsm(
                scene, view, config, params, vsm_states_in[k],
                gdepth, page_compact, full_h=full_h, light_row=k)
            term_k = local_rows(term_k)
            vsm_terms.append(jnp.where(scene.num_dir_lights > k,
                                       term_k, 1.0))
            vsm_states_new.append(st_k)
            vsm_stats = stats_k if vsm_stats is None else \
                {kk: vsm_stats[kk] + stats_k[kk] for kk in vsm_stats}
        vsm_state_out = vsm_states_new[0] if nl_vsm <= 1 \
            else tuple(vsm_states_new)

        def shadow_fn(i, wp, n):
            t = jnp.ones_like(vsm_terms[0])
            for k in range(nl_vsm):
                t = jnp.where(i == k, vsm_terms[k], t)
            return t
    elif config.enable_shadows:
        # Cascaded shadow maps for the primary directional light
        # (reference: LightManager directional cascades; ops/shadows.py).
        # The bridge packs directional lights first, so row 0 is the
        # primary directional light whenever num_dir_lights > 0; the
        # shadow term is neutralized otherwise.
        from ..ops import shadows as shadow_ops
        ldir = scene.lights[0, 4:7]
        cascade_vps, _splits = shadow_ops.cascade_matrices(
            view, ldir, config.num_cascades)
        if config.enable_clod:
            shadow_tris = clod_compact(scene, view, config, params,
                                       frustum=False,
                                       max_visible=config.shadow_clusters)
        else:
            shadow_tris = None
        smaps = jnp.stack([
            shadow_ops.render_cascade(scene, cascade_vps[k], config,
                                      compacted=shadow_tris)
            for k in range(config.num_cascades)])
        # The term's half-res sampling + upsample + 3x3 smooth cross tile
        # rows -> computed on the gathered frame when sharded (like GTAO).
        shadow_term = local_rows(shadow_ops.sample_shadow_cascades(
            gather_rows(depth), view, cascade_vps, smaps,
            params.shadow_bias, full_h=full_h))
        shadow_term = jnp.where(scene.num_dir_lights > 0, shadow_term, 1.0)

        def shadow_fn(i, wp, n):
            return jnp.where(i == 0, shadow_term, jnp.ones_like(shadow_term))

    if config.enable_clustered:
        # Tiled many-light pass (reference: clustered lighting,
        # clustering.hlsl + lightCulling.hlsl — see ops/lighting.py for
        # the TPU-shaped redesign).
        payload, counts, light_overflow = lighting.cull_lights_tiles(
            depth_p, scene.lights, scene.num_lights, view, config,
            row0_tiles=row0_tiles)
        Hp, Wp = lcfg.padded_height, lcfg.padded_width

        def pad(x):
            return jnp.pad(x, ((0, Hp - H), (0, Wp - W)))

        shade_in = jnp.stack([
            pad(gb.normal[..., 0]), pad(gb.normal[..., 1]), pad(gb.normal[..., 2]),
            pad(gb.albedo[..., 0]), pad(gb.albedo[..., 1]), pad(gb.albedo[..., 2]),
            pad(gb.metallic), pad(gb.roughness),
            pad(gb.world_pos[..., 0]), pad(gb.world_pos[..., 1]),
            pad(gb.world_pos[..., 2]),
            pad(gb.valid.astype(jnp.float32)),
        ])
        shade_in = jax.lax.optimization_barrier(shade_in)
        if lcfg.use_pallas_raster:
            local = lighting.tiled_shade_pallas(
                shade_in, payload, counts, view.cam_pos, lcfg,
                interpret=lcfg.pallas_interpret)
        else:
            local = lighting.tiled_shade_ref(
                shade_in, payload, counts, view.cam_pos, lcfg)
        hdr = shade_ops.shade_deferred(gb, scene, view, shadow_fn=shadow_fn,
                                       directional_only=True,
                                       coat=config.enable_coat,
                                       energy=config.enable_energy_comp,
                                       fuzz=config.enable_fuzz,
                                       sss=config.enable_sss,
                                       aniso=config.enable_aniso)
        hdr = hdr + local[:, :H, :W].transpose(1, 2, 0)
    else:
        light_overflow = jnp.int32(0)
        hdr = shade_ops.shade_deferred(gb, scene, view, shadow_fn=shadow_fn,
                                       coat=config.enable_coat,
                                       energy=config.enable_energy_comp,
                                       fuzz=config.enable_fuzz,
                                       sss=config.enable_sss,
                                       aniso=config.enable_aniso)

    if config.enable_clustered and config.max_shadow_cubes > 0:
        # Point-light cube shadows: 6 perspective faces per light rendered
        # through the shared caster cut; sampling picks the face by the
        # dominant axis and takes one combined gather (reference:
        # LightManager omni shadow cameras).
        import dataclasses as _dc
        from ..ops import shadows as shadow_ops
        cvps6, cidx, clive = shadow_ops.point_cube_matrices(
            scene.lights, config.max_shadow_cubes)
        cube_cfg = _dc.replace(
            config, shadow_resolution=config.point_shadow_resolution)
        cube_tris = clod_compact(scene, view, config, params, frustum=False,
                                 max_visible=config.shadow_clusters)
        vdir_c = view.cam_pos[None, None, :] - gb.world_pos
        vdir_c = vdir_c / jnp.maximum(
            jnp.linalg.norm(vdir_c, axis=-1, keepdims=True), 1e-12)
        comp_c, fuzz_c = shade_ops.openpbr_terms(
            gb, vdir_c, gb.normal, config.enable_energy_comp,
            config.enable_fuzz)
        Lc = scene.lights.shape[0]
        for c in range(config.max_shadow_cubes):
            maps = jnp.stack([
                shadow_ops.render_cascade(scene, cvps6[c, f], cube_cfg,
                                          compacted=cube_tris)
                [:config.point_shadow_resolution,
                 :config.point_shadow_resolution]
                for f in range(6)])
            row = scene.lights[jnp.clip(cidx[c], 0, Lc - 1)]
            term = local_rows(shadow_ops.sample_point_shadow(
                gather_rows(depth), view, row[0:3], cvps6[c], maps,
                full_h=full_h))
            contrib = shade_ops.shade_one_light(gb, row, vdir_c, gb.normal,
                                                spec_comp=comp_c,
                                                fuzz_e=fuzz_c)
            hdr = hdr + jnp.where(clive[c], contrib * term[..., None], 0.0)

    if config.enable_clustered and config.max_shadow_lights > 0:
        # Shadow-casting SPOT lights: excluded from the tiled loop
        # (ops/lighting.py), each shades full-screen with its own shadow
        # map (reference: LightManager per-light shadow cameras + atlas).
        import dataclasses as _dc
        from ..ops import shadows as shadow_ops
        svps, sidx, slive = shadow_ops.spot_shadow_matrices(
            scene.lights, config.max_shadow_lights)
        spot_cfg = _dc.replace(
            config, shadow_resolution=config.spot_shadow_resolution)
        spot_tris = clod_compact(scene, view, config, params, frustum=False,
                                 max_visible=config.shadow_clusters)
        vdir = view.cam_pos[None, None, :] - gb.world_pos
        vdir = vdir / jnp.maximum(
            jnp.linalg.norm(vdir, axis=-1, keepdims=True), 1e-12)
        comp_s, fuzz_s = shade_ops.openpbr_terms(
            gb, vdir, gb.normal, config.enable_energy_comp,
            config.enable_fuzz)
        L = scene.lights.shape[0]
        for k in range(config.max_shadow_lights):
            smap = shadow_ops.render_cascade(scene, svps[k], spot_cfg,
                                             compacted=spot_tris)
            term = local_rows(shadow_ops.sample_spot_shadow(
                gather_rows(depth), view, svps[k], smap,
                params.shadow_bias, full_h=full_h))
            row = scene.lights[jnp.clip(sidx[k], 0, L - 1)]
            contrib = shade_ops.shade_one_light(gb, row, vdir, gb.normal,
                                                spec_comp=comp_s,
                                                fuzz_e=fuzz_s)
            hdr = hdr + jnp.where(slive[k],
                                  contrib * term[..., None], 0.0)

    sky = shade_ops.procedural_sky(view, H, W, params.sky_intensity,
                                   row0=row0_px, full_h=full_h)
    if config.enable_voxel_fallback:
        # Voxel LOD fallback: pixels the budgeted cut / streaming
        # residency left uncovered march the scene voxel pyramid instead
        # of dropping to background (reference: VoxelGroupBuilder.cpp +
        # voxelSoftwareRaster.hlsl — the coarser-than-coarsest-LOD tier).
        from ..ops import voxel_rt as vox_ops
        vox_col, vox_tr = vox_ops.voxel_primary(
            scene, view, config, H, W, row0=row0_px, full_h=full_h)
        sky = vox_col + vox_tr[..., None] * sky
    hdr = jnp.where(gb.valid[..., None], hdr, sky)

    ssr_col = ssr_wgt = None
    if config.enable_ssr:
        # Screen-space reflections march the DIRECT-lit frame (+sky) and
        # blend into the environment-specular term below (reference:
        # BuildSSRPipeline, RenderGraphBuildHelper.h:532-585). Rays cross
        # rows -> computed on the gathered frame when sharded.
        from ..ops import ssr as ssr_ops
        ssr_col, ssr_wgt = ssr_ops.ssr(
            gather_rows(hdr), gather_rows(depth), gather_rows(gb.normal),
            gather_rows(gb.roughness), gather_rows(gb.metallic), view,
            config, full_h=full_h)
        ssr_col = local_rows(ssr_col)
        ssr_wgt = local_rows(ssr_wgt)

    vox_ref = vox_ref_tr = None
    if config.enable_voxel_rt:
        # Ray-traced reflection fallback: cone-trace the voxel pyramid
        # along the reflected view ray. SSR handles on-screen hits;
        # this supplies OFF-screen content the reference gets from
        # RayTracedReflectionsPass over the cluster BLAS
        # (CLodRayTracingSystem.h:16-75). Composited into the env-specular
        # slot below: voxel radiance replaces the prefiltered environment
        # by 1 - transmittance; SSR hits then override both.
        from ..ops import voxel_rt as vox_ops
        vox_ref, vox_ref_tr = vox_ops.voxel_reflections(
            scene, gather_rows(depth), gather_rows(gb.normal), view,
            config, full_h=full_h)
        vox_ref = local_rows(vox_ref)
        vox_ref_tr = local_rows(vox_ref_tr)

    rt_col = rt_hit = None
    if config.enable_rt_reflect and config.enable_clod:
        # Triangle-accurate reflections over the resident cut (the
        # reference's CLAS/BLAS/TLAS trace, TPU-reshaped —
        # ops/rt_reflect.py). Recomputes the opaque compaction; XLA CSEs
        # it against the geometry pass when the configs match.
        from ..ops import rt_reflect as rt_ops
        comp_rt = clod_compact(scene, view, config, params)
        rt_col, rt_hit = rt_ops.trace_reflections(
            scene, comp_rt, gather_rows(depth), gather_rows(gb.normal),
            view, config, full_h=full_h)
        rt_col = local_rows(rt_col)
        rt_hit = local_rows(rt_hit)

    ao = None
    if config.enable_gtao:
        # XeGTAO analogue (shift-tap variant, ops/post.py). Cross-row taps
        # => computed on the gathered frame when sharded.
        from ..ops import post as post_ops
        ao = local_rows(post_ops.gtao(
            gather_rows(depth), gather_rows(gb.normal), view, view.near,
            params.gtao_radius, params.gtao_intensity, params.frame_index))
        ao = jnp.where(gb.valid, ao, 1.0)

    if config.enable_ibl:
        # Ambient IBL (reference: IBL.hlsli — SH diffuse + split-sum
        # specular with the Karis analytic env-BRDF, see ops/ibl.py).
        from ..ops import ibl as ibl_ops
        v = view.cam_pos[None, None, :] - gb.world_pos
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        ndv = jnp.maximum(jnp.sum(gb.normal * v, -1), 1e-4)
        irr = ibl_ops.eval_sh_irradiance(scene.env_sh, gb.normal)
        f0 = 0.04 * (1 - gb.metallic[..., None]) + gb.albedo * gb.metallic[..., None]
        kd = (1.0 - f0) * (1.0 - gb.metallic[..., None])
        diffuse_ibl = kd * gb.albedo * irr
        scale, bias = ibl_ops.env_brdf_karis(ndv, gb.roughness)
        prefiltered = ibl_ops.runtime_specular_ibl(
            gb.normal, v, gb.roughness, scene.env_specular,
            downscale=config.ibl_specular_downscale)
        if vox_ref is not None:
            # Ray-traced (voxel) radiance replaces the environment where
            # the cone hit scene geometry.
            prefiltered = vox_ref + prefiltered * vox_ref_tr[..., None]
        if rt_col is not None:
            # Triangle-accurate hits override the voxel/env tiers; SSR
            # (on-screen, full-detail) still overrides everything below.
            prefiltered = prefiltered * (1.0 - rt_hit[..., None]) \
                + rt_col * rt_hit[..., None]
        if ssr_col is not None:
            # SSR hits replace the prefiltered environment radiance.
            prefiltered = prefiltered * (1.0 - ssr_wgt[..., None]) \
                + ssr_col * ssr_wgt[..., None]
        spec_ibl = prefiltered * (f0 * scale[..., None] + bias[..., None])
        if config.enable_energy_comp:
            # Kulla-Conty multi-scatter term on the env specular too
            # (ops/brdf_energy.py fitted albedo; same factor as the
            # analytic lights so the furnace stays white).
            from ..ops import brdf_energy
            spec_ibl = spec_ibl * brdf_energy.energy_compensation(
                f0, ndv, gb.roughness)
        if config.enable_fuzz and gb.fuzz_weight is not None:
            # Fuzz over the environment: attenuate base by the layer's
            # directional albedo, add a sheen-colored irradiance term.
            from ..ops import brdf_energy
            fe = (gb.fuzz_weight * brdf_energy.sheen_energy(
                ndv, gb.fuzz_rough))[..., None]
            spec_ibl = spec_ibl * (1.0 - fe) + irr * fe
            diffuse_ibl = diffuse_ibl * (1.0 - fe)
        if config.enable_coat:
            # OpenPBR coat over the environment: a second prefiltered
            # fetch at the coat roughness, base attenuated by coat Fresnel.
            cf = shade_ops._f_schlick(ndv[..., None], jnp.float32(0.05))
            cw = gb.coat_weight[..., None]
            coat_pref = ibl_ops.runtime_specular_ibl(
                gb.normal, v, gb.coat_rough, scene.env_specular,
                downscale=config.ibl_specular_downscale)
            spec_ibl = spec_ibl * (1.0 - cf * cw) + coat_pref * cf * cw
            diffuse_ibl = diffuse_ibl * (1.0 - cf * cw)
        ambient = (diffuse_ibl + spec_ibl) * params.ibl_intensity
        if ao is not None:
            ambient = ambient * ao[..., None]
        hdr = hdr + jnp.where(gb.valid[..., None], ambient, 0.0)
    elif ao is not None:
        hdr = hdr * (0.5 + 0.5 * ao[..., None])
    if (config.enable_ssr or vox_ref is not None) and not config.enable_ibl:
        # Without IBL there is no env-specular slot; add the reflection
        # directly with the Fresnel-at-normal tint.
        f0 = 0.04 * (1 - gb.metallic[..., None]) \
            + gb.albedo * gb.metallic[..., None]
        refl = jnp.zeros_like(hdr)
        if vox_ref is not None:
            refl = vox_ref
        if config.enable_ssr:
            refl = refl * (1.0 - ssr_wgt[..., None]) \
                + ssr_col * ssr_wgt[..., None]
        hdr = hdr + jnp.where(gb.valid[..., None], refl * f0, 0.0)

    oit_overflow = jnp.int32(0)
    if config.enable_oit and config.enable_clod:
        # K-layer depth-peeled OIT (reference: deep-visibility /
        # AVBOIT transparency; ops/oit.py for the TPU variant).
        from ..ops import oit as oit_ops
        hdr, oit_overflow = oit_ops.composite_oit(
            scene, view, config, params, depth_p, hdr, lcfg=lcfg,
            row0_tiles=row0_tiles, localize=localize)

    from ..ops import post as post_ops
    upscaling = (config.output_width > 0
                 and (config.output_width, config.output_height)
                 != (config.width, config.height))
    if upscaling:
        # TAAU (reference: UpscalingManager render-low/present-high): the
        # jittered low-res frame upsamples into OUTPUT-res space where the
        # TAA history accumulates — the sub-pixel jitter sequence is what
        # recovers detail past the render resolution. Single-chip only
        # (sharded frames keep native TAA).
        assert axis is None, "TAAU upscaling is single-chip"
        assert config.enable_taa, "upscaling requires enable_taa"
        hdr = jax.image.resize(
            hdr, (config.output_height, config.output_width, 3), "bilinear")
    if config.enable_taa and taa_history is not None:
        if prev_viewproj is not None and axis is None:
            # Motion-vector reprojection (reference: UpscalingManager
            # motion-vector tagging, UpscalingManager.h:23-80): per-pixel
            # motion from depth + object ids (ops/motion.py), history
            # warped per tile (ops/taa_warp.py), disagreeing pixels reject
            # history. The sharded path keeps the camera-jitter resolve
            # (its history is row-sharded; warps cross shard rows).
            from ..ops import motion as motion_ops
            if moving_rel is None:
                moving_rel = jnp.zeros((motion_ops.MAX_MOVING, 4, 4),
                                       jnp.float32)
                moving_ids = jnp.full((motion_ops.MAX_MOVING,), -1,
                                      jnp.int32)
            du, dv, mvalid, mds = motion_ops.motion_field(
                depth_p, channels[4], view, prev_viewproj,
                moving_rel, moving_ids, config, row0=row0_px, full_h=full_h,
                full_w=config.width)
            tdy, tdx, resid = motion_ops.tile_motion(du, dv, mvalid,
                                                     config, mds)
            oh, ow = hdr.shape[:2]
            if (oh, ow) != (H, W):
                # TAAU: motion computed at render res; rescale the tile
                # maps to the output-res tile grid and pixel units.
                oty = -(-oh // config.tile_h)
                otx = -(-ow // config.tile_w)
                sy_s, sx_s = oh / H, ow / W
                tdy = jax.image.resize(
                    tdy.reshape(config.tiles_y, config.tiles_x) * sy_s,
                    (oty, otx), "nearest").reshape(-1)
                tdx = jax.image.resize(
                    tdx.reshape(config.tiles_y, config.tiles_x) * sx_s,
                    (oty, otx), "nearest").reshape(-1)
                resid = resid * jnp.float32(max(sy_s, sx_s))
            hdr = post_ops.taa_resolve_mv(
                hdr, taa_history, params.taa_blend, tdy, tdx, resid,
                config.tile_h, config.tile_w,
                use_kernel=lcfg.use_pallas_raster,
                interpret=lcfg.pallas_interpret)
        else:
            hdr = post_ops.taa_resolve(hdr, taa_history, params.taa_blend)
    taa_out = hdr
    if config.enable_bloom:
        hdr = local_rows(post_ops.bloom(gather_rows(hdr),
                                        params.bloom_threshold,
                                        params.bloom_intensity))
    exposure = params.exposure
    if config.enable_auto_exposure:
        exposure = exposure * post_ops.auto_exposure(gather_rows(hdr))

    if config.debug_view != "none":
        # Debug visualizations (reference: Menu debug-view selector +
        # debug resolve pass, Menu.h:163-170 / RenderGraphBuildHelper).
        if config.debug_view == "normals":
            hdr = gb.normal * 0.5 + 0.5
        elif config.debug_view == "depth":
            d = jnp.clip(gb.depth / jnp.maximum(gb.depth.max(), 1e-6), 0, 1)
            hdr = jnp.stack([d, d, d], -1)
        elif config.debug_view == "albedo":
            hdr = gb.albedo
        elif config.debug_view == "material":
            mid = gb.material_id.astype(jnp.float32)
            hdr = jnp.stack([jnp.sin(mid * 3.1) * 0.5 + 0.5,
                             jnp.sin(mid * 7.7) * 0.5 + 0.5,
                             jnp.sin(mid * 13.3) * 0.5 + 0.5], -1)
        elif config.debug_view == "clusters":
            cid = vis.astype(jnp.float32) / 128.0
            hdr = jnp.stack([jnp.sin(cid * 12.9898) * 0.5 + 0.5,
                             jnp.sin(cid * 78.233) * 0.5 + 0.5,
                             jnp.sin(cid * 37.719) * 0.5 + 0.5], -1)
        elif config.debug_view == "ao" and ao is not None:
            hdr = jnp.stack([ao, ao, ao], -1)
        elif config.debug_view == "uv":
            hdr = jnp.concatenate(
                [gb.uv, jnp.zeros_like(gb.uv[..., :1])], -1)
        hdr = jnp.where(gb.valid[..., None], hdr, 0.0)
        srgb_img = jnp.clip(hdr, 0.0, 1.0)
        image = (srgb_img * 255.0 + 0.5).astype(jnp.uint8)
        return {
            "image": image, "hdr": hdr, "depth": depth,
            "depth_padded": depth_p, "vis": vis,
            "bin_overflow": pairs.overflow, "num_pairs": pairs.num_pairs,
            "cluster_overflow": cluster_overflow,
            "light_overflow": light_overflow, "taa_out": hdr,
            **({"vsm_state": vsm_state_out, "vsm_stats": vsm_stats}
               if vsm_state_out is not None else {}),
            **({"tex_wanted": tex_wanted} if tex_wanted is not None
               else {}),
        }

    if config.wireframe and hdr.shape[:2] == vis.shape:
        # Triangle-edge overlay from the visibility buffer: a pixel whose
        # vis id differs from its left/up neighbor sits on a triangle edge
        # (reference: the wireframe PSO toggle, PSOKey{..., wireframe}
        # PSOManager.h:24-49 — here a post overlay, same visual intent).
        edge = (vis != jnp.pad(vis, ((0, 0), (1, 0)))[:, :-1]) \
            | (vis != jnp.pad(vis, ((1, 0), (0, 0)))[:-1, :])
        edge = edge & (vis > 0)
        hdr = jnp.where(edge[..., None],
                        jnp.array([0.05, 1.0, 0.25], jnp.float32), hdr)

    ldr = shade_ops.aces_tonemap(hdr * exposure)
    srgb = shade_ops.linear_to_srgb(ldr)
    image = (srgb * 255.0 + 0.5).astype(jnp.uint8)

    touched = None
    if config.enable_streaming:
        from ..ops import clod as clod_ops
        touched = clod_ops.touched_groups(scene, view, config,
                                          params.clod_error_px)
    return {
        "image": image,
        "hdr": hdr,
        **({"touched_groups": touched} if touched is not None else {}),
        **({"tex_wanted": tex_wanted} if tex_wanted is not None else {}),
        "depth": depth,
        "depth_padded": depth_p,   # next frame's occlusion HZB source
        "vis": vis,
        "bin_overflow": pairs.overflow,
        "num_pairs": pairs.num_pairs,
        "cluster_overflow": cluster_overflow,
        "light_overflow": light_overflow,
        "oit_overflow": oit_overflow,
        "taa_out": taa_out,
        **({"vsm_state": vsm_state_out, "vsm_stats": vsm_stats}
           if vsm_state_out is not None else {}),
    }


def build_frame_fn(config: FrameConfig) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Returns the traced single-chip frame function (not yet jitted).

    With `enable_occlusion`, the frame takes the previous frame's (padded)
    depth buffer and performs two-phase occlusion culling at object
    granularity: phase 1 rasters objects unoccluded against the previous
    HZB; phase 2 re-tests the rejected candidates against the fresh HZB and
    rasters newly-visible ones into the same buffers (reference: phase-1/2
    occlusion with replay buffers, CLodExtension.cpp:1474-1514)."""

    def frame(scene: SceneBuffers, view: ViewData, params: FrameParams,
              prev_depth: jnp.ndarray = None,
              taa_history: jnp.ndarray = None,
              vsm_state=None, prev_viewproj: jnp.ndarray = None,
              moving_rel: jnp.ndarray = None,
              moving_ids: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
        return _render_body(scene, view, params, prev_depth, taa_history,
                            vsm_state, prev_viewproj, moving_rel, moving_ids,
                            config=config, lcfg=config,
                            row0_tiles=0, axis=None)

    return frame


class FrameProgramCache:
    """jit-specialization cache keyed by FrameConfig (the analogue of the
    reference's compiled-render-graph cache, README.md:27)."""

    def __init__(self):
        self._cache: Dict[FrameConfig, Callable] = {}

    def get(self, config: FrameConfig) -> Callable:
        fn = self._cache.get(config)
        if fn is None:
            fn = jax.jit(build_frame_fn(config))
            self._cache[config] = fn
        return fn

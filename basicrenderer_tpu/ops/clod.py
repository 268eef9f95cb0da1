"""Runtime cluster-LOD selection: the Nanite-style DAG cut.

Reference analogue: the LOD-cut selection inside hierarchical culling
(reference: shaders/ClusterLOD/computeCulling.hlsl — screen-space-error
test per cluster/DAG node with the parent-error monotonicity invariant;
budgets via visible-cluster capacity, Renderer.cpp:2494 maxClusters=30M).

TPU redesign: the reference traverses the DAG with persistent GPU frontiers
(data-dependent work expansion). Because the error metric is monotonic
(parent_error > self_error along every path), the cut is *separable*: a
cluster belongs to the cut iff

    screen_err(self_error)  <= tau  <  screen_err(parent_error)

which evaluates independently per cluster — a single vectorized pass over
the fixed-capacity cluster table, no traversal loop at all. This is the
compiler-friendly reformulation of the traversal; frustum/occlusion culling
then mask the selected clusters exactly like objects.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph.framedata import FrameConfig, SceneBuffers, ViewData
from . import raster_setup
from .. utils import math3d


class CompactedTris(NamedTuple):
    """Visible-cluster triangle compaction (fixed budget Kc x 128)."""
    indices: jnp.ndarray    # (Kt, 3) i32 global vertex ids
    material: jnp.ndarray   # (Kt,) i32
    object: jnp.ndarray     # (Kt,) i32
    valid: jnp.ndarray      # (Kt,) bool
    overflow: jnp.ndarray   # () i32 clusters dropped over budget
    geom: jnp.ndarray       # (Kc,) i32 geometry-cluster page ids
    # Slot-level metadata for SLOT-GRANULAR culling (graph/frame.py
    # two-phase occlusion): testing the Kc compacted slots instead of the
    # (C,)-capacity table turns the per-element HZB gathers from
    # capacity-scaled (~1.8 ms at 64k rows) into budget-scaled (~0.1 ms).
    slot_cluster: jnp.ndarray = None  # (Kc,) i32 cluster id (-1 dead)
    slot_object: jnp.ndarray = None   # (Kc,) i32 owning object
    slot_bound: jnp.ndarray = None    # (Kc, 4) f32 TIGHT object-space
    #                                   sphere (table lanes 16-19)


def _screen_error_factor(view: ViewData, height: int) -> jnp.ndarray:
    """World-space error -> on-screen pixels ~ err * f / dist where
    f = proj[1,1] * height / 2 (perspective scale)."""
    return view.proj[1, 1] * (height * 0.5)


def select_cluster_cut(scene: SceneBuffers, view: ViewData, config: FrameConfig,
                       tau_px: jnp.ndarray,
                       object_visible: Optional[jnp.ndarray] = None,
                       frustum: bool = True, return_bounds: bool = False
                       ) -> Tuple[jnp.ndarray, ...]:
    """Returns (selected (C,) bool, num_selected () i32); with
    `return_bounds` also (center_w (C, 3), radius_w (C,)) — the world-space
    cluster spheres the cut already computed (consumed by the two-phase
    occlusion test, graph/frame.py).

    Cluster bounds/errors are object-space; each cluster is transformed by
    its owning object's matrix (one-hot MXU lookup) and tested against the
    camera. Clusters of culled objects are dropped here too."""
    tbl = scene.cluster_table                    # (C, CLUSTER_STRIDE)
    C = tbl.shape[0]
    O = scene.object_mats.shape[0]
    m = raster_setup.gather_rows_onehot(
        scene.object_mats.reshape(O, 16), scene.cluster_object)  # (C, 16)
    # All math in (C,)-column form — a materialized (C, 3, 3) intermediate
    # pads its minor dims to (8, 128) on TPU (~40x memory/op blowup;
    # measured 4.3 ms for this cut at 8k clusters before the rewrite).
    scale = jnp.sqrt(jnp.maximum(
        jnp.maximum(m[:, 0] ** 2 + m[:, 4] ** 2 + m[:, 8] ** 2,
                    m[:, 1] ** 2 + m[:, 5] ** 2 + m[:, 9] ** 2),
        m[:, 2] ** 2 + m[:, 6] ** 2 + m[:, 10] ** 2))
    f = _screen_error_factor(view, config.height)
    cam = view.cam_pos

    def project_px(center_l, radius_l, err_l):
        """Screen-space error of a (sphere, world error) pair. Self and
        parent use their OWN spheres (the creating group's / the parent
        group's) so both sides of a LOD switch compute identical
        thresholds — see models/clusters.py layout note."""
        px, py, pz = center_l[:, 0], center_l[:, 1], center_l[:, 2]
        wx = m[:, 0] * px + m[:, 1] * py + m[:, 2] * pz + m[:, 3]
        wy = m[:, 4] * px + m[:, 5] * py + m[:, 6] * pz + m[:, 7]
        wz = m[:, 8] * px + m[:, 9] * py + m[:, 10] * pz + m[:, 11]
        rw = radius_l * scale
        dist = jnp.sqrt((wx - cam[0]) ** 2 + (wy - cam[1]) ** 2
                        + (wz - cam[2]) ** 2)
        dist = jnp.maximum(dist - rw, view.near)
        cw = jnp.stack([wx, wy, wz], axis=-1)
        return err_l * scale * f / dist, cw, rw

    self_px, _, _ = project_px(tbl[:, 0:3], tbl[:, 3], tbl[:, 4])
    parent_px, _, _ = project_px(tbl[:, 12:15], tbl[:, 15], tbl[:, 5])
    # Culling bounds: the TIGHT per-cluster sphere (lanes 16-19) — group
    # spheres (used above for the seam-free error projection) span whole
    # simplify groups and make frustum/HZB tests hopelessly conservative
    # (measured 3% occlusion cull rate on the city bench vs ~40% tight).
    _, center_w, radius_w = project_px(tbl[:, 16:19], tbl[:, 19],
                                       jnp.zeros_like(tbl[:, 4]))

    live = jnp.arange(C) < scene.num_clusters
    # Streaming residency patch (reference: PatchCLodGroupError,
    # MeshManager.h:117 + CLodStreamingSystem.cpp): a cluster whose group
    # page is missing is unselectable, and a cluster whose CHILD group is
    # missing gets effective self-error 0 so the cut falls back to the
    # lowest resident ancestor — hole-free by construction. With the
    # all-resident default masks this is the identity.
    GR = scene.group_resident.shape[0]
    feeds = scene.cluster_feeds
    made = scene.cluster_made
    res_feeds = (feeds < 0) | scene.group_resident[jnp.clip(feeds, 0, GR - 1)]
    res_made = (made < 0) | scene.group_resident[jnp.clip(made, 0, GR - 1)]
    eff_self = jnp.where(res_made, self_px, 0.0)
    cut = live & res_feeds & (eff_self <= tau_px) & (parent_px > tau_px)

    # Frustum cull selected clusters (finer than object culling). Disabled
    # for shadow cuts (casters outside the camera frustum still cast).
    if frustum:
        planes = math3d.frustum_planes(view.viewproj)
        in_frustum = math3d.sphere_in_frustum(planes, center_w, radius_w)
        cut = cut & in_frustum
    if object_visible is not None:
        obj_ok = raster_setup.gather_rows_onehot(
            object_visible.astype(jnp.float32)[:, None], scene.cluster_object)
        cut = cut & (obj_ok[:, 0] > 0.5)
    if return_bounds:
        return cut, jnp.sum(cut).astype(jnp.int32), center_w, radius_w
    return cut, jnp.sum(cut).astype(jnp.int32)


def compact_visible_tris(scene: SceneBuffers, cut: jnp.ndarray,
                         max_visible: int, tris_per_cluster: int = 128
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray, jnp.ndarray]:
    """Gather the cut clusters' triangles into a fixed budget.

    This is THE virtualized-geometry property: downstream cost (setup, bin,
    raster) scales with max_visible * tris_per_cluster, not with the total
    LOD soup (reference: visible-cluster lists + raster buckets,
    CLodExtension.h:83-253; budget Renderer.cpp:2494).

    Returns (indices (Kt, 3) i32, tri_material (Kt,), tri_object (Kt,),
    tri_valid (Kt,) bool, overflow () i32)."""
    C = cut.shape[0]
    Kc = max_visible
    slot = jnp.sort(jnp.where(cut, jnp.arange(C, dtype=jnp.int32), C))
    if Kc <= C:
        slot = slot[:Kc]
    else:   # budget exceeds table capacity: pad with the dead sentinel
        slot = jnp.pad(slot, (0, Kc - C), constant_values=C)
    overflow = jnp.maximum(jnp.sum(cut) - Kc, 0)
    return _compact_from_slots(scene, slot, overflow, max_visible,
                               tris_per_cluster)


def _compact_from_slots(scene: SceneBuffers, slot: jnp.ndarray,
                        overflow: jnp.ndarray, max_visible: int,
                        tris_per_cluster: int = 128) -> "CompactedTris":
    """Shared compaction tail: sorted cluster ids (sentinel = C) ->
    CompactedTris. Identical output for the full-scan and windowed cuts."""
    C = scene.cluster_table.shape[0]
    T = scene.indices.shape[0]
    Kc = max_visible
    live_slot = slot < C
    ci = jnp.minimum(slot, C - 1)
    rows = scene.cluster_table[ci]                    # (Kc, 12) small gather
    off = rows[:, 7].astype(jnp.int32)
    cnt = rows[:, 8].astype(jnp.int32)
    # Object + material come from the CLUSTER rows (instances share triangle
    # ranges; only their cluster rows differ — see bridge.pack_geometry).
    obj_of_slot = scene.cluster_object[ci]
    mat_of_slot = rows[:, 9].astype(jnp.int32)
    geom_of_slot = rows[:, 11].astype(jnp.int32)
    lane = jnp.arange(tris_per_cluster, dtype=jnp.int32)[None, :]
    tri_ids = off[:, None] + lane                     # (Kc, 128)
    tri_ok = live_slot[:, None] & (lane < cnt[:, None])
    flat = jnp.clip(tri_ids.reshape(-1), 0, T - 1)    # (Kt,)
    # No barrier: the slab setup path never reads `indices`, and XLA must
    # be free to dead-code this gather there.
    g = scene.indices[flat]                           # (Kt, 3)
    K = tris_per_cluster
    tri_mat = jnp.broadcast_to(mat_of_slot[:, None], (Kc, K)).reshape(-1)
    tri_obj = jnp.broadcast_to(obj_of_slot[:, None], (Kc, K)).reshape(-1)
    return CompactedTris(g, tri_mat, tri_obj, tri_ok.reshape(-1), overflow,
                         geom_of_slot,
                         slot_cluster=jnp.where(live_slot, ci, -1),
                         slot_object=obj_of_slot,
                         slot_bound=rows[:, 16:20])


def cut_slots_windowed(scene: SceneBuffers, view: ViewData,
                       config: FrameConfig, tau_px: jnp.ndarray,
                       max_visible: int, frustum: bool = True,
                       row_filter=None) -> CompactedTris:
    """Two-phase budgeted LOD cut: the hierarchical-culling analogue of the
    reference's DAG-frontier traversal (computeCulling.hlsl:17-50; 30M
    budget Renderer.cpp:2494). Cost tracks the CUT, not the table:

    Phase A tests the C/128 precomputed cluster WINDOWS
    (SceneBuffers.cluster_windows — object-space union sphere + max parent
    error): a window whose conservative parent screen error can't exceed
    tau contains no cut member (cut requires parent_px > tau), and a
    window outside the frustum contains no visible one. Mixed-object
    windows always survive (conservative).

    Phase B budget-compacts the surviving window ids (a C/128-key sort),
    gathers their table rows as WIDE (128*STRIDE-lane) slabs — row gathers
    amortize per ROW on TPU, so this is ~µs — and runs the exact
    select_cluster_cut math on the Wmax*128 survivors only.

    `row_filter(flag_lane) -> bool` applies the pass's transparency-flag
    selection (clod_cut's opaque/MASK routing). Output is bit-identical to
    compact_visible_tris(select_cluster_cut(...)) whenever the window
    budget suffices; window overflow folds into CompactedTris.overflow."""
    from ..models.clusters import CLUSTER_STRIDE
    wt = scene.cluster_windows
    NW = wt.shape[0]
    C = scene.cluster_table.shape[0]
    assert C % 128 == 0 and NW == C // 128, (
        f"cut_windows needs a packed window table: C={C}, windows={NW} "
        "(bridge.pack_cluster_windows)")
    O = scene.object_mats.shape[0]
    Wmax = min(config.cut_windows, NW)
    f = _screen_error_factor(view, config.height)
    cam = view.cam_pos

    # ---- Phase A: window tests (NW rows of column math) -------------------
    obj = wt[:, 5].astype(jnp.int32)
    mixed = obj < 0
    mw = raster_setup.gather_rows_onehot(
        scene.object_mats.reshape(O, 16), jnp.clip(obj, 0, O - 1))
    wscale = jnp.sqrt(jnp.maximum(
        jnp.maximum(mw[:, 0] ** 2 + mw[:, 4] ** 2 + mw[:, 8] ** 2,
                    mw[:, 1] ** 2 + mw[:, 5] ** 2 + mw[:, 9] ** 2),
        mw[:, 2] ** 2 + mw[:, 6] ** 2 + mw[:, 10] ** 2))
    px, py, pz = wt[:, 0], wt[:, 1], wt[:, 2]
    wx = mw[:, 0] * px + mw[:, 1] * py + mw[:, 2] * pz + mw[:, 3]
    wy = mw[:, 4] * px + mw[:, 5] * py + mw[:, 6] * pz + mw[:, 7]
    wz = mw[:, 8] * px + mw[:, 9] * py + mw[:, 10] * pz + mw[:, 11]
    rw = wt[:, 3] * wscale
    dist = jnp.sqrt((wx - cam[0]) ** 2 + (wy - cam[1]) ** 2
                    + (wz - cam[2]) ** 2)
    dist = jnp.maximum(dist - rw, view.near)
    # Conservative upper bound of any member's parent_px: max err over the
    # window, min possible (dist - r) via the union sphere.
    ppx_max = wt[:, 4] * wscale * f / dist
    survive = (wt[:, 6] > 0.5) & (mixed | (ppx_max > tau_px))
    if frustum:
        planes = math3d.frustum_planes(view.viewproj)
        inf = math3d.sphere_in_frustum(
            planes, jnp.stack([wx, wy, wz], -1), rw)
        survive = survive & (mixed | inf)

    # ---- Window budget compaction + wide-row slab gather ------------------
    wsel = jnp.sort(jnp.where(survive, jnp.arange(NW, dtype=jnp.int32), NW))
    if Wmax <= NW:
        wsel = wsel[:Wmax]
    else:
        wsel = jnp.pad(wsel, (0, Wmax - NW), constant_values=NW)
    w_overflow = jnp.maximum(jnp.sum(survive) - Wmax, 0)
    live_w = wsel < NW
    wi = jnp.minimum(wsel, NW - 1)
    L = CLUSTER_STRIDE
    rows = scene.cluster_table.reshape(NW, 128 * L)[wi] \
        .reshape(Wmax * 128, L)
    cobj = scene.cluster_object.reshape(NW, 128)[wi].reshape(-1)
    feeds = scene.cluster_feeds.reshape(NW, 128)[wi].reshape(-1)
    made = scene.cluster_made.reshape(NW, 128)[wi].reshape(-1)
    gid = (wi[:, None] * 128
           + jnp.arange(128, dtype=jnp.int32)[None, :]).reshape(-1)
    live = (jnp.repeat(live_w, 128)
            & (gid < scene.num_clusters))

    # ---- Phase B: the exact per-cluster cut on the survivors --------------
    m = raster_setup.gather_rows_onehot(
        scene.object_mats.reshape(O, 16), cobj)          # (Wmax*128, 16)
    scale = jnp.sqrt(jnp.maximum(
        jnp.maximum(m[:, 0] ** 2 + m[:, 4] ** 2 + m[:, 8] ** 2,
                    m[:, 1] ** 2 + m[:, 5] ** 2 + m[:, 9] ** 2),
        m[:, 2] ** 2 + m[:, 6] ** 2 + m[:, 10] ** 2))

    def project_px(center_l, radius_l, err_l):
        cx, cy, cz = center_l[:, 0], center_l[:, 1], center_l[:, 2]
        ax = m[:, 0] * cx + m[:, 1] * cy + m[:, 2] * cz + m[:, 3]
        ay = m[:, 4] * cx + m[:, 5] * cy + m[:, 6] * cz + m[:, 7]
        az = m[:, 8] * cx + m[:, 9] * cy + m[:, 10] * cz + m[:, 11]
        rr = radius_l * scale
        d = jnp.sqrt((ax - cam[0]) ** 2 + (ay - cam[1]) ** 2
                     + (az - cam[2]) ** 2)
        d = jnp.maximum(d - rr, view.near)
        return err_l * scale * f / d, jnp.stack([ax, ay, az], -1), rr

    self_px, _, _ = project_px(rows[:, 0:3], rows[:, 3], rows[:, 4])
    parent_px, _, _ = project_px(rows[:, 12:15], rows[:, 15], rows[:, 5])
    _, center_w, radius_w = project_px(rows[:, 16:19], rows[:, 19],
                                       jnp.zeros_like(rows[:, 4]))
    GR = scene.group_resident.shape[0]
    res_feeds = (feeds < 0) | scene.group_resident[jnp.clip(feeds, 0,
                                                            GR - 1)]
    res_made = (made < 0) | scene.group_resident[jnp.clip(made, 0, GR - 1)]
    eff_self = jnp.where(res_made, self_px, 0.0)
    cut = live & res_feeds & (eff_self <= tau_px) & (parent_px > tau_px)
    if frustum:
        cut = cut & math3d.sphere_in_frustum(planes, center_w, radius_w)
    if row_filter is not None:
        cut = cut & row_filter(rows[:, 10])

    # ---- Slot compaction by global cluster id (order parity) --------------
    key = jnp.where(cut, gid, C)
    slot = jnp.sort(key)
    Kc = max_visible
    if Kc <= slot.shape[0]:
        slot = slot[:Kc]
    else:
        slot = jnp.pad(slot, (0, Kc - slot.shape[0]), constant_values=C)
    overflow = jnp.maximum(jnp.sum(cut) - Kc, 0) + w_overflow
    return _compact_from_slots(scene, slot, overflow, max_visible)


def slot_world_spheres(comp: CompactedTris, scene: SceneBuffers
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space TIGHT spheres of the compacted slots: (Kc, 3) centers +
    (Kc,) radii. Per-slot object matrices via one-hot MXU; all math in
    (Kc,)-column form (no rank-3 intermediates)."""
    O = scene.object_mats.shape[0]
    m = raster_setup.gather_rows_onehot(
        scene.object_mats.reshape(O, 16), comp.slot_object)
    scale = jnp.sqrt(jnp.maximum(
        jnp.maximum(m[:, 0] ** 2 + m[:, 4] ** 2 + m[:, 8] ** 2,
                    m[:, 1] ** 2 + m[:, 5] ** 2 + m[:, 9] ** 2),
        m[:, 2] ** 2 + m[:, 6] ** 2 + m[:, 10] ** 2))
    px, py, pz = (comp.slot_bound[:, 0], comp.slot_bound[:, 1],
                  comp.slot_bound[:, 2])
    wx = m[:, 0] * px + m[:, 1] * py + m[:, 2] * pz + m[:, 3]
    wy = m[:, 4] * px + m[:, 5] * py + m[:, 6] * pz + m[:, 7]
    wz = m[:, 8] * px + m[:, 9] * py + m[:, 10] * pz + m[:, 11]
    return jnp.stack([wx, wy, wz], -1), comp.slot_bound[:, 3] * scale


def touched_groups(scene: SceneBuffers, view: ViewData, config: FrameConfig,
                   tau_px) -> jnp.ndarray:
    """(GR,) f32 priorities (0 = untouched): streaming groups the IDEAL cut
    (residency ignored) wants this frame, plus one finer level as prefetch,
    weighted by how oversized their parents' screen error is (reference:
    GPU feedback 'touched clusters' readback + predicted expand,
    CLodStreamingSystem.cpp:986-1258; priority modes CLodCommon.h:50-53).
    The renderer reads this back and feeds the streaming worker."""
    tbl = scene.cluster_table
    C = tbl.shape[0]
    GR = scene.group_resident.shape[0]
    m = raster_setup.gather_rows_onehot(
        scene.object_mats.reshape(-1, 16), scene.cluster_object)
    scale = jnp.sqrt(jnp.maximum(
        jnp.maximum(m[:, 0] ** 2 + m[:, 4] ** 2 + m[:, 8] ** 2,
                    m[:, 1] ** 2 + m[:, 5] ** 2 + m[:, 9] ** 2),
        m[:, 2] ** 2 + m[:, 6] ** 2 + m[:, 10] ** 2))
    f = _screen_error_factor(view, config.height)
    cam = view.cam_pos

    def px_of(center_l, radius_l, err_l):
        px, py, pz = center_l[:, 0], center_l[:, 1], center_l[:, 2]
        wx = m[:, 0] * px + m[:, 1] * py + m[:, 2] * pz + m[:, 3]
        wy = m[:, 4] * px + m[:, 5] * py + m[:, 6] * pz + m[:, 7]
        wz = m[:, 8] * px + m[:, 9] * py + m[:, 10] * pz + m[:, 11]
        dist = jnp.sqrt((wx - cam[0]) ** 2 + (wy - cam[1]) ** 2
                        + (wz - cam[2]) ** 2)
        dist = jnp.maximum(dist - radius_l * scale, view.near)
        return err_l * scale * f / dist

    self_px = px_of(tbl[:, 0:3], tbl[:, 3], tbl[:, 4])
    parent_px = px_of(tbl[:, 12:15], tbl[:, 15], tbl[:, 5])
    live = jnp.arange(C) < scene.num_clusters
    wanted = live & (self_px <= tau_px) & (parent_px > tau_px)

    # Scatter-free mark (scatter serializes ~100 ns/row on TPU — several ms
    # at 32k clusters): broadcast-compare one-hot reduction over the small
    # group axis, same pattern as the VSM page mark (ops/vsm.py).
    feeds = jnp.where(wanted & (scene.cluster_feeds >= 0),
                      scene.cluster_feeds, -1)
    made = jnp.where(wanted & (scene.cluster_made >= 0),
                     scene.cluster_made, -1)     # one level finer: prefetch
    gids = jnp.arange(GR, dtype=jnp.int32)[None, :]
    # Per-group load PRIORITY, not just a bit (reference: CLodPriorityMode
    # Max/Sum, CLodCommon.h:50-53): urgency = how oversized the parent's
    # screen error is relative to tau — the streamer loads the most
    # oversized groups first when the per-frame budget is short. Prefetch
    # marks (one level finer) weigh half. "max" takes the worst cluster
    # per group; "sum" favors groups many clusters want.
    urg = jnp.where(wanted, parent_px / jnp.maximum(tau_px, 1e-6), 0.0)
    w_feeds = jnp.where(feeds[:, None] == gids, urg[:, None], 0.0)
    w_made = jnp.where(made[:, None] == gids, 0.5 * urg[:, None], 0.0)
    if config.streaming_priority == "sum":
        return w_feeds.sum(axis=0) + w_made.sum(axis=0)
    return jnp.maximum(w_feeds.max(axis=0), w_made.max(axis=0))

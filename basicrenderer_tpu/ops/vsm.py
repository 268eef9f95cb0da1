"""Virtual shadow maps: clipmapped page-cached shadows for directional
lights.

Reference analogue: the 17-pass VSM stack (reference:
BasicRenderer/src/Render/GraphExtensions/ClusterLOD/VirtualShadowMapSetupPass.cpp:23-41,
CLodShadowVariant.cpp:453-510, shaders/clodVirtualShadowClipmap.hlsli) —
clipmap placement, mark-pages-from-screen-depth, physical page pool with
LRU, dirty-page raster into a page atlas, page-table-indirected sampling,
and the SMRT ray-sampled soft filter (PerFrameCB SMRT params, reference:
BasicRenderer/include/ShaderBuffers.h:92-96).

TPU redesign (everything fixed-shape, inside the jitted frame):
- Clipmap levels use ABSOLUTE page coordinates with toroidal table
  addressing: table cell (l, py, px) holds whichever absolute page
  (b + ((p - b) mod P)) the current window wants, tagged with its absolute
  id — window scroll needs no invalidation pass at all, stale cells simply
  mismatch their wanted id (the reference's predicted-page expand + wrap
  machinery collapses into an id compare).
- Marking is a bincount (one-hot sum) of screen pixels' (level, page)
  bins at reduced rate — no scatter.
- The LRU allocator is a pair of sorts: dirty cells ranked coarse-first
  meet the oldest/free physical slots; the top `pages_per_frame` matches
  render this frame, the rest wait (budgeted convergence, like the
  reference's per-frame page budget).
- Dirty pages raster through the SAME cluster-cut + binning + tile raster
  as every other view (one page-sized depth tile per page), written into
  the persistent (slots, page, page) atlas with dynamic_update_slice.
- Sampling gathers the page slot per pixel (tiny table) and one atlas
  texel at 1/downscale rate, then upsamples + 3x3-smooths the visibility
  mask. Quality tiers: point (1 tap), 2x2 bilinear-on-visibility
  (`vsm_filter_taps>=4`), and SMRT (`vsm_rays>0`) — per-pixel jittered
  rays marched toward the light cone, each ray occluded if ANY of its
  samples sits below a cached caster; visibility = unblocked-ray
  fraction, giving contact-hardening penumbrae whose width tracks
  `params.light_size` (the light's angular tangent).

Geometry (page size / clipmap levels / page-grid edge / physical slots /
level-0 extent) is settings-driven via FrameConfig `vsm_*` fields; the
module constants are only the defaults. Multiple VSM'd directional lights
each carry an independent VsmState (the frame threads a tuple when
`vsm_num_lights > 1`).

State persists across frames (the whole point: converged static scenes
re-render nothing); the renderer threads VsmState like TAA history and
invalidates per page from moved-object bounds.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..graph.framedata import FrameConfig, SceneBuffers, ViewData
from ..utils import math3d
from . import raster_setup
from .raster_pallas import raster_tiles_pallas
from .raster_ref import raster_tiles_ref

PAGE = 128            # texels per page edge (default)
LEVELS = 6            # clipmap levels (default)
PAGES = 8             # page grid edge per level (default)
SLOTS = 128           # physical pages in the pool (default)
BASE_EXTENT = 16.0    # world extent of clipmap level 0 window (default)


def geometry(config: Optional[FrameConfig]):
    """(page, levels, pages, slots, base_extent) — settings-driven with the
    module constants as defaults (VERDICT r4 #9: SLOTS/LEVELS were
    hardcoded)."""
    if config is None:
        return PAGE, LEVELS, PAGES, SLOTS, BASE_EXTENT
    return (getattr(config, "vsm_page_size", PAGE),
            getattr(config, "vsm_levels", LEVELS),
            getattr(config, "vsm_page_grid", PAGES),
            getattr(config, "vsm_slots", SLOTS),
            getattr(config, "vsm_base_extent", BASE_EXTENT))


@struct.dataclass
class VsmState:
    slot_of_cell: jnp.ndarray   # (L*P*P,) i32 physical slot or -1
    abs_of_cell: jnp.ndarray    # (L*P*P,) i32 absolute page id tag
    cell_of_slot: jnp.ndarray   # (SLOTS,) i32 owning cell or -1
    age: jnp.ndarray            # (SLOTS,) i32 frames since last use
    atlas: jnp.ndarray          # (SLOTS, PAGE, PAGE) f32 depth (1 = near)
    z_range: jnp.ndarray        # (2,) f32 light-space z normalization
    initialized: jnp.ndarray    # () bool


def init_state(config: Optional[FrameConfig] = None) -> VsmState:
    page, levels, pages, slots, _base = geometry(config)
    n = levels * pages * pages
    return VsmState(
        slot_of_cell=jnp.full((n,), -1, jnp.int32),
        abs_of_cell=jnp.full((n,), -1, jnp.int32),
        cell_of_slot=jnp.full((slots,), -1, jnp.int32),
        age=jnp.full((slots,), 1 << 20, jnp.int32),
        atlas=jnp.zeros((slots, page, page), jnp.float32),
        z_range=jnp.asarray([0.0, 1.0], jnp.float32),
        initialized=jnp.asarray(False),
    )


def init_states(config: FrameConfig):
    """Frame-ready state: a bare VsmState for one VSM light, a tuple of
    independent states for `vsm_num_lights > 1`."""
    nl = getattr(config, "vsm_num_lights", 1)
    if nl <= 1:
        return init_state(config)
    return tuple(init_state(config) for _ in range(nl))


def light_basis(light_dir: jnp.ndarray) -> jnp.ndarray:
    """(3, 3) rotation world->light (rows s, u, -d; z grows toward light)."""
    d = light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-9)
    up = jnp.where(jnp.abs(d[1]) < 0.95,
                   jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    s = jnp.cross(up, -d)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-9)
    u = jnp.cross(-d, s)
    return jnp.stack([s, u, -d])


def _level_of_point(lx, ly, cx, cy, levels, pages, base):
    """Clipmap level per light-space point, from the camera-centred window
    hierarchy (marking and sampling MUST agree — shared helper)."""
    m = jnp.maximum(jnp.abs(lx - cx), jnp.abs(ly - cy))
    # Level l window half-extent: base * 2^l / 2. Margin must keep a
    # level's live footprint strictly under `pages` page widths or two
    # needed pages that many columns apart alias to the same toroidal cell
    # (one loses the wanted-id max and renders unshadowed).
    # (pages-1)/(2*pages) -> span = (pages-1) page widths -> straddles at
    # most `pages` integer columns -> no aliasing.
    margin = (pages - 1) / (2.0 * pages)
    lev = jnp.ceil(jnp.log2(jnp.maximum(m / (base * margin), 1e-6)))
    return jnp.clip(lev, 0, levels - 1).astype(jnp.int32)


def _page_world(level, base, pages):
    """World size of one page at `level` (arrays ok)."""
    return base * (2.0 ** level.astype(jnp.float32)) / pages


def _abs_id(ix, iy):
    """Absolute page id. Fits in 20 bits (pages clamped to +-512 of the
    origin — level-0 pages are base/pages world units, so that is
    ~+-1000 world units of coverage) so ids survive the f32 lane of the
    one-hot table lookup exactly (f32 ints exact to 2^24)."""
    ix = jnp.clip(ix, -512, 511)
    iy = jnp.clip(iy, -512, 511)
    return (iy + 512) * 1024 + (ix + 512)


def invalidate_pages(state: VsmState, spheres: jnp.ndarray,
                     light_dir: jnp.ndarray,
                     config: Optional[FrameConfig] = None) -> VsmState:
    """Per-page invalidation for moved objects (reference: the
    RenderTransformUpdated-tag invalidation pass, Renderer.cpp:1889-1895 +
    VirtualShadowMapInvalidatePass) — replaces the round-2 whole-cache drop.

    spheres: (K, 4) world-space [center xyz, radius] bounds covering each
    moved object's old+new placement (rows with radius < 0 are unused).
    Cells whose absolute-page footprint overlaps a sphere's light-space XY
    AABB get their id tag cleared: the next mark pass sees them mismatched
    and re-renders just those pages within the per-frame budget. A
    directional light's shadow translates along the light axis only, so the
    light-space XY extent fully bounds every page the object can affect.
    """
    _page, levels, pages, _slots, base = geometry(config)
    R = light_basis(light_dir)
    n = levels * pages * pages
    lev = jnp.arange(n, dtype=jnp.int32) // (pages * pages)
    aid = state.abs_of_cell
    ix = aid % 1024 - 512
    iy = aid // 1024 - 512
    pw = _page_world(lev, base, pages)
    stale = jnp.zeros((n,), bool)
    for k in range(spheres.shape[0]):
        c = spheres[k, :3]
        r = spheres[k, 3]
        lx = R[0] @ c
        ly = R[1] @ c
        x0 = jnp.floor((lx - r) / pw).astype(jnp.int32)
        x1 = jnp.floor((lx + r) / pw).astype(jnp.int32)
        y0 = jnp.floor((ly - r) / pw).astype(jnp.int32)
        y1 = jnp.floor((ly + r) / pw).astype(jnp.int32)
        hit = (ix >= x0) & (ix <= x1) & (iy >= y0) & (iy <= y1) \
            & (r >= 0.0) & (aid >= 0)
        stale = stale | hit
    return state.replace(abs_of_cell=jnp.where(stale, -1, aid))


def update_vsm(scene: SceneBuffers, view: ViewData, config: FrameConfig,
               params, state: VsmState, depth: jnp.ndarray,
               shadow_compact_fn, row0: int = 0, full_h: int = None,
               light_row: int = 0,
               ) -> Tuple[jnp.ndarray, VsmState, dict]:
    """One VSM frame step for ONE light: mark -> allocate -> render dirty
    -> sample.

    depth: (H, W) reverse-Z NDC (full gathered frame when sharded);
    receivers are unprojected from downsampled depth in column math (a
    downsampled (H, W, 3) world-pos image costs more than the whole pass
    - see shadows.downsample2d). `shadow_compact_fn(vp)` -> compacted
    caster triangles for a page viewproj (the cluster-cut shadow set).
    `light_row` selects the scene light (the bridge packs directional
    lights first). Returns ((H, W) visibility, new state, stats).
    """
    from .shadows import downsample2d
    PAGE_, LEVELS_, PAGES_, SLOTS_, BASE_ = geometry(config)
    H, W = depth.shape
    full_h = full_h or H
    inv_vp = jnp.linalg.inv(view.viewproj)

    def unproject_ds(ds):
        d = downsample2d(depth, ds)
        h, w = d.shape
        nx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ds + 0.5) \
            / W * 2.0 - 1.0
        ny = 1.0 - (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ds
                    + 0.5 + row0) / full_h * 2.0
        px, py, pz, pw = math3d.mat4_columns(inv_vp, nx, ny, d)
        iw = 1.0 / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)
        return px * iw, py * iw, pz * iw, d > 0.0
    ds = config.vsm_sample_downscale
    while ds > 1 and (H % ds or W % ds):   # downsample2d needs exact tiling
        ds -= 1
    R = light_basis(scene.lights[light_row, 4:7])
    n_cells = LEVELS_ * PAGES_ * PAGES_

    # Scene z range along the light axis, frozen at first use so cached
    # pages stay comparable across frames.
    centers = scene.object_bounds[:, :3]
    radii = scene.object_bounds[:, 3]
    lz = centers @ R[2]
    zmax = jnp.max(jnp.where(scene.object_valid, lz + radii, -1e9)) + 1.0
    zmin = jnp.min(jnp.where(scene.object_valid, lz - radii, 1e9)) - 1.0
    z0 = jnp.where(state.initialized, state.z_range[0], zmin)
    z1 = jnp.where(state.initialized, state.z_range[1], zmax)

    cam_l = R @ view.cam_pos
    cx, cy = cam_l[0], cam_l[1]

    # --- mark: which absolute pages does the screen need? ------------------
    mx, my, mz, mmask = unproject_ds(config.vsm_mark_downscale)
    vmask = mmask
    lx, ly, _lz = math3d.mat3_columns(
        R, mx.reshape(-1), my.reshape(-1), mz.reshape(-1))
    lev = _level_of_point(lx, ly, cx, cy, LEVELS_, PAGES_, BASE_)
    pw = _page_world(lev, BASE_, PAGES_)
    ix = jnp.floor(lx / pw).astype(jnp.int32)
    iy = jnp.floor(ly / pw).astype(jnp.int32)
    cell = (lev * PAGES_ + (iy % PAGES_)) * PAGES_ + (ix % PAGES_)
    aid = _abs_id(ix, iy)
    cell = jnp.where(vmask.reshape(-1), cell, n_cells)      # dead -> overflow
    # Scatter-free mark: one-hot reduction over the (few hundred) cells
    # (scatter-add/max serialize on TPU — ~2.3 ms at the mark rate; this
    # broadcast-compare reduce is ~50M cheap VPU ops).
    oh = cell[:, None] == jnp.arange(n_cells, dtype=jnp.int32)[None, :]
    needed = oh.any(axis=0)
    # The wanted absolute id per cell comes from the pixels themselves: all
    # pixels hitting a cell agree on aid by construction (same mod class,
    # same window — up to window-edge races resolved by max).
    wanted = jnp.max(jnp.where(oh, aid[:, None], -1), axis=0)

    valid_cell = (state.abs_of_cell == wanted) & (state.slot_of_cell >= 0)
    dirty = needed & ~valid_cell

    # --- allocate: oldest/free slots meet dirty cells (coarse first) -------
    K = config.vsm_pages_per_frame
    lev_of_cell = jnp.arange(n_cells) // (PAGES_ * PAGES_)
    # Rank dirty cells: coarse levels first (they cover more pixels).
    cell_rank = jnp.where(dirty, -lev_of_cell, 1 << 20)
    cell_order = jnp.argsort(cell_rank)[:K]                  # (K,) cell ids
    live_k = dirty[cell_order]
    # Rank slots: unused/oldest first, but never steal a slot whose cell is
    # both currently valid and needed this frame.
    slot_cell = jnp.clip(state.cell_of_slot, 0, n_cells - 1)
    protected = (state.cell_of_slot >= 0) & needed[slot_cell] & \
        valid_cell[slot_cell]
    slot_rank = jnp.where(protected, -1, state.age)
    slot_order = jnp.argsort(-slot_rank)[:K]                 # (K,) slots

    # --- render dirty pages through the cluster-cut raster -----------------
    page_cfg = dataclasses.replace(
        config, width=PAGE_, height=PAGE_, tile_h=32,
        tile_w=min(128, PAGE_),
        enable_occlusion=False, max_pairs=config.vsm_page_pairs,
        near_clip_tris=0,   # ortho pages: w == 1 never crosses
        max_tiles_per_tri=8, max_big_tris=128)
    atlas = state.atlas
    slot_of_cell = state.slot_of_cell
    abs_of_cell = state.abs_of_cell
    cell_of_slot = state.cell_of_slot
    age = jnp.minimum(state.age + 1, 1 << 20)

    def render_dirty_pages(carry):
        atlas, slot_of_cell, abs_of_cell, cell_of_slot, age = carry
        for k in range(K):
            c = cell_order[k]
            s = slot_order[k]
            ok = live_k[k]
            l = c // (PAGES_ * PAGES_)
            a = wanted[c]
            a_iy = a // 1024 - 512
            a_ix = a % 1024 - 512
            pwk = _page_world(l, BASE_, PAGES_)
            x0 = a_ix.astype(jnp.float32) * pwk
            y0 = a_iy.astype(jnp.float32) * pwk
            # Ortho viewproj: light-space page window -> NDC, z reverse-style.
            sx = 2.0 / pwk
            sz = 1.0 / jnp.maximum(z1 - z0, 1e-6)
            proj = jnp.zeros((4, 4), jnp.float32)
            proj = proj.at[0, 0].set(sx).at[0, 3].set(-(2.0 * x0 / pwk) - 1.0)
            proj = proj.at[1, 1].set(sx).at[1, 3].set(-(2.0 * y0 / pwk) - 1.0)
            proj = proj.at[2, 2].set(sz).at[2, 3].set(-z0 * sz)
            proj = proj.at[3, 3].set(1.0)
            Rw = jnp.zeros((4, 4), jnp.float32).at[:3, :3].set(R).at[3, 3].set(1.0)
            vp = proj @ Rw
            comp = shadow_compact_fn(vp)
            lanes, bbox, tvalid2, _ovf = raster_setup.setup_from_compacted(
                scene, comp, vp, page_cfg)
            pairs = raster_setup.bin_clustered(lanes, bbox, tvalid2,
                                               page_cfg)
            if config.use_pallas_raster:
                depth, _, _ = raster_tiles_pallas(
                    pairs, page_cfg, interpret=config.pallas_interpret)
            else:
                depth, _ = raster_tiles_ref(pairs, page_cfg)
            page = depth[:PAGE_, :PAGE_]
            atlas = jnp.where(
                ok,
                jax.lax.dynamic_update_slice(
                    atlas, page[None], (s, 0, 0)),
                atlas)
            # Table updates (all masked on `ok`).
            old_cell = jnp.clip(cell_of_slot[s], 0, n_cells - 1)
            had_cell = cell_of_slot[s] >= 0
            slot_of_cell = slot_of_cell.at[old_cell].set(
                jnp.where(ok & had_cell & (old_cell != c),
                          -1, slot_of_cell[old_cell]))
            slot_of_cell = slot_of_cell.at[c].set(
                jnp.where(ok, s, slot_of_cell[c]))
            abs_of_cell = abs_of_cell.at[c].set(
                jnp.where(ok, a, abs_of_cell[c]))
            cell_of_slot = cell_of_slot.at[s].set(
                jnp.where(ok, c, cell_of_slot[s]))
            age = age.at[s].set(jnp.where(ok, 0, age[s]))

        return atlas, slot_of_cell, abs_of_cell, cell_of_slot, age

    # A converged cache renders nothing: lax.cond skips the whole page
    # budget (compaction + setup + raster x K) unless something is dirty
    # -- the reason a static scene's VSM is nearly free.
    atlas, slot_of_cell, abs_of_cell, cell_of_slot, age = jax.lax.cond(
        jnp.any(live_k), render_dirty_pages, lambda c: c,
        (atlas, slot_of_cell, abs_of_cell, cell_of_slot, age))

    # Refresh ages of used slots (scatter-min into a padded lane so the
    # "unused" sentinel index SLOTS lands harmlessly).
    used_slot = jnp.where(needed & (slot_of_cell >= 0),
                          slot_of_cell, SLOTS_)
    age_pad = jnp.pad(age, (0, 1), constant_values=1 << 20)
    age = age_pad.at[used_slot].min(
        jnp.where(used_slot < SLOTS_, 0, 1 << 20))[:SLOTS_]

    new_state = VsmState(
        slot_of_cell=slot_of_cell, abs_of_cell=abs_of_cell,
        cell_of_slot=cell_of_slot, age=age, atlas=atlas,
        z_range=jnp.stack([z0, z1]),
        initialized=jnp.asarray(True))

    # --- sample -------------------------------------------------------------
    sx_, sy_, sz_, smask = unproject_ds(ds)
    h, w = sx_.shape
    lx, ly, lz = math3d.mat3_columns(
        R, sx_.reshape(-1), sy_.reshape(-1), sz_.reshape(-1))
    lev = _level_of_point(lx, ly, cx, cy, LEVELS_, PAGES_, BASE_)
    pw = _page_world(lev, BASE_, PAGES_)
    ix = jnp.floor(lx / pw).astype(jnp.int32)
    iy = jnp.floor(ly / pw).astype(jnp.int32)
    cell = (lev * PAGES_ + (iy % PAGES_)) * PAGES_ + (ix % PAGES_)
    aid = _abs_id(ix, iy)
    # Per-pixel (slot, abs) lookup from the tiny cell table via one-hot MXU
    # (direct gathers cost ~7 ns/px — 7.6 ms at ds2; this is ~0.5 ms).
    cell_tbl = jnp.stack([slot_of_cell.astype(jnp.float32),
                          abs_of_cell.astype(jnp.float32)], axis=-1)
    rows = raster_setup.gather_rows_onehot(cell_tbl, cell)
    slot = jnp.round(rows[:, 0]).astype(jnp.int32)
    mapped = (slot >= 0) & (jnp.round(rows[:, 1]).astype(jnp.int32) == aid)
    # Texel within page.
    fx = lx / pw - ix.astype(jnp.float32)
    fy = ly / pw - iy.astype(jnp.float32)
    txf = fx * PAGE_ - 0.5
    tyf = (1.0 - fy) * PAGE_ - 0.5
    flat = atlas.reshape(-1)
    zref = (lz - z0) / jnp.maximum(z1 - z0, 1e-6)
    bias = params.shadow_bias * (2.0 ** lev.astype(jnp.float32))
    sbase = jnp.clip(slot, 0, SLOTS_ - 1) * PAGE_

    def tap(txi, tyi):
        txi = jnp.clip(txi, 0, PAGE_ - 1)
        tyi = jnp.clip(tyi, 0, PAGE_ - 1)
        smp = flat[(sbase + tyi) * PAGE_ + txi]
        return ((zref + bias >= smp) | (smp <= 0.0)).astype(jnp.float32)

    rays = getattr(config, "vsm_rays", 0)
    if rays > 0:
        # SMRT quality tier (reference: the SMRT ray-sample params in
        # PerFrameCB, ShaderBuffers.h:92-96 — ray count / samples-per-ray /
        # light size): per-pixel jittered rays toward points on the light
        # cone. A ray's sample at parameter t sits at light-space
        # (lx + jx*tan_a*t, ly + jy*tan_a*t, lz + t); the ray is occluded
        # if ANY sample has a cached caster above it (map depth > sample
        # depth — the conservative shadow-map-march test, exact at
        # tan_a -> 0 where it degenerates to the hard receiver tap).
        # Visibility = unblocked-ray fraction -> contact-hardening
        # penumbrae sized by params.light_size. Each (ray, sample) costs
        # one atlas gather at the ds sample rate; the page lookup is shared
        # (offsets are clamped inside the receiver's page, bounding the
        # penumbra at ~half a page width — finer levels = tighter cap,
        # exactly the clipmap's resolution contract).
        S = max(2, getattr(config, "vsm_ray_samples", 3))
        tan_a = params.light_size
        pxi = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
        pyi = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
        # Interleaved gradient noise: decorrelates ray rotations between
        # neighbouring pixels; the 3x3 smooth below integrates the dither.
        ign = jnp.mod(52.9829189 * jnp.mod(
            0.06711056 * pxi + 0.00583715 * pyi, 1.0), 1.0)
        theta0 = ign * (2.0 * jnp.pi)
        dmax = jnp.maximum(z1 - lz, 1e-3)      # world distance to light top
        zspan = jnp.maximum(z1 - z0, 1e-6)
        texpp = PAGE_ / pw                      # texels per world unit
        # Ray length: the distance at which the cone's lateral spread
        # reaches the representable penumbra cap (~half a page width) —
        # marching further cannot change the result but would starve the
        # contact region of samples (casters sit just above receivers,
        # not at the scene's light-space ceiling). Quadratic t spacing
        # concentrates samples near the receiver for the same reason.
        t_ray = jnp.minimum(dmax, 0.9 * pw / jnp.maximum(tan_a, 0.02))
        occ = jnp.zeros_like(zref)
        for r in range(rays):
            rad = ((r + 0.5) / rays) ** 0.5     # stratified disk radius
            th = theta0 + r * 2.3999632         # golden-angle spiral
            jx = rad * jnp.cos(th)
            jy = rad * jnp.sin(th)
            blocked = jnp.zeros(zref.shape, bool)
            for s_i in range(S):
                t = (s_i / (S - 1.0)) ** 2
                tw = t * t_ray
                off = jnp.minimum(tan_a * tw, 0.45 * pw)
                txs = jnp.round(txf + jx * off * texpp).astype(jnp.int32)
                tys = jnp.round(tyf - jy * off * texpp).astype(jnp.int32)
                txs = jnp.clip(txs, 0, PAGE_ - 1)
                tys = jnp.clip(tys, 0, PAGE_ - 1)
                smp = flat[(sbase + tys) * PAGE_ + txs]
                zs = (lz + tw - z0) / zspan
                blocked = blocked | ((smp > zs + bias) & (smp > 0.0))
            occ = occ + blocked.astype(jnp.float32)
        lit = 1.0 - occ / rays
    elif config.vsm_filter_taps >= 4:
        # 2x2 taps with bilinear weights on the VISIBILITY results —
        # smooth shadow edges at page-texel granularity. Taps clamp at page
        # edges (neighbor texels live in other physical pages); the
        # post-upsample 3x3 smooth hides the residual page-border seam.
        x0i = jnp.floor(txf).astype(jnp.int32)
        y0i = jnp.floor(tyf).astype(jnp.int32)
        wxf = txf - x0i.astype(jnp.float32)
        wyf = tyf - y0i.astype(jnp.float32)
        lit = (tap(x0i, y0i) * (1 - wxf) * (1 - wyf)
               + tap(x0i + 1, y0i) * wxf * (1 - wyf)
               + tap(x0i, y0i + 1) * (1 - wxf) * wyf
               + tap(x0i + 1, y0i + 1) * wxf * wyf)
    else:
        lit = tap(jnp.round(txf).astype(jnp.int32),
                  jnp.round(tyf).astype(jnp.int32))
    lit = jnp.where(smask, jnp.where(mapped, lit, 1.0).reshape(h, w), 1.0)

    lit = jax.image.resize(lit, (H, W), method="bilinear")
    p = jnp.pad(lit, 1, mode="edge")
    acc = sum(p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3))
    stats = {"dirty": jnp.sum(dirty).astype(jnp.int32),
             "needed": jnp.sum(needed).astype(jnp.int32),
             "rendered": jnp.sum(live_k).astype(jnp.int32)}
    return acc / 9.0, new_state, stats

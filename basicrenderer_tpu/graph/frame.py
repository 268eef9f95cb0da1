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
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import raster_setup
from ..ops.raster_pallas import raster_tiles_pallas
from ..ops.raster_ref import raster_tiles_ref
from ..ops.resolve_pallas import resolve_attributes_ref
from ..ops import shade as shade_ops
from .framedata import FrameConfig, FrameParams, SceneBuffers, ViewData


def geometry_pass(scene: SceneBuffers, view: ViewData, config: FrameConfig):
    """Vertex transform + triangle setup + binning (the 'CLod raster feed')."""
    clip, world_pos, world_normals = raster_setup.transform_geometry(
        scene.positions, scene.normals, scene.vert_object, scene.object_mats,
        scene.object_normal_mats, view.viewproj)
    # Stage barrier (2D arrays only — rank-3 intermediates pad to (8,128)
    # tiles in HBM and must never be materialized): stops XLA re-running the
    # vertex one-hot matmul inside downstream fusions.
    clip, world_pos, world_normals = jax.lax.optimization_barrier(
        (clip, world_pos, world_normals))
    tri_valid = scene.tri_object >= 0
    lanes, bbox, valid = raster_setup.triangle_setup_packed(
        clip, scene.indices, tri_valid, config, world_normals, scene.uvs,
        scene.tri_material)
    pairs = raster_setup.bin_pairs(lanes, bbox, valid, config)
    return clip, world_pos, world_normals, None, pairs


def visibility_pass(pairs, config: FrameConfig):
    """Rasterize binned triangles -> (depth, vis, channels) on the PADDED
    tile grid. The Pallas path fuses the attribute resolve into the raster
    loop; the portable path runs the two reference kernels back to back."""
    if config.use_pallas_raster:
        return raster_tiles_pallas(pairs, config)
    depth_p, vis_p = raster_tiles_ref(pairs, config)
    channels = resolve_attributes_ref(pairs, vis_p, config)
    return depth_p, vis_p, channels


def build_frame_fn(config: FrameConfig) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Returns the traced frame function (not yet jitted)."""

    def frame(scene: SceneBuffers, view: ViewData, params: FrameParams
              ) -> Dict[str, jnp.ndarray]:
        clip, world_pos, world_normals, setup, pairs = geometry_pass(scene, view, config)
        depth_p, vis_p, channels = visibility_pass(pairs, config)

        H, W = config.height, config.width
        depth = depth_p[:H, :W]
        vis = vis_p[:H, :W]
        gb = shade_ops.gbuffer_from_channels(
            channels[:, :H, :W], depth, vis, view, scene.material_table, W, H)

        hdr = shade_ops.shade_deferred(gb, scene, view)
        sky = shade_ops.procedural_sky(view, config.height, config.width,
                                       params.sky_intensity)
        hdr = jnp.where(gb.valid[..., None], hdr, sky)

        ldr = shade_ops.aces_tonemap(hdr * params.exposure)
        srgb = shade_ops.linear_to_srgb(ldr)
        image = (srgb * 255.0 + 0.5).astype(jnp.uint8)

        return {
            "image": image,
            "hdr": hdr,
            "depth": depth,
            "vis": vis,
            "bin_overflow": pairs.overflow,
            "num_pairs": pairs.num_pairs,
        }

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

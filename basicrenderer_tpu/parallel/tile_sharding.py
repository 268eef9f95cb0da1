"""Multi-chip frame execution: screen-space (tile-row) sharding over a
device mesh.

The reference is a single-GPU renderer; its scaling analogue is SURVEY.md
§2.3/§5 — the TPU-native multi-chip design shards *screen tiles* for
raster/shading (CP/SP-like) while geometry processing is replicated (its cost
is small next to per-pixel work). Mapping:

- mesh axis "sp": groups of framebuffer tile rows. Each device rasterizes
  and shades its own rows; no cross-device traffic during raster because
  binning already routed each triangle to the tiles (and hence devices) it
  touches.
- geometry pass + binning: computed replicated (deterministic, so no
  broadcast needed); a later optimization distributes binning with an
  all_gather of per-device bins.
- exposure/auto-luminance: a true cross-device reduction — a psum of
  per-shard luminance sums (the analogue of the reference's luminance
  histogram + exposure average, luminanceHistogram*.hlsl).

Output stays sharded (each device holds its rows); the host assembles only
when fetching the image.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 moved shard_map to the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..graph import frame as frame_mod
from ..graph.framedata import FrameConfig, FrameParams, SceneBuffers, ViewData
from ..ops import raster_setup, shade as shade_ops
from ..ops.raster_ref import raster_tiles_ref
from ..ops.resolve_pallas import resolve_attributes_ref


def build_sharded_frame_fn(config: FrameConfig, mesh: Mesh):
    """Full multi-chip frame: replicated geometry -> row-sharded raster/
    shade -> psum auto-exposure -> sharded tonemap."""
    n = mesh.shape["sp"]
    rows_per = config.tiles_y // n
    if rows_per * n != config.tiles_y:
        raise ValueError(f"tiles_y={config.tiles_y} not divisible by mesh sp={n}")
    local_cfg = dataclasses.replace(config, height=rows_per * config.tile_h)
    shard_h = rows_per * config.tile_h

    def per_shard(tile_offsets_l, sky_l, scene, view, params, pair_data):
        idx = jax.lax.axis_index("sp")
        row0 = (idx * shard_h).astype(jnp.float32)
        pairs = raster_setup.BinnedPairs(
            pair_data=pair_data, tile_offsets=tile_offsets_l[0],
            num_pairs=jnp.int32(0), overflow=jnp.int32(0))
        depth_p, vis_p = raster_tiles_ref(pairs, local_cfg, tile_row0=idx * rows_per)
        channels = resolve_attributes_ref(pairs, vis_p, local_cfg,
                                          tile_row0=idx * rows_per)
        depth = depth_p[:shard_h, :config.width]
        vis = vis_p[:shard_h, :config.width]
        gb = shade_ops.gbuffer_from_channels(
            channels[:, :shard_h, :config.width], depth, vis, view,
            scene.material_table, config.width, config.height, row0=row0)
        hdr = shade_ops.shade_deferred(gb, scene, view)
        hdr = jnp.where(gb.valid[..., None], hdr, sky_l[0])
        # Cross-device auto-exposure (collective): psum of shard luminance.
        lum = jnp.sum(hdr[..., 0] * 0.2126 + hdr[..., 1] * 0.7152 + hdr[..., 2] * 0.0722)
        total_lum = jax.lax.psum(lum, "sp")
        avg_lum = total_lum / (config.width * config.height)
        exposure = params.exposure / jnp.maximum(jnp.sqrt(avg_lum) * 0.6, 1e-3)
        ldr = shade_ops.aces_tonemap(hdr * exposure)
        srgb = shade_ops.linear_to_srgb(ldr)
        image = (srgb * 255.0 + 0.5).astype(jnp.uint8)
        return image, depth, vis

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("sp"), P("sp"), P(), P(), P(), P()),
        out_specs=(P("sp"), P("sp"), P("sp")),
        check_vma=False,
    )

    def frame(scene: SceneBuffers, view: ViewData, params: FrameParams):
        clip, world_pos, world_normals, setup, pairs = frame_mod.geometry_pass(
            scene, view, config)
        sky = shade_ops.procedural_sky(view, config.padded_height, config.width,
                                       params.sky_intensity)
        # Shard k's offsets: rows [k*rows_per*tiles_x, (k+1)*rows_per*tiles_x]
        # inclusive — stacked so each shard receives its own (1, R+1) slice.
        per_rows = rows_per * config.tiles_x
        slices = jnp.stack([
            jax.lax.dynamic_slice(pairs.tile_offsets, (k * per_rows,),
                                  (per_rows + 1,))
            for k in range(n)
        ])  # (n, per_rows + 1)
        sky_sharded = sky[:config.height].reshape(n, shard_h, config.width, 3)
        image, depth, vis = sharded(
            slices, sky_sharded, scene, view, params, pairs.pair_data)
        H = config.height
        return {
            "image": image.reshape(H, config.width, 3),
            "depth": depth.reshape(H, config.width),
            "vis": vis.reshape(H, config.width),
            "bin_overflow": pairs.overflow,
        }

    return frame

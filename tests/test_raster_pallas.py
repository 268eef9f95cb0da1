"""Pallas rasterizer parity vs the jnp reference backend (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig
from basicrenderer_tpu.ops import raster_setup
from basicrenderer_tpu.ops.raster_pallas import raster_tiles_pallas
from basicrenderer_tpu.ops.raster_ref import raster_tiles_ref

from tests.test_raster import random_clip_triangles, setup_from_clip


@pytest.mark.parametrize("seed", [0, 5])
def test_pallas_interpret_matches_ref(seed):
    rng = np.random.default_rng(seed)
    W, H = 256, 64
    config = FrameConfig(width=W, height=H, tile_h=16, tile_w=128,
                         max_pairs=1 << 12)
    clip_tris = random_clip_triangles(rng, 60)
    setup = setup_from_clip(clip_tris, config)
    pairs = raster_setup.bin_triangles(setup, config)

    depth_ref, vis_ref = raster_tiles_ref(pairs, config)
    depth_pl, vis_pl, chan_pl = raster_tiles_pallas(pairs, config, interpret=True)

    np.testing.assert_array_equal(np.asarray(vis_pl), np.asarray(vis_ref))
    np.testing.assert_allclose(np.asarray(depth_pl), np.asarray(depth_ref),
                               rtol=1e-6, atol=1e-7)


def test_pallas_interpret_empty_scene():
    config = FrameConfig(width=128, height=32, tile_h=16, tile_w=128,
                         max_pairs=256)
    clip_tris = np.zeros((4, 3, 4), np.float32)
    clip_tris[..., 3] = 1.0  # degenerate tris at origin, all culled
    setup = setup_from_clip(clip_tris, config)
    pairs = raster_setup.bin_triangles(setup, config)
    depth, vis, _ = raster_tiles_pallas(pairs, config, interpret=True)
    assert np.asarray(vis).max() == 0
    assert np.asarray(depth).max() == 0.0


@pytest.mark.parametrize("group_rows", [8, 16, 32])
def test_pallas_group_binning_matches_ref(group_rows):
    """Group-binned kernel parity across bin granularities. group_rows < 32
    exercises the sub-slab path: the DMA still moves whole 32-row slabs,
    only the row walk narrows to the subgroup."""
    rng = np.random.default_rng(7)
    W, H = 256, 64
    config = FrameConfig(width=W, height=H, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, group_rows=group_rows,
                         max_group_pairs=1 << 12)
    clip_tris = random_clip_triangles(rng, 64)
    setup = setup_from_clip(clip_tris, config)
    lanes = raster_setup.pack_setup_lanes(setup)
    gpairs = raster_setup.bin_groups(lanes, setup.bbox, setup.valid, config)
    tpairs = raster_setup.bin_triangles(setup, config)

    depth_ref, vis_ref = raster_tiles_ref(tpairs, config)
    depth_pl, vis_pl, _ = raster_tiles_pallas(gpairs, config, interpret=True)

    np.testing.assert_array_equal(np.asarray(vis_pl), np.asarray(vis_ref))
    np.testing.assert_allclose(np.asarray(depth_pl), np.asarray(depth_ref),
                               rtol=1e-6, atol=1e-7)

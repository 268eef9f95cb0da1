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

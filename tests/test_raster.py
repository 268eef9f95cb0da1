"""Rasterizer correctness: the jnp tile rasterizer (and its Pallas twin in
interpret mode) vs a brute-force numpy oracle.

This is the test layer the reference lacks (SURVEY.md §4) — per-kernel
numeric tests vs NumPy references.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig
from basicrenderer_tpu.ops import raster_setup
from basicrenderer_tpu.ops.raster_ref import raster_tiles_ref


def numpy_rasterize(screen, z_ndc, valid, W, H):
    """Brute-force per-pixel oracle: for each pixel center, test every
    triangle's barycentrics; keep max-z (reverse-Z closest)."""
    depth = np.zeros((H, W), np.float32)
    vis = np.zeros((H, W), np.int32)
    ys, xs = np.mgrid[0:H, 0:W]
    px = xs + 0.5
    py = ys + 0.5
    for t in range(screen.shape[0]):
        if not valid[t]:
            continue
        (x0, y0), (x1, y1), (x2, y2) = screen[t]
        s = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        if s >= 0:  # backface or degenerate (front = s < 0 in y-down space)
            continue
        w0 = ((y1 - y2) * px + (x2 - x1) * py + (x1 * y2 - y1 * x2)) / s
        w1 = ((y2 - y0) * px + (x0 - x2) * py + (x2 * y0 - y2 * x0)) / s
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = w0 * z_ndc[t, 0] + w1 * z_ndc[t, 1] + w2 * z_ndc[t, 2]
        passd = inside & (z > depth)
        depth[passd] = z[passd]
        vis[passd] = t + 1
    return depth, vis


def random_clip_triangles(rng, n, w_range=(2.0, 10.0)):
    """Random triangles in clip space, mostly on-screen."""
    w = rng.uniform(*w_range, size=(n, 3, 1)).astype(np.float32)
    xy = rng.uniform(-0.9, 0.9, size=(n, 3, 2)).astype(np.float32) * w
    z = rng.uniform(0.05, 0.95, size=(n, 3, 1)).astype(np.float32) * w
    return np.concatenate([xy, z, w], axis=-1)  # (n, 3, 4)


def setup_from_clip(clip_tris, config):
    n = clip_tris.shape[0]
    clip = jnp.asarray(clip_tris.reshape(-1, 4))
    indices = jnp.arange(n * 3, dtype=jnp.int32).reshape(n, 3)
    tri_valid = jnp.ones((n,), bool)
    return raster_setup.triangle_setup(clip, indices, tri_valid, config)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_raster_ref_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    W, H = 128, 64
    config = FrameConfig(width=W, height=H, tile_h=16, tile_w=128,
                         max_pairs=1 << 12, use_pallas_raster=False)
    clip_tris = random_clip_triangles(rng, 40)
    setup = setup_from_clip(clip_tris, config)
    pairs = raster_setup.bin_triangles(setup, config)
    depth, vis = raster_tiles_ref(pairs, config)
    depth = np.asarray(depth)[:H, :W]
    vis = np.asarray(vis)[:H, :W]

    depth_np, vis_np = numpy_rasterize(
        np.asarray(setup.screen_xy), np.asarray(setup.z_ndc),
        np.asarray(setup.valid), W, H)

    # Edge pixels can differ by tie-breaks; demand > 99.5% agreement and
    # exact depth where the winner agrees.
    agree = vis == vis_np
    assert agree.mean() > 0.995, f"vis agreement {agree.mean():.4f}"
    np.testing.assert_allclose(depth[agree], depth_np[agree], rtol=1e-4, atol=1e-5)


def test_binning_counts_and_offsets():
    rng = np.random.default_rng(7)
    config = FrameConfig(width=256, height=128, tile_h=32, tile_w=128,
                         max_pairs=1 << 10)
    clip_tris = random_clip_triangles(rng, 20)
    setup = setup_from_clip(clip_tris, config)
    pairs = raster_setup.bin_triangles(setup, config)
    offs = np.asarray(pairs.tile_offsets)
    # Rows [0, max_big_tris) hold the global large-triangle list; binned
    # per-tile ranges follow.
    assert offs[0] == config.max_big_tris
    assert np.all(np.diff(offs) >= 0)
    ids = np.asarray(pairs.pair_data[config.max_big_tris:, 9]).astype(np.int32)
    big_ids = np.asarray(pairs.pair_data[:config.max_big_tris, 9]).astype(np.int32)
    assert (ids > 0).sum() == int(pairs.num_pairs)
    assert (big_ids > 0).sum() == int(pairs.big_count)
    assert offs[-1] - offs[0] == int(pairs.num_pairs)
    assert int(pairs.overflow) == 0
    # Every valid triangle appears at least once (small bins or big list).
    live = np.concatenate([ids[ids > 0], big_ids[big_ids > 0]]) - 1
    valid_tris = np.nonzero(np.asarray(setup.valid))[0]
    assert set(valid_tris).issubset(set(live.tolist()))


def test_large_triangle_path_matches_small_path():
    """Triangles spanning more than max_tiles_per_tri tiles ride the global
    big-triangle list; the image must be identical to a config where every
    triangle fits the per-tile bins (regression: these spans used to be
    silently dropped, which punched holes in ortho shadow maps)."""
    rng = np.random.default_rng(11)
    W, H = 256, 128
    base = dict(width=W, height=H, tile_h=16, tile_w=128, max_pairs=1 << 12)
    clip_tris = random_clip_triangles(rng, 30)
    cfg_small = FrameConfig(**base, max_tiles_per_tri=32)   # all fit (16 tiles)
    cfg_big = FrameConfig(**base, max_tiles_per_tri=2)      # most via big list
    outs = []
    for cfg in (cfg_small, cfg_big):
        setup = setup_from_clip(clip_tris, cfg)
        pairs = raster_setup.bin_triangles(setup, cfg)
        depth, vis = raster_tiles_ref(pairs, cfg)
        outs.append((np.asarray(depth), np.asarray(vis)))
    assert int(pairs.big_count) > 0, "test scene exercised no big triangles"
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6, atol=1e-7)


def test_binning_overflow_reported():
    rng = np.random.default_rng(3)
    config = FrameConfig(width=256, height=256, tile_h=32, tile_w=128,
                         max_pairs=8, max_tiles_per_tri=4)
    clip_tris = random_clip_triangles(rng, 50)
    setup = setup_from_clip(clip_tris, config)
    pairs = raster_setup.bin_triangles(setup, config)
    assert int(pairs.overflow) > 0


def test_backface_culled():
    config = FrameConfig(width=64, height=64, tile_h=32, tile_w=128,
                         max_pairs=256)
    # One CCW (front) and its reversed (back) copy.
    tri = np.array([[[-0.5, -0.5, 0.5, 1.0],
                     [0.5, -0.5, 0.5, 1.0],
                     [0.0, 0.5, 0.5, 1.0]]], np.float32)
    back = tri[:, ::-1, :]
    setup_f = setup_from_clip(tri, config)
    setup_b = setup_from_clip(back, config)
    assert bool(setup_f.valid[0]) != bool(setup_b.valid[0])


def test_depth_ordering_reverse_z():
    """Nearer triangle (bigger reverse-Z) must win."""
    config = FrameConfig(width=64, height=64, tile_h=32, tile_w=128,
                         max_pairs=256, use_pallas_raster=False)
    def tri_at(z, w=1.0):
        return np.array([[[-0.8 * w, -0.8 * w, z * w, w],
                          [0.8 * w, -0.8 * w, z * w, w],
                          [0.0, 0.8 * w, z * w, w]]], np.float32)
    tris = np.concatenate([tri_at(0.2), tri_at(0.7)])  # 0.7 = closer
    setup = setup_from_clip(tris, config)
    pairs = raster_setup.bin_triangles(setup, config)
    depth, vis = raster_tiles_ref(pairs, config)
    vis = np.asarray(vis)
    center = vis[32, 32]
    assert center == 2  # second triangle (id 2) is closer

"""Attribute-resolve pass: Pallas-interpret vs jnp twin parity, and
plane-interpolation vs the gather-based barycentric oracle
(shade.resolve_gbuffer)."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, make_view
from basicrenderer_tpu.ops import raster_setup, shade as shade_ops
from basicrenderer_tpu.ops.raster_ref import raster_tiles_ref
from basicrenderer_tpu.ops.resolve_pallas import (
    resolve_attributes_pallas, resolve_attributes_ref)

from tests.test_frame_e2e import build_test_scene

CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 12, use_pallas_raster=False)


def _setup_scene_frame():
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    clip, world_pos = raster_setup.transform_vertices(
        buffers.positions, buffers.vert_object, buffers.object_mats, vd.viewproj)
    world_normals = raster_setup.transform_normals(
        buffers.normals, buffers.vert_object, buffers.object_normal_mats)
    setup = raster_setup.triangle_setup(
        clip, buffers.indices, buffers.tri_object >= 0, CFG,
        world_normals=world_normals, uvs=buffers.uvs)
    pairs = raster_setup.bin_triangles(setup, CFG, buffers.tri_material)
    depth_p, vis_p = raster_tiles_ref(pairs, CFG)
    return buffers, vd, setup, pairs, depth_p, vis_p, world_pos, world_normals


def test_resolve_pallas_interpret_matches_ref():
    _, _, _, pairs, _, vis_p, _, _ = _setup_scene_frame()
    ch_ref = resolve_attributes_ref(pairs, vis_p, CFG)
    ch_pl = resolve_attributes_pallas(pairs, vis_p, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(ch_pl), np.asarray(ch_ref),
                               rtol=1e-6, atol=1e-7)


def test_plane_interpolation_matches_barycentric_oracle():
    buffers, vd, setup, pairs, depth_p, vis_p, world_pos, world_normals = \
        _setup_scene_frame()
    H, W = CFG.height, CFG.width
    depth, vis = depth_p[:H, :W], vis_p[:H, :W]
    channels = resolve_attributes_ref(pairs, vis_p, CFG)
    gb_planes = shade_ops.gbuffer_from_channels(
        channels[:, :H, :W], depth, vis, vd, buffers.material_table, W, H)
    gb_oracle = shade_ops.resolve_gbuffer(
        vis, depth, setup.edges, setup.inv_w, buffers, world_pos, world_normals)

    m = np.asarray(gb_oracle.valid)
    assert m.any()
    # Normals: plane interpolation must match barycentric interpolation.
    n_p = np.asarray(gb_planes.normal)[m]
    n_o = np.asarray(gb_oracle.normal)[m]
    assert np.abs(n_p - n_o).max() < 1e-3
    # UVs likewise.
    uv_p = np.asarray(gb_planes.uv)[m]
    uv_o = np.asarray(gb_oracle.uv)[m]
    assert np.abs(uv_p - uv_o).max() < 1e-3
    # World position from depth reconstruction vs direct interpolation.
    wp_p = np.asarray(gb_planes.world_pos)[m]
    wp_o = np.asarray(gb_oracle.world_pos)[m]
    assert np.abs(wp_p - wp_o).max() < 5e-2  # f32 depth roundtrip tolerance
    # Material ids identical.
    np.testing.assert_array_equal(np.asarray(gb_planes.material_id)[m],
                                  np.asarray(gb_oracle.material_id)[m])

"""Cluster-LOD: native builder invariants + runtime cut selection +
frame integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import clusters, procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.ops import clod
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


@pytest.fixture(scope="module")
def lod_mesh():
    mesh = procedural.make_uv_sphere(1.0, rings=48, sectors=96)  # ~9k tris
    return clusters.build_cluster_lod(mesh, use_cache=False)


def test_native_library_loads():
    assert clusters._load_native(), "native libclod.so must build and load"


def test_simplify_reduces_and_preserves_locked():
    mesh = procedural.make_uv_sphere(1.0, rings=24, sectors=48)
    locked = np.zeros(mesh.num_vertices, np.uint8)
    locked[:10] = 1
    locked_pos = mesh.positions[:10].copy()
    sp, si, src, err = clusters.simplify(mesh.positions, mesh.indices, locked,
                                         mesh.num_triangles // 4)
    # Provenance maps every output vertex to a real input vertex.
    assert src.min() >= 0 and src.max() < mesh.num_vertices
    assert len(si) <= mesh.num_triangles // 2
    assert len(si) > 0
    assert err >= 0
    # Locked positions survive verbatim somewhere in the output.
    d = np.linalg.norm(sp[None, :, :] - locked_pos[:, None, :], axis=-1).min(1)
    assert d.max() < 1e-6
    # Simplified mesh stays on the sphere-ish (max deviation bounded).
    r = np.linalg.norm(sp, axis=1)
    assert abs(r.mean() - 1.0) < 0.1


def test_builder_invariants(lod_mesh):
    cl = lod_mesh
    assert cl.num_levels >= 2
    assert len(cl.indices) > cl.source_tris  # soup holds all levels
    tbl = cl.clusters
    # parent_error strictly greater than self_error (monotonic cut).
    assert (tbl[:, 5] > tbl[:, 4]).all()
    # Top level has infinite parent error; level 0 has zero self error.
    assert np.isinf(tbl[tbl[:, 6] == tbl[:, 6].max(), 5]).all()
    assert (tbl[tbl[:, 6] == 0, 4] == 0).all()
    # Every triangle belongs to a cluster in range.
    assert cl.tri_cluster.min() >= 0
    assert cl.tri_cluster.max() < len(tbl)
    # Coarser levels have fewer triangles.
    lvl_of_tri = tbl[cl.tri_cluster, 6]
    counts = [int((lvl_of_tri == l).sum()) for l in range(cl.num_levels)]
    assert all(counts[i] > counts[i + 1] for i in range(len(counts) - 1))


def _cut_scene(lod_mesh, cam_dist):
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    mid = meshes.add(clusters.to_mesh_data(lod_mesh))
    sc = Scene()
    sc.create_renderable(mid, 0)
    sc.create_directional_light(direction=(-0.3, -1, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 0.4, cam_dist), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 16, max_triangles=1 << 16,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=1 << 12)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 14, use_pallas_raster=False, enable_clod=True)


def test_cut_selects_exactly_one_level_per_ray(lod_mesh):
    buffers, vd = _cut_scene(lod_mesh, 3.0)
    cut, n = clod.select_cluster_cut(buffers, vd, CFG, jnp.float32(1.0))
    cut = np.asarray(cut)
    assert cut.any()
    # The cut never selects both a level-0 cluster and a top-level cluster
    # of wildly different errors at the same time unless the DAG demands it;
    # structural check: selected clusters' self_px <= tau < parent_px holds
    # by construction, so just check counts are sane.
    assert int(n) == cut.sum()


def test_cut_coarsens_with_distance(lod_mesh):
    levels = []
    for dist in (2.0, 8.0, 30.0):
        buffers, vd = _cut_scene(lod_mesh, dist)
        cut, _ = clod.select_cluster_cut(buffers, vd, CFG, jnp.float32(1.0))
        tbl = np.asarray(buffers.cluster_table)
        sel = np.asarray(cut)
        lv = tbl[sel, 6]
        levels.append(lv.mean() if sel.any() else np.inf)
    assert levels[0] <= levels[1] <= levels[2]
    assert levels[2] > levels[0]  # far away uses coarser LODs


def test_clod_frame_renders_and_saves_triangles(lod_mesh):
    buffers, vd = _cut_scene(lod_mesh, 12.0)
    out = jax.jit(build_frame_fn(CFG))(buffers, vd, FrameParams.default())
    vis = np.asarray(out["vis"])
    assert (vis > 0).mean() > 0.005  # sphere visible
    # Far away: far fewer pairs than the full soup triangle count.
    assert int(out["num_pairs"]) < lod_mesh.source_tris // 2

    # Close up: more pairs (finer cut), still renders.
    buffers2, vd2 = _cut_scene(lod_mesh, 2.0)
    out2 = jax.jit(build_frame_fn(CFG))(buffers2, vd2, FrameParams.default())
    assert int(out2["num_pairs"]) > int(out["num_pairs"])
    assert (np.asarray(out2["vis"]) > 0).mean() > 0.05


def test_cut_interior_coverage_hole_free_across_tau(lod_mesh):
    """Sweep the LOD threshold: the sphere's interior must stay fully
    covered at EVERY tau (regression: coarse meshlets used to mix simplify
    groups, so for tau between two groups' errors neither the children nor
    the coarse cluster was selected and geometry vanished — ADVICE r1)."""
    buffers, vd = _cut_scene(lod_mesh, 3.0)
    frame = jax.jit(build_frame_fn(CFG), static_argnums=())
    # Interior disk: project the unit sphere at the known camera distance.
    H = W = 128
    yy, xx = np.mgrid[0:H, 0:W]
    params0 = FrameParams.default()
    out0 = frame(buffers, vd, params0)
    vis0 = np.asarray(out0["vis"]) > 0
    cy, cx = np.argwhere(vis0).mean(0)
    r = np.sqrt(vis0.sum() / np.pi)
    for tau in (0.1, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0):
        # The LOD error budget permits geometric deviation up to tau px
        # (plus raster rounding); holes deeper than that violate the cut
        # invariant. Pre-fix, tau=1.0 lost >1000 interior pixels.
        rad = 0.7 * r - tau - 2.0
        if rad < 5.0:
            continue
        interior = (yy - cy) ** 2 + (xx - cx) ** 2 < rad ** 2
        assert interior.sum() > 200
        params = params0.replace(clod_error_px=jnp.float32(tau))
        out = frame(buffers, vd, params)
        vis = np.asarray(out["vis"]) > 0
        holes = interior & ~vis
        assert holes.sum() == 0, \
            f"tau={tau}: {holes.sum()} interior pixels lost coverage"


def test_coarse_lods_preserve_uvs(lod_mesh):
    """Every LOD level keeps a live UV parameterization (regression: coarse
    levels used to get zero UVs — VERDICT r1 #31)."""
    cl = lod_mesh
    lvl_of_tri = cl.clusters[cl.tri_cluster, 6]
    for l in range(cl.num_levels):
        tris = cl.indices[lvl_of_tri == l]
        uvs = cl.uvs[np.unique(tris)]
        assert uvs[:, 0].max() - uvs[:, 0].min() > 0.6, f"level {l}"
        assert uvs[:, 1].max() - uvs[:, 1].min() > 0.4, f"level {l}"


def test_textured_checker_survives_coarse_lod(lod_mesh):
    """Golden check: a checkered sphere still shows the pattern when the
    cut selects coarse LODs (UV provenance through simplification)."""
    from basicrenderer_tpu.models.textures import TextureRegistry

    meshes = MeshRegistry()
    mats = MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard(a=(1, 1, 1), b=(0.03, 0.03, 0.03), squares=8)
    mid = meshes.add(clusters.to_mesh_data(lod_mesh))
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          roughness=0.9, base_color_texture=checker))
    sc = Scene()
    sc.create_renderable(mid, m)
    sc.create_directional_light(direction=(0, -0.4, -1), intensity=3.0)
    sc.set_camera(position=(0, 0.3, 2.6), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 16, max_triangles=1 << 16,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=1 << 12)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    import dataclasses
    cfg = dataclasses.replace(CFG, enable_textures=True, texture_downscale=1)
    frame = jax.jit(build_frame_fn(cfg))
    tbl = np.asarray(buffers.cluster_table)
    for tau in (0.5, 8.0, 32.0):
        params = FrameParams.default().replace(clod_error_px=jnp.float32(tau))
        out = frame(buffers, vd, params)
        img = np.asarray(out["image"]).astype(np.float32)
        vis = np.asarray(out["vis"]) > 0
        assert vis.mean() > 0.05
        lum = img[..., 0][vis]
        bright = (lum > 100).mean()
        assert 0.1 < bright < 0.9, f"tau={tau}: checker lost ({bright})"
        # Confirm coarse taus actually select coarser levels.
        cut, _ = clod.select_cluster_cut(buffers, vd, cfg,
                                         jnp.float32(tau))
        sel = np.asarray(cut)
        if tau >= 32.0:
            assert tbl[sel, 6].mean() >= 1.0

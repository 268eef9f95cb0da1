"""Frame-integrated geometry streaming: touched-group feedback -> page
loads -> residency-patched LOD cut (reference: CLodStreamingSystem).

Contracts: a missing fine group coarsens (parent selected) with NO holes;
the renderer's feedback loop converges to the wanted cut; eviction under a
tight slab keeps frames valid."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import clusters, procedural
from basicrenderer_tpu.ops import clod
from basicrenderer_tpu.renderer import Renderer
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry


@pytest.fixture(scope="module")
def lod_mesh():
    mesh = procedural.make_uv_sphere(1.0, rings=48, sectors=96)
    return clusters.build_cluster_lod(mesh, use_cache=False)


def _scene(lod_mesh):
    meshes, mats = MeshRegistry(), MaterialRegistry()
    mid = meshes.add(clusters.to_mesh_data(lod_mesh))
    sc = Scene()
    sc.create_renderable(mid, 0)
    sc.create_directional_light(direction=(-0.3, -1, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 0.4, 3.0), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 16, max_triangles=1 << 16,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=1 << 12, max_geom_clusters=1 << 10,
                            max_groups=1 << 10)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return sc, bridge, buffers, make_view(view, proj, pos)


CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 14, use_pallas_raster=False,
                  enable_clod=True)


def test_builder_emits_group_ids(lod_mesh):
    cl = lod_mesh
    assert cl.feeds_group is not None and cl.made_group is not None
    lvl = cl.clusters[:, 6]
    top = lvl == lvl.max()
    assert (cl.feeds_group[top] == -1).all()      # top level never streams
    assert (cl.feeds_group[~top] >= 0).all()
    assert (cl.made_group[lvl == 0] == -1).all()  # level 0 made from source
    # Invariant: a cluster's feeds group differs from its made group.
    both = (cl.feeds_group >= 0) & (cl.made_group >= 0)
    assert (cl.feeds_group[both] != cl.made_group[both]).all()


def test_missing_group_coarsens_without_holes(lod_mesh):
    _sc, _bridge, buffers, vd = _scene(lod_mesh)
    params = FrameParams.default()
    frame = jax.jit(build_frame_fn(CFG))
    out0 = frame(buffers, vd, params)
    vis0 = np.asarray(out0["vis"]) > 0

    # Drop residency of every group the current cut's level-0 clusters feed.
    cut0, _ = clod.select_cluster_cut(buffers, vd, CFG, jnp.float32(1.0))
    cut0 = np.asarray(cut0)
    feeds = np.asarray(buffers.cluster_feeds)
    lvl = np.asarray(buffers.cluster_table[:, 6])
    in_cut = cut0 & (feeds >= 0)
    assert in_cut.any()
    finest = lvl[in_cut].min()
    fine_groups = np.unique(feeds[in_cut & (lvl == finest)])
    assert len(fine_groups) > 0
    resident = np.ones(buffers.group_resident.shape[0], bool)
    resident[fine_groups] = False
    b2 = buffers.replace(group_resident=jnp.asarray(resident))

    cut2, _ = clod.select_cluster_cut(b2, vd, CFG, jnp.float32(1.0))
    cut2 = np.asarray(cut2)
    # None of the missing groups' clusters selected...
    assert not (cut2 & np.isin(feeds, fine_groups)).any()
    # ...and coarser ancestors took over: the render stays hole-free.
    out2 = frame(b2, vd, params)
    vis2 = np.asarray(out2["vis"]) > 0
    yy, xx = np.mgrid[0:128, 0:128]
    cy, cx = np.argwhere(vis0).mean(0)
    r = np.sqrt(vis0.sum() / np.pi) * 0.7 - 3
    interior = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
    holes = interior & ~vis2
    assert holes.sum() == 0, f"{holes.sum()} holes after coarsening"


def test_renderer_streaming_feedback_loop(lod_mesh):
    r = Renderer(caps=BridgeCapacities(
        max_vertices=1 << 16, max_triangles=1 << 16, max_objects=8,
        max_materials=4, max_lights=4, max_clusters=1 << 12,
        max_geom_clusters=1 << 10, max_groups=1 << 10))
    mid = r.meshes.add(clusters.to_mesh_data(lod_mesh))
    sc = Scene()
    sc.create_renderable(mid, 0)
    sc.create_directional_light(direction=(-0.3, -1, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 0.4, 2.2), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    r.settings.set("renderResolution", (128, 128))
    r.settings.set("tileSize", (16, 128))
    r.settings.set("maxTrianglePairs", 1 << 14)
    r.settings.set("enableStreaming", True)
    r.settings.set("streamingSlots", 256)
    r.settings.set("enableShadows", False)
    r.settings.set("enableClusteredLighting", False)
    r.settings.set("enableIBL", False)
    r.settings.set("enableBloom", False)
    r.set_current_scene(sc)

    imgs = []
    for i in range(8):
        r.update()
        imgs.append(r.render_to_numpy())
    st = r._streamer
    assert st is not None
    assert st.loads > 0
    assert st.resident_groups > 0
    # The feedback loop converged: the last frames are identical and match
    # a fully-resident render.
    np.testing.assert_array_equal(imgs[-1], imgs[-2])
    r2 = Renderer(caps=r.caps)
    mid2 = r2.meshes.add(clusters.to_mesh_data(lod_mesh))
    sc2 = Scene()
    sc2.create_renderable(mid2, 0)
    sc2.create_directional_light(direction=(-0.3, -1, -0.2), intensity=3.0)
    sc2.set_camera(position=(0, 0.4, 2.2), target=(0, 0, 0), aspect=1.0)
    sc2.propagate_transforms()
    for k in ("renderResolution", "tileSize", "maxTrianglePairs"):
        r2.settings.set(k, r.settings.get(k))
    r2.settings.set("enableShadows", False)
    r2.settings.set("enableClusteredLighting", False)
    r2.settings.set("enableIBL", False)
    r2.settings.set("enableBloom", False)
    r2.set_current_scene(sc2)
    r2.update()
    full = r2.render_to_numpy()
    np.testing.assert_array_equal(imgs[-1], full)

"""Quantized vertex pages + disk page-blob container (reference:
ClusterLODUtilities.cpp:1194-1330 quantization; CLodCache.h:17-110 page
blobs + locators)."""

import numpy as np
import pytest

from basicrenderer_tpu.models import clusters, procedural
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.models.pageblob import (PageBlobContainer,
                                               dequantize_page_np,
                                               oct_decode_np, oct_encode,
                                               quantize_page,
                                               write_container)
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(3)
    nv = 200
    pos = rng.uniform(-5, 7, (nv, 3)).astype(np.float32)
    nrm = rng.normal(size=(nv, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    uv = rng.uniform(-2, 3, (nv, 2)).astype(np.float32)
    rows10 = np.concatenate([pos, nrm, uv, np.zeros((nv, 2), np.float32)],
                            axis=1)
    packed, dq = quantize_page(rows10, 384)
    out = dequantize_page_np(packed, dq, 384)[:nv]
    ext = pos.max(0) - pos.min(0)
    # Positions: 16-bit in cluster bounds -> error <= ext/65535 per axis.
    assert np.abs(out[:, 0:3] - pos).max() <= (ext / 65535.0).max() * 1.01
    # Normals: octahedral u8 pair -> within ~1 degree.
    dots = np.sum(out[:, 3:6] * nrm, axis=1)
    assert dots.min() > 0.9995
    # UVs: half floats -> relative error ~1e-3.
    assert np.abs(out[:, 6:8] - uv).max() <= \
        np.abs(uv).max() * 2e-3 + 1e-3


def test_oct_encode_axes_exact():
    axes = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [-1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    dec = oct_decode_np(oct_encode(axes))
    np.testing.assert_allclose(dec, axes, atol=1e-6)


def _packed_sphere_scene(tmp_path):
    mesh = procedural.make_uv_sphere(1.0, rings=32, sectors=64)
    cl = clusters.build_cluster_lod(mesh, use_cache=False)
    meshes, mats = MeshRegistry(), MaterialRegistry()
    mid = meshes.add(clusters.to_mesh_data(cl))
    sc = Scene()
    sc.create_renderable(mid, 0)
    sc.create_directional_light(direction=(-0.3, -1, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 0.4, 3.0), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 15, max_triangles=1 << 15,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=1 << 11, max_geom_clusters=1 << 10,
                            max_groups=1 << 10)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    bridge.pack_geometry()
    return bridge


def test_container_roundtrip(tmp_path):
    bridge = _packed_sphere_scene(tmp_path)
    p = bridge.packed
    path = str(tmp_path / "scene.brpb")
    bridge.save_page_container(path)
    c = PageBlobContainer(path)
    assert c.header.num_pages == p.cluster_verts.shape[0]
    assert c.header.num_groups == p.num_groups
    np.testing.assert_array_equal(c.geom_group, p.geom_group)
    np.testing.assert_allclose(c.dequant, p.cluster_dequant)
    # Every page reads back bit-exact through its locator.
    for g in (0, 1, c.header.num_pages // 2, c.header.num_pages - 1):
        np.testing.assert_array_equal(c.read_page(g), p.cluster_verts[g])
    # Group locator map covers exactly the streamable groups.
    streamable = set(int(g) for g in np.unique(p.geom_group) if g >= 0)
    assert set(c.group_pages.keys()) == streamable


def test_streamer_disk_matches_host(tmp_path):
    """Streaming from the DISK container converges to the same resident
    set and identical device slabs as host-RAM streaming."""
    import time
    from basicrenderer_tpu.models.streaming import GeometryStreamer
    bridge = _packed_sphere_scene(tmp_path)
    p = bridge.packed
    path = str(tmp_path / "scene.brpb")
    bridge.save_page_container(path)
    c = PageBlobContainer(path)
    G = p.cluster_verts.shape[0]
    GR = 1 << 10

    host = GeometryStreamer(p, GR, num_slots=G)
    disk = GeometryStreamer(max_groups=GR, num_slots=G, container=c)
    try:
        touched = np.zeros(GR, bool)
        want = sorted(host.group_pages.keys())[:8]
        for g in want:
            touched[g] = True
        hv, hdq, hslot, hres = host.update(touched)
        # Disk loads are async: poll until the IO thread has staged + the
        # streamer consumed all wanted groups.
        for _ in range(200):
            dv, ddq, dslot, dres = disk.update(touched)
            if all(disk.resident[g] for g in want):
                break
            time.sleep(0.02)
        assert all(disk.resident[g] for g in want)
        assert all(host.resident[g] for g in want)
        # Same pages resident (slot assignment may differ; compare via the
        # slot tables): every wanted page maps to identical slab rows.
        hv, dv = np.asarray(hv), np.asarray(dv)
        hdq, ddq = np.asarray(hdq), np.asarray(ddq)
        hslot, dslot = np.asarray(hslot), np.asarray(dslot)
        for g in want:
            for page in host.group_pages[g]:
                hs, ds_ = hslot[page], dslot[page]
                assert hs >= 0 and ds_ >= 0
                np.testing.assert_array_equal(hv[hs], dv[ds_])
                np.testing.assert_allclose(hdq[hs], ddq[ds_])
    finally:
        disk.stop()


def test_renderer_streams_from_container(tmp_path):
    """End-to-end: Renderer configured with streamingContainer renders the
    sphere from a cold disk start without holes once converged."""
    import jax
    from basicrenderer_tpu.renderer import Renderer
    mesh = procedural.make_uv_sphere(1.0, rings=32, sectors=64)
    cl = clusters.build_cluster_lod(mesh, use_cache=False)
    caps = BridgeCapacities(max_vertices=1 << 15, max_triangles=1 << 15,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=1 << 11, max_geom_clusters=1 << 10,
                            max_groups=1 << 10)
    r = Renderer(caps=caps)
    mid = r.meshes.add(clusters.to_mesh_data(cl))
    sc = Scene()
    sc.create_renderable(mid, 0)
    sc.create_directional_light(direction=(-0.3, -1, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 0.4, 3.0), target=(0, 0, 0))
    sc.propagate_transforms()
    r.settings.set("renderResolution", (128, 128))
    r.settings.set("maxTrianglePairs", 1 << 14)
    r.settings.set("maxVisibleClusters", 256)
    r.set_current_scene(sc)
    #

    # Build the container from the SAME packing the renderer uses.
    r._bridge.pack_geometry()
    path = str(tmp_path / "scene.brpb")
    r._bridge.save_page_container(path)
    r.settings.set("enableStreaming", True)
    r.settings.set("streamingSlots", 1 << 10)
    r.settings.set("streamingContainer", path)

    img = None
    for _ in range(20):
        r.update()
        img = r.render_to_numpy()
    st = r._streamer
    assert st.container is not None
    assert st.loads > 0
    # Sphere center must be covered (no holes) after convergence.
    h, w = img.shape[:2]
    center = img[h // 2 - 8:h // 2 + 8, w // 2 - 8:w // 2 + 8]
    assert (center.astype(np.float32).sum(-1) > 20).mean() > 0.9
    st.stop()

"""Triangle-accurate ray-traced reflections over the resident cut
(ops/rt_reflect.py; reference: CLodRayTracingSystem +
rayTracedReflections.rt.hlsl — SSR cannot reflect off-screen content,
and the voxel tier reflects blobs, not true geometry)."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn, clod_compact
from basicrenderer_tpu.models import clusters, procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.ops import rt_reflect
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _mirror_scene():
    """Mirror floor + a red sphere ABOVE/BEHIND the camera's view of the
    floor: only a reflected ray sees it."""
    meshes, mats = MeshRegistry(), MaterialRegistry()
    plane = meshes.add(procedural.make_plane(20.0, 8))
    lod = clusters.build_cluster_lod(
        procedural.make_uv_sphere(1.5, rings=16, sectors=32),
        use_cache=False)
    sphere = meshes.add(clusters.to_mesh_data(lod))
    mirror = mats.add(Material(
        base_color=np.array([0.9, 0.9, 0.9, 1], np.float32),
        metallic=1.0, roughness=0.05))
    red = mats.add(Material(
        base_color=np.array([0.9, 0.05, 0.05, 1], np.float32)))
    sc = Scene()
    sc.create_renderable(plane, mirror)
    sc.create_renderable(sphere, red, position=(0.0, 4.0, -1.0))
    sc.create_directional_light(direction=(-0.3, -1.0, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 2.0, 6.0), target=(0, 0.0, 0.0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 14, max_triangles=1 << 14,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=256, max_geom_clusters=128,
                            max_groups=128)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    return buffers, make_view(view, proj, pos)


# IBL on: reflections composite into the prefiltered-specular slot (the
# same compositing point the voxel tier and SSR use).
CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 12, use_pallas_raster=False,
                  enable_clod=True, max_visible_clusters=64,
                  enable_ibl=True,
                  enable_rt_reflect=True, rt_downscale=2)


def test_trace_hits_analytic_sphere_distance():
    """Rays aimed straight at the clustered sphere hit at the analytic
    distance (true triangle intersections, not bounding blobs)."""
    buffers, vd = _mirror_scene()
    comp = clod_compact(buffers, vd, CFG, FrameParams.default(),
                        frustum=False)
    R = 8
    ox = jnp.zeros((R,)); oy = jnp.zeros((R,)) + 4.0
    oz = jnp.linspace(6.0, 8.0, R)              # in front of the sphere
    dx = jnp.zeros((R,)); dy = jnp.zeros((R,)); dz = jnp.full((R,), -1.0)
    node_lo, node_hi, order, cw, rw = rt_reflect.build_slot_bvh(
        buffers, comp)
    combined = rt_reflect._combined_rows(buffers, comp, order, cw, rw)
    # Single candidate: sphere cluster pages all live in a few nodes; use
    # the full intersect on every slot via brute force for the oracle.
    t_best = jnp.full((R,), jnp.inf)
    Kc = order.shape[0]
    for s0 in range(0, Kc, 16):
        for j in range(s0, min(s0 + 16, Kc)):
            rows = jnp.broadcast_to(combined[j], (R, combined.shape[1]))
            t, *_n, hit = rt_reflect._intersect_cluster(
                rows, ox, oy, oz, dx, dy, dz, 1e-3)
            t_best = jnp.where(hit & (t < t_best), t, t_best)
    t_np = np.asarray(t_best)
    # Sphere center (0, 4, -1) r=1.5; ray from (0, 4, z0) along -z hits at
    # z0 - (-1 + 1.5) = z0 - 0.5.
    expect = np.asarray(oz) - 0.5
    ok = np.isfinite(t_np)
    assert ok.all()
    np.testing.assert_allclose(t_np, expect, atol=0.08)  # quantized verts


def test_frame_reflects_offscreen_sphere():
    buffers, vd = _mirror_scene()
    out = jax.jit(build_frame_fn(CFG))(buffers, vd, FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32) / 255.0
    import dataclasses
    base_cfg = dataclasses.replace(CFG, enable_rt_reflect=False)
    out0 = jax.jit(build_frame_fn(base_cfg))(buffers, vd,
                                             FrameParams.default())
    img0 = np.asarray(out0["image"]).astype(np.float32) / 255.0
    vis = np.asarray(out["vis"])
    # The sphere itself is off-screen in the primary view.
    diff = np.abs(img - img0).max(-1)
    floor = vis > 0
    # Reflection changed a meaningful patch of the mirror floor, toward red.
    changed = (diff > 0.05) & floor
    assert changed.mean() > 0.005, changed.mean()
    ys, xs = np.nonzero(changed)
    reds = img[ys, xs, 0] - img0[ys, xs, 0]
    assert reds.mean() > 0.0

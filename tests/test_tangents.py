"""Mikktspace vertex tangents: algorithm invariants, the theta wire
encoding, and end-to-end mirrored-UV normal mapping (reference:
src/Utilities/mikktspace.c feeding the vertex stream; the TPU design
ships one FLAT per-tri tangent angle through raster channel 6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshData, MeshRegistry, compute_tangents
from basicrenderer_tpu.models.textures import TextureRegistry
from basicrenderer_tpu.ops import shade as shade_ops
from basicrenderer_tpu.ops.raster_setup import encode_theta_cols
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _mirrored_plane(size=4.0):
    """Flat +Y plane, TWO quads: left half u in [0,1], right half MIRRORED
    (u runs backward) — the classic mirrored-decal layout. Seam verts are
    duplicated (glTF-conformant content does this)."""
    s = size / 2
    pos = np.array([
        [-s, 0, -s], [0, 0, -s], [0, 0, s], [-s, 0, s],      # left quad
        [0, 0, -s], [s, 0, -s], [s, 0, s], [0, 0, s],        # right quad
    ], np.float32)
    nrm = np.tile(np.array([0, 1, 0], np.float32), (8, 1))
    uv = np.array([
        [0, 0], [1, 0], [1, 1], [0, 1],                      # left: u ->
        [1, 0], [0, 0], [0, 1], [1, 1],                      # right: u <-
    ], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2], [4, 6, 5], [4, 7, 6]], np.int32)
    return MeshData(pos, nrm, uv, idx)


def test_mikktspace_mirrored_handedness():
    md = _mirrored_plane()
    t4 = compute_tangents(md.positions, md.normals, md.uvs, md.indices)
    # Left half: T along +X; right half: T along -X (mirrored u).
    np.testing.assert_allclose(t4[0:4, :3], [[1, 0, 0]] * 4, atol=1e-6)
    np.testing.assert_allclose(t4[4:8, :3], [[-1, 0, 0]] * 4, atol=1e-6)
    # Handedness flips across the mirror.
    assert (t4[0:4, 3] == -t4[4:8, 3]).all()
    # All tangents unit + orthogonal to the normal.
    assert np.allclose(np.linalg.norm(t4[:, :3], axis=1), 1.0, atol=1e-6)
    assert np.allclose(np.sum(t4[:, :3] * md.normals, 1), 0.0, atol=1e-6)


def test_mikktspace_angle_weighting():
    """A long thin sliver contributes per its CORNER ANGLE, not area: at a
    vertex shared by a big square face and a sliver with conflicting UV
    direction, the result leans toward the larger corner angle."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1],
                    [1e-3, 0, -1]], np.float32)
    nrm = np.tile(np.array([0, 1, 0], np.float32), (5, 1))
    # Square maps u->+X; the sliver (tris 2) maps u->+Z at vertex 0.
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 1]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2], [0, 1, 4]], np.int32)
    t4 = compute_tangents(pos, nrm, uv, idx)
    # Vertex 0's square corner angle is 90deg; the sliver's corner there is
    # tiny — the tangent must stay essentially +X.
    assert t4[0, 0] > 0.95, t4[0]


def test_theta_encoding_round_trip():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    # Random unit tangents orthogonal to n, random handedness.
    t = rng.normal(size=(64, 3))
    t -= n * np.sum(t * n, 1, keepdims=True)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    w = np.where(rng.random(64) < 0.5, 1.0, -1.0)
    f = lambda a: jnp.asarray(a, jnp.float32)
    enc = np.asarray(encode_theta_cols(f(t[:, 0]), f(t[:, 1]), f(t[:, 2]),
                                       f(w), f(n[:, 0]), f(n[:, 1]),
                                       f(n[:, 2])))
    T, B = shade_ops.tangent_from_theta(jnp.asarray(n, jnp.float32),
                                        jnp.asarray(enc))
    np.testing.assert_allclose(np.asarray(T), t, atol=2e-5)
    # B carries the handedness: B == cross(n, t) * w.
    np.testing.assert_allclose(np.asarray(B), np.cross(n, t) * w[:, None],
                               atol=2e-5)


@pytest.mark.parametrize("pallas", [False, True])
def test_mirrored_uv_normal_map_end_to_end(pallas):
    """A uniform tangent-space tilt (+x in the map) must tilt the WORLD
    normal in OPPOSITE directions on the two mirrored halves — only a
    handedness-aware per-vertex frame gets this right at and around the
    seam. Checked against the expected frames computed from the mesh's own
    tangents (plumbing test: theta -> lane 30 -> channel 6 -> decode)."""
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=32)
    # Constant tangent-space normal (0.6, 0, 0.8).
    nm = np.zeros((32, 32, 4), np.float32)
    nm[..., 0] = 0.8
    nm[..., 1] = 0.5
    nm[..., 2] = 0.9
    nm[..., 3] = 1.0
    ntex = tex.add(nm, srgb=False)
    mid = meshes.add(_mirrored_plane())
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          roughness=0.9, normal_texture=ntex))
    sc = Scene()
    sc.create_renderable(mid, m)
    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0, 5, 0.05), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64,
                            max_objects=4, max_materials=4, max_lights=2,
                            max_clusters=8, max_geom_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 10, use_pallas_raster=pallas,
                      pallas_interpret=pallas,
                      enable_clod=True, max_visible_clusters=8,
                      enable_textures=True, texture_downscale=1,
                      tex_channels=("base", "normal"),
                      enable_vertex_tangents=True, debug_view="normals")
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32) / 255.0 * 2.0 - 1.0
    left = img[40:88, 20:55].reshape(-1, 3).mean(0)
    right = img[40:88, 73:108].reshape(-1, 3).mean(0)
    left /= np.linalg.norm(left)
    right /= np.linalg.norm(right)
    # Expected: n2 = T*0.6 + B*0 + N*0.8 with T = +-X per half.
    exp_left = np.array([0.6, 0.8, 0.0])
    exp_right = np.array([-0.6, 0.8, 0.0])
    np.testing.assert_allclose(left, exp_left, atol=0.04)
    np.testing.assert_allclose(right, exp_right, atol=0.04)
    # The same scene WITHOUT vertex tangents: the derivative frame also
    # mirrors in the interior (sanity) — the vertex path must agree there,
    # proving it's a strict upgrade, exact at seams/degenerate UVs too.
    import dataclasses
    cfg2 = dataclasses.replace(cfg, enable_vertex_tangents=False)
    out2 = jax.jit(build_frame_fn(cfg2))(buffers, make_view(view, proj,
                                                            pos),
                                         FrameParams.default())
    img2 = np.asarray(out2["image"]).astype(np.float32) / 255.0 * 2.0 - 1.0
    l2 = img2[40:88, 20:55].reshape(-1, 3).mean(0)
    l2 /= np.linalg.norm(l2)
    np.testing.assert_allclose(l2, exp_left, atol=0.06)


def test_mirrored_uv_normal_map_rotated_instance():
    """Same mirrored plane, instance rotated 90 deg about +Y: the world
    tilt directions must rotate with the object (+X tilt -> -Z/+Z world).
    Guards against baking object-space tangent angles (ONB does not
    commute with rotation)."""
    import basicrenderer_tpu.utils.math3d as m3
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=32)
    nm = np.zeros((32, 32, 4), np.float32)
    nm[..., 0] = 0.8
    nm[..., 1] = 0.5
    nm[..., 2] = 0.9
    nm[..., 3] = 1.0
    ntex = tex.add(nm, srgb=False)
    mid = meshes.add(_mirrored_plane())
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          roughness=0.9, normal_texture=ntex))
    sc = Scene()
    q = np.asarray(m3.quat_from_axis_angle([0, 1, 0], np.pi / 2))
    sc.create_renderable(mid, m, rotation=q)
    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0, 5, 0.05), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64,
                            max_objects=4, max_materials=4, max_lights=2,
                            max_clusters=8, max_geom_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 10, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=8,
                      enable_textures=True, texture_downscale=1,
                      tex_channels=("base", "normal"),
                      enable_vertex_tangents=True, debug_view="normals")
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32) / 255.0 * 2.0 - 1.0
    # Rotation by +90deg about Y maps +X -> -Z; screen: the object X axis
    # now runs along view Z, halves stack vertically on screen.
    top = img[20:55, 40:88].reshape(-1, 3).mean(0)
    bot = img[73:108, 40:88].reshape(-1, 3).mean(0)
    top /= np.linalg.norm(top)
    bot /= np.linalg.norm(bot)
    # One half tilts toward world -Z, the other +Z; X stays ~0.
    zs = sorted([top[2], bot[2]])
    assert zs[0] < -0.5 and zs[1] > 0.5, (top, bot)
    assert abs(top[0]) < 0.1 and abs(bot[0]) < 0.1, (top, bot)

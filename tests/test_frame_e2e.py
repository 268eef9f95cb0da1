"""End-to-end frame tests: scene -> jitted frame program -> image.

The reference has no image tests (SURVEY.md §4); these are the golden-frame
smoke layer — structural assertions (coverage, lighting direction, material
colors) rather than stored goldens, so they are robust to shading tweaks.
"""

import numpy as np
import jax
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def build_test_scene():
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    cube = meshes.add(procedural.make_cube(1.0))
    plane = meshes.add(procedural.make_plane(10.0, 2))
    red = mats.add(Material(name="red", base_color=np.array([0.8, 0.1, 0.1, 1], np.float32),
                            roughness=0.4))
    gray = mats.add(Material(name="gray", base_color=np.array([0.5, 0.5, 0.5, 1], np.float32),
                             roughness=0.9))
    sc = Scene()
    sc.create_renderable(plane, gray)
    sc.create_renderable(cube, red, position=(0, 0.5, 0))
    sc.create_directional_light(direction=(-0.4, -1, -0.3), intensity=3.0)
    sc.set_camera(position=(3, 2.5, 4), target=(0, 0.5, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=16, max_materials=16, max_lights=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    return sc, bridge


CFG = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                  max_pairs=1 << 12, use_pallas_raster=False)


@pytest.fixture(scope="module")
def frame_out():
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    frame = jax.jit(build_frame_fn(CFG))
    out = frame(buffers, vd, FrameParams.default())
    return {k: np.asarray(v) for k, v in out.items()}


def test_frame_renders_geometry(frame_out):
    vis = frame_out["vis"]
    coverage = (vis > 0).mean()
    assert 0.3 < coverage < 0.95  # plane + cube cover part of frame, sky the rest
    assert frame_out["bin_overflow"] == 0


def test_cube_is_red_plane_is_gray(frame_out):
    img = frame_out["image"].astype(np.float32)
    center = img[60:70, 55:75].reshape(-1, 3).mean(0)
    assert center[0] > center[1] * 1.5  # red dominates on the cube
    corner = img[115:125, 10:30].reshape(-1, 3).mean(0)
    assert abs(corner[0] - corner[1]) < 25 and abs(corner[1] - corner[2]) < 25  # gray plane


def test_depth_is_reverse_z(frame_out):
    depth = frame_out["depth"]
    vis = frame_out["vis"]
    covered = depth[vis > 0]
    assert covered.min() > 0
    assert covered.max() < 1.0


def test_lighting_shades_faces_differently(frame_out):
    """Different cube faces facing different directions must differ in
    brightness (diffuse N.L) — catches normal-transform bugs. Cube faces are
    identified via the visibility buffer: the plane packs first (8 tris),
    then the cube's 12 (2 per face)."""
    img = frame_out["image"].astype(np.float32)
    vis = frame_out["vis"]
    cube_first_tri = 8  # plane = make_plane(10, 2) -> 2*2*2 = 8 triangles
    face_means = []
    for face in range(6):
        t0 = cube_first_tri + face * 2 + 1      # vis ids are tri+1
        mask = (vis == t0) | (vis == t0 + 1)
        if mask.sum() > 20:
            face_means.append(img[mask].mean())
    assert len(face_means) >= 2  # camera sees at least two faces
    assert max(face_means) - min(face_means) > 10


def test_sky_in_uncovered_pixels(frame_out):
    img = frame_out["image"].astype(np.float32)
    vis = frame_out["vis"]
    sky_px = img[vis == 0]
    assert len(sky_px) > 0
    assert sky_px.mean() > 60  # the gradient sky is bright-ish


def test_frame_deterministic():
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    frame = jax.jit(build_frame_fn(CFG))
    a = np.asarray(frame(buffers, vd, FrameParams.default())["image"])
    b = np.asarray(frame(buffers, vd, FrameParams.default())["image"])
    np.testing.assert_array_equal(a, b)


def test_debug_views():
    import dataclasses
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    for mode in ("normals", "depth", "albedo", "clusters"):
        cfg = dataclasses.replace(CFG, debug_view=mode)
        out = jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())
        img = np.asarray(out["image"])
        assert img.shape == (128, 128, 3)
        vis = np.asarray(out["vis"])
        assert img[vis > 0].std() > 1  # non-degenerate visualization

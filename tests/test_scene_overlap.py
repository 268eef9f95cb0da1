"""Scene-update <-> render overlap (reference: the worker-thread snapshot
pipeline, Renderer.cpp:597-741): the overlapped mode must produce the same
images as the synchronous mode, with deferred edits landing one commit
later (the reference's deferred-edit protocol)."""

import numpy as np

from basicrenderer_tpu.renderer import Renderer
from basicrenderer_tpu.scene.bridge import BridgeCapacities
from basicrenderer_tpu.scene.components import Position
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material


def _build(overlap: bool):
    r = Renderer(caps=BridgeCapacities(
        max_vertices=1 << 12, max_triangles=1 << 12, max_objects=8,
        max_materials=4, max_lights=4))
    cube = r.meshes.add(procedural.make_cube(1.0))
    red = r.materials.add(Material(
        base_color=np.array([.8, .1, .1, 1], np.float32)))
    sc = Scene()
    ent = sc.create_renderable(cube, red, position=(0.0, 0.5, 0.0))
    sc.create_directional_light(direction=(-.4, -1, -.3), intensity=3)
    sc.set_camera(position=(3, 2, 4), target=(0, .5, 0))
    sc.propagate_transforms()
    r.settings.set("renderResolution", (128, 128))
    r.settings.set("maxTrianglePairs", 1 << 12)
    r.settings.set("enableSceneOverlap", overlap)
    r.set_current_scene(sc)
    return r, sc, ent


def _drain(r):
    if r._update_future is not None:
        r._update_future.result()


def test_overlap_matches_sync_and_defers_edits():
    rs, ss, es = _build(overlap=False)
    ro, so, eo = _build(overlap=True)

    # Frame 0: identical state -> identical image.
    rs.update()
    img_s0 = rs.render_to_numpy()
    ro.update()
    img_o0 = ro.render_to_numpy()
    np.testing.assert_array_equal(img_s0, img_o0)

    # Deterministic deferred edit: let the in-flight worker finish FIRST,
    # so the edit is flushed by the NEXT scheduled task.
    _drain(ro)
    move = np.array([1.0, 0.5, 0.0], np.float32)
    so.world.defer(lambda: so.world.set(eo, Position(move)))
    ss.world.defer(lambda: ss.world.set(es, Position(move)))

    # Sync mode applies the edit this frame.
    rs.update()
    img_s1 = rs.render_to_numpy()
    assert np.abs(img_s1.astype(int) - img_s0.astype(int)).max() > 0

    # Overlap mode commits the PRE-edit snapshot this frame (1-frame
    # latency)...
    ro.update()
    img_o1 = ro.render_to_numpy()
    np.testing.assert_array_equal(img_o1, img_o0)

    # ...and the edited snapshot the next frame, matching sync output.
    _drain(ro)
    ro.update()
    img_o2 = ro.render_to_numpy()
    np.testing.assert_array_equal(img_o2, img_s1)

    # Toggling overlap off mid-run drains the worker and stays correct.
    ro.settings.set("enableSceneOverlap", False)
    ro.update()
    img_o3 = ro.render_to_numpy()
    np.testing.assert_array_equal(img_o3, img_s1)

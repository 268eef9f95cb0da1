"""Tests for the ECS world and Scene API (reference test strategy: the
reference has no scene tests — SURVEY.md §4 — so these define the contract)."""

import numpy as np

from basicrenderer_tpu.scene.components import (
    Light, LightType, Parent, Position, Renderable, WorldMatrix,
)
from basicrenderer_tpu.scene.ecs import World
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.utils import math3d


def test_world_basic_component_ops():
    w = World()
    e = w.entity()
    w.set(e, Position(np.array([1, 2, 3])))
    assert w.has(e, Position)
    assert np.allclose(w.get(e, Position).value, [1, 2, 3])
    w.remove(e, Position)
    assert not w.has(e, Position)


def test_world_query_multi_component():
    w = World()
    a, b, c = w.entity(), w.entity(), w.entity()
    w.set(a, Position())
    w.set(a, Renderable(0, 0))
    w.set(b, Position())
    w.set(c, Renderable(1, 1))
    found = {eid for eid, _ in w.query(Position, Renderable)}
    assert found == {a}


def test_world_destroy_removes_everything():
    w = World()
    e = w.entity()
    w.set(e, Position())
    w.add_tag(e, "X")
    w.destroy(e)
    assert not w.is_alive(e)
    assert not w.has(e, Position)
    assert not w.has_tag(e, "X")


def test_deferred_ops():
    w = World()
    results = []
    w.defer(lambda: results.append(1))
    assert results == []
    w.flush_deferred()
    assert results == [1]


def test_transform_propagation_hierarchy():
    sc = Scene()
    parent = sc.create_node(position=(10, 0, 0))
    child = sc.create_node(parent=parent, position=(0, 5, 0))
    grandchild = sc.create_node(parent=child, position=(0, 0, 2), scale=(2, 2, 2))
    sc.propagate_transforms()
    wm = sc.world.get(grandchild, WorldMatrix).value
    assert np.allclose(wm[:3, 3], [10, 5, 2], atol=1e-5)
    assert np.allclose(np.diag(wm)[:3], [2, 2, 2], atol=1e-5)


def test_transform_propagation_rotation_chain():
    sc = Scene()
    q = np.asarray(math3d.quat_from_axis_angle([0, 1, 0], np.pi / 2))
    parent = sc.create_node(rotation=q)
    child = sc.create_node(parent=parent, position=(1, 0, 0))
    sc.propagate_transforms()
    wm = sc.world.get(child, WorldMatrix).value
    # +X rotated 90 about +Y -> -Z
    assert np.allclose(wm[:3, 3], [0, 0, -1], atol=1e-5)


def test_directional_light_direction():
    sc = Scene()
    e = sc.create_directional_light(direction=(0, -1, 0))
    sc.propagate_transforms()
    wm = sc.world.get(e, WorldMatrix).value
    d = -wm[:3, 2]
    assert np.allclose(d, [0, -1, 0], atol=1e-5)

    e2 = sc.create_directional_light(direction=(1, 0, 0))
    sc.propagate_transforms()
    wm2 = sc.world.get(e2, WorldMatrix).value
    assert np.allclose(-wm2[:3, 2], [1, 0, 0], atol=1e-5)


def test_append_scene_clones_subtree():
    src = Scene()
    src.create_renderable(0, 0, position=(1, 1, 1))
    dst = Scene()
    mapping = dst.append_scene(src)
    # One renderable cloned over
    rends = list(dst.world.query(Renderable))
    assert len(rends) == 1
    dst.propagate_transforms()


def test_frame_telemetry():
    from basicrenderer_tpu.utils.telemetry import FrameTelemetry
    t = FrameTelemetry(history=4)
    for i in range(6):
        t.begin_frame()
        with t.stage("update"):
            pass
        t.counter("pairs", 10 + i)
        t.end_frame()
    assert len(t.history) == 4          # ring buffer
    assert t.last()["counters"]["pairs"] == 15
    avg = t.averages()
    assert "frame_ms" in avg and "stage.update" in avg

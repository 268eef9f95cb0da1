"""Async readback service (utils/readback.py).

Reference analogue: ReadbackManager + the fenced N-frames-later readback
(CLodStreamingSystem.cpp:1091-1195). Contracts: futures resolve to the
right numpy values in request order, errors surface through the future,
backpressure bounds in-flight requests, and the Renderer's render_async
matches the sync image."""

import time

import numpy as np
import jax.numpy as jnp

from basicrenderer_tpu.utils.readback import ReadbackManager


def test_readback_resolves_values_in_order():
    rb = ReadbackManager(max_in_flight=2)
    futs = [rb.request({"x": jnp.full((4,), float(i))}) for i in range(5)]
    outs = [f.result(timeout=30) for f in futs]
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o["x"], np.full((4,), float(i)))
    rb.close()


def test_readback_post_hook_runs_on_worker():
    rb = ReadbackManager()
    fut = rb.request(jnp.arange(8.0), post=lambda a: float(a.sum()))
    assert fut.result(timeout=30) == 28.0
    rb.close()


def test_readback_error_surfaces_through_future():
    rb = ReadbackManager()
    fut = rb.request(jnp.arange(4.0), post=lambda a: 1 / 0)
    try:
        fut.result(timeout=30)
        raised = False
    except ZeroDivisionError:
        raised = True
    assert raised
    # The manager survives a failed request.
    assert rb.request(jnp.ones(2)).result(timeout=30).sum() == 2.0
    rb.close()


def test_readback_backpressure_bounds_in_flight():
    rb = ReadbackManager(max_in_flight=2)
    slow = lambda a: (time.sleep(0.15), a)[1]
    t0 = time.monotonic()
    futs = [rb.request(jnp.ones(2), post=slow) for _ in range(4)]
    # The 3rd/4th requests must have waited for slots: total queueing time
    # reflects at least two drained slow requests.
    assert time.monotonic() - t0 > 0.25
    for f in futs:
        f.result(timeout=30)
    rb.close()


def test_renderer_render_async_matches_sync():
    from basicrenderer_tpu.renderer import Renderer
    from basicrenderer_tpu.scene.bridge import BridgeCapacities
    from basicrenderer_tpu.scene.scene import Scene
    from basicrenderer_tpu.models import procedural
    from basicrenderer_tpu.models.materials import Material

    r = Renderer(caps=BridgeCapacities(
        max_vertices=1 << 10, max_triangles=1 << 10, max_objects=8,
        max_materials=4, max_lights=4))
    cube = r.meshes.add(procedural.make_cube(1.0))
    red = r.materials.add(Material(
        base_color=np.array([.8, .1, .1, 1], np.float32)))
    sc = Scene()
    sc.create_renderable(cube, red, position=(0, 0.5, 0))
    sc.create_directional_light(direction=(-.4, -1, -.3), intensity=3)
    sc.set_camera(position=(3, 2, 4), target=(0, .5, 0))
    sc.propagate_transforms()
    r.settings.set("renderResolution", (128, 128))
    r.settings.set("maxTrianglePairs", 1 << 12)
    r.set_current_scene(sc)
    r.update()
    sync_img = r.render_to_numpy()
    r.update()
    fut = r.render_async()
    out = fut.result(timeout=60)
    np.testing.assert_array_equal(out["image"], sync_img)

"""Input events: action mapping + per-frame pump (utils/input.py).

Reference analogue: InputAction.h / InputContext.h (WASD + orbital
contexts triggering registered handlers). Contracts: held keys move the
fly camera frame-rate-independently, mouse-drag rotates, the pump is
thread-safe and drains per frame, and the UI server's /input endpoint
feeds the renderer's pump."""

import json
import urllib.request

import numpy as np

from basicrenderer_tpu.utils.camera import FlyCamera, OrbitCamera
from basicrenderer_tpu.utils.input import (InputAction, InputEvent,
                                           InputPump, OrbitContext,
                                           WASDContext, attach_fly,
                                           attach_orbit)


def test_wasd_held_keys_move_fly_camera():
    cam = FlyCamera()
    pump = InputPump(WASDContext())
    attach_fly(pump, cam)
    p0 = cam.position.copy()
    pump.push_raw("key_down", key="w")
    for _ in range(10):
        pump.pump(0.1)                      # 1 second held
    moved = np.linalg.norm(cam.position - p0)
    assert abs(moved - cam.move_speed) < 1e-6   # dt-scaled: 1s * speed
    pump.push_raw("key_up", key="w")
    pump.pump(0.1)
    p1 = cam.position.copy()
    pump.pump(0.1)                          # released: no further motion
    np.testing.assert_array_equal(cam.position, p1)


def test_mouse_drag_rotates_fly_camera():
    cam = FlyCamera()
    pump = InputPump(WASDContext())
    attach_fly(pump, cam)
    yaw0 = cam.yaw
    pump.push_raw("mouse_move", dx=100.0, dy=0.0, buttons=2)
    pump.pump(0.016)
    assert cam.yaw != yaw0
    # Without the right button held, motion is ignored.
    yaw1 = cam.yaw
    pump.push_raw("mouse_move", dx=100.0, dy=0.0, buttons=0)
    pump.pump(0.016)
    assert cam.yaw == yaw1


def test_orbit_context_zoom_and_rotate():
    cam = OrbitCamera()
    pump = InputPump(OrbitContext())
    attach_orbit(pump, cam)
    d0, yaw0 = cam.distance, cam.yaw
    pump.push_raw("wheel", wheel=1.0)
    pump.push_raw("mouse_move", dx=50.0, dy=0.0, buttons=1)
    pump.pump(0.016)
    assert cam.distance < d0        # zoomed in
    assert cam.yaw != yaw0


def test_reset_action_fires():
    fired = []
    ctx = WASDContext()
    ctx.on(InputAction.RESET, lambda m, e: fired.append(m))
    pump = InputPump(ctx)
    pump.push_raw("key_down", key="r")
    assert pump.pump(0.016) == 1
    assert fired == [1.0]


def test_ui_server_input_endpoint():
    from basicrenderer_tpu.renderer import Renderer
    from basicrenderer_tpu.scene.bridge import BridgeCapacities
    from basicrenderer_tpu.scene.scene import Scene
    from basicrenderer_tpu.utils.ui_server import UIServer

    r = Renderer(caps=BridgeCapacities(
        max_vertices=1 << 8, max_triangles=1 << 8, max_objects=4,
        max_materials=2, max_lights=2))
    sc = Scene()
    sc.set_camera(position=(0, 1, 3), target=(0, 0, 0))
    sc.propagate_transforms()
    r.set_current_scene(sc)
    cam = FlyCamera()
    pump = InputPump(WASDContext())
    attach_fly(pump, cam)
    r.input_pump = pump
    srv = UIServer(r).start()
    try:
        body = json.dumps([{"kind": "key_down", "key": "w"},
                           {"kind": "mouse_move", "dx": 10, "dy": 0,
                            "buttons": 2}]).encode()
        req = urllib.request.Request(
            srv.url + "/api/input", data=body,
            headers={"Content-Type": "application/json"})
        resp = json.load(urllib.request.urlopen(req, timeout=10))
        assert resp == {"queued": 2}
        p0 = cam.position.copy()
        pump.pump(0.1)
        assert np.linalg.norm(cam.position - p0) > 0   # 'w' held moved it
    finally:
        srv.stop()

"""Camera controllers + offline tools (reference: InputManager/camera
movement; CLodCacheTool)."""

import numpy as np

from basicrenderer_tpu.utils.camera import FlyCamera, OrbitCamera
from basicrenderer_tpu.scene.scene import Scene


def test_fly_camera_moves_and_looks():
    cam = FlyCamera()
    p0 = cam.position.copy()
    cam.keys(0.5, {"w"})
    assert np.linalg.norm(cam.position - p0) > 1.0
    f0 = cam.forward().copy()
    cam.look(200, 0)
    assert np.linalg.norm(cam.forward() - f0) > 0.1
    sc = Scene()
    cam.apply(sc)
    e1 = sc._primary_camera
    cam.keys(0.1, {"d"})
    cam.apply(sc)
    assert sc._primary_camera == e1   # entity reused, not leaked


def test_orbit_camera():
    cam = OrbitCamera(distance=5.0)
    p0 = cam.position().copy()
    cam.orbit(100, 0)
    assert np.linalg.norm(cam.position() - p0) > 0.5
    cam.zoom(3.0)
    assert np.linalg.norm(cam.position() - cam.target) < 5.0
    sc = Scene()
    cam.apply(sc)
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    assert np.isfinite(view).all() and np.isfinite(proj).all()


def test_clod_cache_cli_info(capsys, tmp_path, monkeypatch):
    from basicrenderer_tpu.models import clusters
    from basicrenderer_tpu.tools.clod_cache import main
    # Hermetic: point the cache at a tmp dir with one artifact in it (the
    # real on-disk cache may be empty on a fresh machine).
    (tmp_path / "deadbeef.npz").write_bytes(b"x" * 1024)
    monkeypatch.setattr(clusters, "CACHE_DIR", str(tmp_path))
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "artifact" in out and "deadbeef" in out

    monkeypatch.setattr(clusters, "CACHE_DIR", str(tmp_path / "missing"))
    assert main(["info"]) == 0
    assert "cache empty" in capsys.readouterr().out

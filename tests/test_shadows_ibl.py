"""Shadows (CSM) + IBL integration tests (CPU, jnp raster path)."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.ops import ibl
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def build_shadow_scene():
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    plane = meshes.add(procedural.make_plane(20.0, 2))
    cube = meshes.add(procedural.make_cube(1.5))
    m = mats.add(Material(base_color=np.array([0.7, 0.7, 0.7, 1], np.float32),
                          roughness=0.8))
    sc = Scene()
    sc.create_renderable(plane, m)
    # Tall box that casts a long shadow.
    sc.create_renderable(cube, m, position=(0, 1.5, 0), scale=(1, 2, 1))
    sc.create_directional_light(direction=(-0.5, -1.0, -0.2), intensity=4.0,
                                cast_shadows=True)
    sc.set_camera(position=(6, 6, 8), target=(0, 0.5, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=8, max_materials=4, max_lights=4)
    return sc, SceneRenderBridge(sc, meshes, mats, caps)


BASE = dict(width=128, height=128, tile_h=16, tile_w=128,
            max_pairs=1 << 12, use_pallas_raster=False)


def _render(cfg, env=None):
    sc, bridge = build_shadow_scene()
    if env is not None:
        buffers = bridge.build_scene_buffers(env_sh=env[0], env_specular=env[1])
    else:
        buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    return jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())


def test_shadows_darken_ground():
    out_ns = _render(FrameConfig(**BASE, enable_shadows=False))
    out_sh = _render(FrameConfig(**BASE, enable_shadows=True,
                                 num_cascades=3, shadow_resolution=256))
    h_ns = np.asarray(out_ns["hdr"])
    h_sh = np.asarray(out_sh["hdr"])
    vis = np.asarray(out_sh["vis"])
    covered = vis > 0
    # Shadowed pixels exist: some covered pixels got significantly darker.
    ratio = h_sh[covered].sum(-1) / np.maximum(h_ns[covered].sum(-1), 1e-6)
    frac_shadowed = (ratio < 0.5).mean()
    assert 0.02 < frac_shadowed < 0.9, f"shadowed fraction {frac_shadowed}"
    # And nothing got brighter.
    assert (ratio < 1.05).all()


def test_sh_irradiance_roundtrip_constant_env():
    """A constant-radiance environment must produce (nearly) constant
    irradiance equal to the radiance (energy conservation of the SH
    convolution)."""
    cube = jnp.ones((6, 32, 32, 3), jnp.float32) * 2.0
    sh = ibl.project_sh(cube)
    n = jnp.array([[0, 1, 0], [1, 0, 0], [0, 0, -1]], jnp.float32)
    e = np.asarray(ibl.eval_sh_irradiance(sh, n))
    np.testing.assert_allclose(e, 2.0, rtol=0.05)


def test_ibl_brightens_frame():
    from basicrenderer_tpu.models.environment import Environment
    env = Environment.procedural(intensity=1.0)
    out_no = _render(FrameConfig(**BASE, enable_ibl=False))
    out_ibl = _render(FrameConfig(**BASE, enable_ibl=True,
                                  ibl_specular_downscale=2),
                      env=(env.sh, env.spec_mips))
    vis = np.asarray(out_ibl["vis"]) > 0
    h0 = np.asarray(out_no["hdr"])[vis].mean()
    h1 = np.asarray(out_ibl["hdr"])[vis].mean()
    assert h1 > h0 * 1.05


def test_cascade_matrices_cover_frustum_slices():
    from basicrenderer_tpu.ops import shadows
    from basicrenderer_tpu.utils import math3d
    view = make_view(math3d.np_look_at([0, 5, 10], [0, 0, 0], [0, 1, 0]),
                     math3d.np_perspective(1.0, 1.0, 0.1, None),
                     np.array([0, 5, 10], np.float32))
    ldir = jnp.array([-0.4, -1.0, -0.2], jnp.float32)
    vps, splits = shadows.cascade_matrices(view, ldir, 4)
    assert vps.shape == (4, 4, 4)
    s = np.asarray(splits)
    assert (np.diff(s) > 0).all()
    # A world point near the camera must land inside cascade 0's unit box.
    p = jnp.array([0.0, 0.0, 8.0, 1.0])
    ls = np.asarray(vps[0] @ p)
    assert abs(ls[0]) <= 1.0 and abs(ls[1]) <= 1.0 and 0.0 <= ls[2] <= 1.0

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
    # Tall wide wall that casts a large unambiguous shadow.
    sc.create_renderable(cube, m, position=(0, 1.5, 0), scale=(3, 2, 0.3))
    # Shadow must land on the camera-visible (+z) side of the wall.
    sc.create_directional_light(direction=(-0.5, -1.0, 0.6), intensity=4.0,
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
    """The GROUND beneath the caster must darken; the caster's own lit faces
    must NOT (regression test for the inverted shadow depth axis — ADVICE r1:
    the old projection stored the farthest-from-light surface, which
    self-shadowed the occluder and left the ground lit)."""
    out_ns = _render(FrameConfig(**BASE, enable_shadows=False))
    out_sh = _render(FrameConfig(**BASE, enable_shadows=True,
                                 num_cascades=3, shadow_resolution=256))
    h_ns = np.asarray(out_ns["hdr"])
    h_sh = np.asarray(out_sh["hdr"])
    vis = np.asarray(out_sh["vis"])
    # Packed triangle order: plane (8 tris) then cube (12); vis = tri id + 1.
    ground = (vis >= 1) & (vis <= 8)
    # Caster check only where the baseline is actually lit (its shadow-side
    # faces have ~0 radiance in both renders; 0/eps is not "darkening").
    cube = (vis > 8) & (h_ns.sum(-1) > 0.05)
    ratio_g = h_sh[ground].sum(-1) / np.maximum(h_ns[ground].sum(-1), 1e-6)
    ratio_c = h_sh[cube].sum(-1) / np.maximum(h_ns[cube].sum(-1), 1e-6)
    frac_ground_shadowed = (ratio_g < 0.5).mean()
    assert 0.02 < frac_ground_shadowed < 0.9, \
        f"ground shadowed fraction {frac_ground_shadowed}"
    # Convex caster: its light-facing pixels must stay lit (tiny tolerance
    # for the 3x3 smoothing at silhouette edges).
    frac_cube_darkened = (ratio_c < 0.5).mean()
    assert frac_cube_darkened < 0.05, \
        f"caster darkened itself: {frac_cube_darkened}"
    # And nothing got brighter.
    assert (np.concatenate([ratio_g, ratio_c]) < 1.05).all()


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


def test_openpbr_coat_adds_sharp_highlight():
    """A rough base with a smooth clear coat gains a tight specular lobe
    (OpenPBR coat: second GGX layer + base attenuation)."""
    import dataclasses
    from basicrenderer_tpu.models import procedural
    from basicrenderer_tpu.models.materials import Material, MaterialRegistry
    from basicrenderer_tpu.models.mesh import MeshRegistry
    from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
    from basicrenderer_tpu.scene.scene import Scene
    from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
    from basicrenderer_tpu.graph.frame import build_frame_fn

    def build(coat):
        meshes, mats = MeshRegistry(), MaterialRegistry()
        sphere = meshes.add(procedural.make_uv_sphere(1.0, rings=24, sectors=48))
        m = mats.add(Material(base_color=np.array([0.6, 0.1, 0.1, 1], np.float32),
                              roughness=0.9, coat_weight=coat,
                              coat_roughness=0.08))
        sc = Scene()
        sc.create_renderable(sphere, m)
        sc.create_directional_light(direction=(-0.5, -0.8, -0.4), intensity=5.0)
        sc.set_camera(position=(0, 0.8, 3), target=(0, 0, 0), aspect=1.0)
        sc.propagate_transforms()
        caps = BridgeCapacities(max_vertices=1 << 12, max_triangles=1 << 12,
                                max_objects=4, max_materials=4, max_lights=2,
                                max_clusters=32, max_geom_clusters=32)
        bridge = SceneRenderBridge(sc, meshes, mats, caps)
        return bridge.build_scene_buffers(), sc

    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 12, use_pallas_raster=False,
                      enable_coat=True)
    imgs = {}
    for coat in (0.0, 1.0):
        buffers, sc = build(coat)
        view, proj, pos = sc.camera_matrices(aspect=1.0)
        out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                           FrameParams.default())
        imgs[coat] = np.asarray(out["image"]).astype(np.float32)
    lum0 = imgs[0.0].mean(-1)
    lum1 = imgs[1.0].mean(-1)
    # Coat concentrates energy: the brightest pixels get brighter.
    assert np.sort(lum1.ravel())[-50:].mean() > \
        np.sort(lum0.ravel())[-50:].mean() + 5

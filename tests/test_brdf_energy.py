"""OpenPBR energy-compensation + fuzz LUT fits (reference: OpenPBR LUTs in
ShaderBuffers.h:139-361 / MaterialManager canonicalization)."""

import jax.numpy as jnp
import numpy as np

from basicrenderer_tpu.ops import brdf_energy as be
from basicrenderer_tpu.ops import shade as shade_ops


def _grid():
    mu = (np.arange(32) + 0.5) / 32
    r = (np.arange(32) + 0.5) / 32
    return np.meshgrid(mu, r, indexing="ij")


def test_ggx_fit_matches_table():
    table = be.ggx_albedo_table()
    MU, R = _grid()
    fit = np.asarray(be.ggx_energy(jnp.asarray(MU, jnp.float32),
                                   jnp.asarray(R, jnp.float32)))
    err = np.abs(fit - table)
    assert err.max() < 0.015, err.max()
    # Physical sanity: albedo <= 1, smooth surfaces reflect ~everything.
    assert table.max() <= 1.0 + 1e-6
    assert table[:, 0].min() > 0.95          # r -> 0: E -> 1
    # Rough grazing GGX loses energy (the thing compensation fixes).
    assert table[2, -1] < 0.85


def test_energy_compensation_white_furnace():
    # For f0 = 1 the compensated albedo is exactly 1: E * (1 + (1-E)/E).
    mu = jnp.asarray([[0.3]], jnp.float32)
    r = jnp.asarray([[0.9]], jnp.float32)
    f0 = jnp.ones((1, 1, 3), jnp.float32)
    comp = be.energy_compensation(f0, mu, r)
    e = be.ggx_energy(mu, r)
    np.testing.assert_allclose(np.asarray(e[..., None] * comp), 1.0,
                               atol=1e-6)
    # f0 = 0: no compensation.
    comp0 = be.energy_compensation(jnp.zeros((1, 1, 3)), mu, r)
    np.testing.assert_allclose(np.asarray(comp0), 1.0, atol=1e-6)


def test_sheen_fit_and_range():
    table = be.sheen_albedo_table()        # rows mu, cols alpha in [.05, 1]
    mu = (np.arange(32) + 0.5) / 32
    MU, A = np.meshgrid(mu, be.sheen_alpha_axis(), indexing="ij")
    fit = np.asarray(be.sheen_energy(jnp.asarray(MU, jnp.float32),
                                     jnp.asarray(A, jnp.float32)))
    assert np.abs(fit - table).max() < 0.015
    assert table.min() >= 0.0 and table.max() <= 1.0


def _gbuffer(h=4, w=4, metallic=1.0, roughness=0.8, fuzz_w=0.0,
             fuzz_r=0.5):
    shape = (h, w)
    up = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 1))
    return shade_ops.GBuffer(
        world_pos=jnp.zeros((h, w, 3)), normal=up,
        albedo=jnp.full((h, w, 3), 0.9), metallic=jnp.full(shape, metallic),
        roughness=jnp.full(shape, roughness),
        emissive=jnp.zeros((h, w, 3)), valid=jnp.ones(shape, bool),
        depth=jnp.zeros(shape), material_id=jnp.zeros(shape, jnp.int32),
        uv=jnp.zeros((h, w, 2)),
        coat_weight=jnp.zeros(shape), coat_rough=jnp.full(shape, 0.3),
        fuzz_weight=jnp.full(shape, fuzz_w),
        fuzz_rough=jnp.full(shape, fuzz_r))


def _dir_light_row():
    row = np.zeros(16, np.float32)
    row[3] = 0.0                    # directional
    row[4:7] = (0.0, -1.0, 0.0)     # straight down
    row[7] = 1.0                    # intensity
    row[8:11] = 1.0                 # white
    return jnp.asarray(row)


def test_energy_comp_brightens_rough_metal():
    gb = _gbuffer(metallic=1.0, roughness=0.85)
    # Grazing view so single-scatter GGX loses the most energy.
    v = jnp.tile(jnp.asarray([0.95, 0.312, 0.0]), (4, 4, 1))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    row = _dir_light_row()
    base = shade_ops.shade_one_light(gb, row, v, gb.normal)
    comp, fe = shade_ops.openpbr_terms(gb, v, gb.normal, True, False)
    assert fe is None
    lit = shade_ops.shade_one_light(gb, row, v, gb.normal, spec_comp=comp)
    gain = float(jnp.mean(lit) / jnp.maximum(jnp.mean(base), 1e-9))
    assert gain > 1.1, gain          # multiscatter adds real energy
    # Smooth surface: compensation ~ none.
    gb_s = _gbuffer(metallic=1.0, roughness=0.05)
    comp_s, _ = shade_ops.openpbr_terms(gb_s, v, gb_s.normal, True, False)
    base_s = shade_ops.shade_one_light(gb_s, row, v, gb_s.normal)
    lit_s = shade_ops.shade_one_light(gb_s, row, v, gb_s.normal,
                                      spec_comp=comp_s)
    assert float(jnp.mean(lit_s)) < float(jnp.mean(base_s)) * 1.05


def test_fuzz_adds_grazing_rim_and_conserves():
    gb = _gbuffer(metallic=0.0, roughness=0.6, fuzz_w=1.0, fuzz_r=0.4)
    # Rim-light configuration: light AND view both grazing (velvet's
    # signature highlight — the Charlie half-vector sits near the horizon
    # so D_charlie is large while the attenuated base NoL is small).
    row = np.zeros(16, np.float32)
    row[3] = 0.0                               # directional
    d = np.asarray([-0.95, -0.25, 0.0]); d /= np.linalg.norm(d)
    row[4:7] = d
    row[7] = 1.0
    row[8:11] = 1.0
    row = jnp.asarray(row)
    v = jnp.tile(jnp.asarray([0.98, 0.2, 0.0]), (4, 4, 1))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    base = shade_ops.shade_one_light(gb, row, v, gb.normal)
    _, fe = shade_ops.openpbr_terms(gb, v, gb.normal, False, True)
    assert fe is not None and float(fe.max()) <= 1.0
    fuzzed = shade_ops.shade_one_light(gb, row, v, gb.normal, fuzz_e=fe)
    assert float(jnp.mean(fuzzed)) > float(jnp.mean(base))
    # Zero fuzz weight is a no-op.
    gb0 = _gbuffer(fuzz_w=0.0)
    _, fe0 = shade_ops.openpbr_terms(gb0, v, gb0.normal, False, True)
    out0 = shade_ops.shade_one_light(gb0, row, v, gb0.normal, fuzz_e=fe0)
    ref0 = shade_ops.shade_one_light(gb0, row, v, gb0.normal)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=1e-6)


def test_frame_renders_with_openpbr_flags():
    """End-to-end: a frame with fuzz material + energy comp compiles and
    differs from the plain frame."""
    import jax
    from basicrenderer_tpu.graph.frame import build_frame_fn
    from basicrenderer_tpu.graph.framedata import (FrameConfig, FrameParams,
                                                   make_view)
    from basicrenderer_tpu.models import procedural
    from basicrenderer_tpu.models.materials import Material, MaterialRegistry
    from basicrenderer_tpu.models.mesh import MeshRegistry
    from basicrenderer_tpu.scene.bridge import (BridgeCapacities,
                                                SceneRenderBridge)
    from basicrenderer_tpu.scene.scene import Scene

    meshes, mats = MeshRegistry(), MaterialRegistry()
    sphere = meshes.add(procedural.make_uv_sphere(1.0, 12, 18))
    velvet = mats.add(Material(
        base_color=np.asarray([0.6, 0.1, 0.1, 1], np.float32),
        metallic=1.0, roughness=0.8, fuzz_weight=0.8, fuzz_roughness=0.4))
    sc = Scene()
    sc.create_renderable(sphere, velvet)
    sc.create_directional_light(direction=(-0.5, -1, -0.2), intensity=3.0)
    sc.set_camera(position=(0, 0.5, 3.2), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=4, max_materials=4, max_lights=2)
    buffers = SceneRenderBridge(sc, meshes, mats, caps).build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    base_cfg = dict(width=64, height=64, tile_h=16, tile_w=128,
                    max_pairs=1024, use_pallas_raster=False)
    plain = jax.jit(build_frame_fn(FrameConfig(**base_cfg)))(
        buffers, make_view(view, proj, pos), FrameParams.default())
    pbr = jax.jit(build_frame_fn(FrameConfig(
        **base_cfg, enable_fuzz=True, enable_energy_comp=True)))(
        buffers, make_view(view, proj, pos), FrameParams.default())
    a = np.asarray(plain["image"], np.float32)
    b = np.asarray(pbr["image"], np.float32)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 2.0   # visibly different shading

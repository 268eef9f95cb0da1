"""OpenPBR extension lobes: subsurface wrap diffusion, GGX anisotropy,
transmission through the OIT peel (reference: PerMaterialOpenPBRCB,
ShaderBuffers.h:277-334)."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.ops import shade as shade_ops


def _flat(h=2, w=2):
    n = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (h, w, 1))
    albedo = jnp.full((h, w, 3), 0.8, jnp.float32)
    metallic = jnp.zeros((h, w), jnp.float32)
    rough = jnp.full((h, w), 0.5, jnp.float32)
    return n, albedo, metallic, rough


def _unit(v):
    v = jnp.asarray(v, jnp.float32)
    return v / jnp.linalg.norm(v)


def test_sss_softens_terminator():
    """Light just below the horizon: Lambert is black, wrap diffusion is
    not; tinted by the subsurface color."""
    n, albedo, metallic, rough = _flat()
    v = jnp.tile(_unit([0.0, 1.0, 0.3]), (2, 2, 1))
    l = jnp.tile(_unit([1.0, -0.15, 0.0]), (2, 2, 1))    # below horizon
    base = shade_ops.eval_brdf(n, v, l, albedo, metallic, rough)
    sss = (jnp.ones((2, 2)), jnp.tile(jnp.asarray([1.0, 0.3, 0.3]),
                                      (2, 2, 1)), jnp.full((2, 2), 0.6))
    wrapped = shade_ops.eval_brdf(n, v, l, albedo, metallic, rough, sss=sss)
    b, w8 = np.asarray(base), np.asarray(wrapped)
    assert b[0, 0].max() < 1e-5          # hard terminator
    assert w8[0, 0, 0] > 1e-3            # light bleeds past it
    assert w8[0, 0, 0] > w8[0, 0, 1] * 2  # tinted red


def test_sss_white_furnace_conserves():
    """Hemisphere integral of the wrap-diffusion lobe (color=1) matches
    Lambert to ~2% — the (1+w)^2 normalization."""
    n, albedo, metallic, rough = _flat(1, 1)
    v = jnp.tile(_unit([0.0, 1.0, 0.0]), (1, 1, 1))
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(4096, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tot_l = tot_s = 0.0
    sss = (jnp.ones((1, 1)), jnp.ones((1, 1, 3)), jnp.full((1, 1), 0.7))
    for d in dirs:
        l = jnp.asarray(d)[None, None, :]
        # Diffuse-only comparison: metallic 0, kill specular via rough=1
        # and subtracting the shared specular term.
        a = shade_ops.eval_brdf(n, v, l, albedo, metallic, rough)
        b = shade_ops.eval_brdf(n, v, l, albedo, metallic, rough, sss=sss)
        spec_only = shade_ops.eval_brdf(n, v, l, jnp.zeros_like(albedo),
                                        metallic, rough)
        tot_l += float(a[0, 0, 0] - spec_only[0, 0, 0])
        tot_s += float(b[0, 0, 0] - spec_only[0, 0, 0])
    assert abs(tot_s - tot_l) / max(tot_l, 1e-9) < 0.03


def test_aniso_elongates_highlight():
    """Half-vector offsets along the tangent vs the bitangent: isotropic
    GGX treats them identically; anisotropic GGX (ax > ay) passes more
    energy along the tangent. Rotating the frame 90 degrees swaps it."""
    n, albedo, metallic, rough = _flat()
    rough = jnp.full((2, 2), 0.4, jnp.float32)
    metallic = jnp.ones((2, 2), jnp.float32)
    v = jnp.tile(_unit([0.0, 1.0, 0.0]), (2, 2, 1))
    l_t = jnp.tile(_unit([0.5, 1.0, 0.0]), (2, 2, 1))   # offset along T(x)
    l_b = jnp.tile(_unit([0.0, 1.0, 0.5]), (2, 2, 1))   # offset along B(z)
    T = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (2, 2, 1))
    B = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (2, 2, 1))
    iso_t = shade_ops.eval_brdf(n, v, l_t, albedo, metallic, rough)
    iso_b = shade_ops.eval_brdf(n, v, l_b, albedo, metallic, rough)
    np.testing.assert_allclose(np.asarray(iso_t), np.asarray(iso_b),
                               rtol=1e-5)
    an = (T, B, jnp.full((2, 2), 0.8))
    a_t = shade_ops.eval_brdf(n, v, l_t, albedo, metallic, rough, aniso=an)
    a_b = shade_ops.eval_brdf(n, v, l_b, albedo, metallic, rough, aniso=an)
    assert float(a_t.mean()) > float(a_b.mean()) * 1.5
    an_swap = (B, -T, jnp.full((2, 2), 0.8))             # rotated 90 deg
    s_t = shade_ops.eval_brdf(n, v, l_t, albedo, metallic, rough,
                              aniso=an_swap)
    s_b = shade_ops.eval_brdf(n, v, l_b, albedo, metallic, rough,
                              aniso=an_swap)
    assert float(s_b.mean()) > float(s_t.mean()) * 1.5


def test_aniso_zero_strength_matches_iso():
    n, albedo, metallic, rough = _flat()
    v = jnp.tile(_unit([0.3, 1.0, 0.1]), (2, 2, 1))
    l = jnp.tile(_unit([0.4, 1.0, -0.2]), (2, 2, 1))
    T = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (2, 2, 1))
    B = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (2, 2, 1))
    iso = shade_ops.eval_brdf(n, v, l, albedo, metallic, rough)
    an = shade_ops.eval_brdf(n, v, l, albedo, metallic, rough,
                             aniso=(T, B, jnp.zeros((2, 2))))
    np.testing.assert_allclose(np.asarray(an), np.asarray(iso), rtol=1e-3,
                               atol=1e-5)


def _glass_scene(color, tw=1.0):
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    plane = meshes.add(procedural.make_plane(8.0, 1))
    white = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                              roughness=1.0))
    glass = mats.add(Material(
        base_color=np.array([1, 1, 1, 1], np.float32), roughness=0.05,
        transmission_weight=tw,
        transmission_color=np.asarray(color, np.float32)))
    sc = Scene()
    import basicrenderer_tpu.utils.math3d as m3
    q = np.asarray(m3.quat_from_axis_angle([1, 0, 0], np.pi / 2))
    sc.create_renderable(plane, white, position=(0, 0, -2), rotation=q)
    sc.create_renderable(plane, glass, position=(0, 0, 0), rotation=q,
                         scale=(0.4, 1, 0.4))
    sc.create_directional_light(direction=(0, -0.3, -1), intensity=3.0)
    sc.set_camera(position=(0, 0, 5), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 8, max_triangles=1 << 8,
                            max_objects=8, max_materials=8, max_lights=4,
                            max_clusters=64)
    return sc, SceneRenderBridge(sc, meshes, mats, caps)


def _render_glass(color, transmission=True, tw=1.0):
    sc, bridge = _glass_scene(color, tw)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 11, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=64,
                      enable_oit=True, oit_layers=2,
                      enable_transmission=transmission)
    out = jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())
    return np.asarray(out["hdr"])


def test_transmission_tints_background():
    """Green glass in front of a white floor: the through-glass pixels are
    green-tinted versions of the floor, not alpha-blended surface color."""
    img = _render_glass([0.15, 1.0, 0.15])
    through = img[64, 64]
    floor = img[64, 8]              # outside the glass quad
    assert through[1] > through[0] * 2.5     # strongly green
    # Clear glass passes nearly everything.
    clear = _render_glass([1.0, 1.0, 1.0])
    ratio = clear[64, 64] / np.maximum(img[64, 8], 1e-6)
    assert ratio.min() > 0.7
    # With the transmission lobe disabled the same material alpha-composites
    # (base alpha 1 => opaque surface): no background tint survives.
    off = _render_glass([0.15, 1.0, 0.15], transmission=False)
    assert off[64, 64][1] < through[1] * 0.9 or \
        abs(off[64, 64][0] - off[64, 64][1]) < 0.05


def test_gltf_openpbr_extensions_import(tmp_path):
    """KHR transmission/volume/anisotropy/ior/clearcoat/sheen factors land
    in the packed material."""
    import json
    from basicrenderer_tpu.models import importers
    from basicrenderer_tpu.models.animation import SkeletonRegistry
    tri = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1]},
            "extensions": {
                "KHR_materials_transmission": {"transmissionFactor": 0.9},
                "KHR_materials_volume": {
                    "attenuationColor": [0.2, 0.9, 0.3],
                    "attenuationDistance": 0.25},
                "KHR_materials_anisotropy": {
                    "anisotropyStrength": 0.7, "anisotropyRotation": 1.1},
                "KHR_materials_ior": {"ior": 1.31},
                "KHR_materials_clearcoat": {
                    "clearcoatFactor": 0.8,
                    "clearcoatRoughnessFactor": 0.2},
                "KHR_materials_sheen": {
                    "sheenColorFactor": [0.5, 0.4, 0.3],
                    "sheenRoughnessFactor": 0.6},
            }}],
        "accessors": [{"bufferView": 0, "componentType": 5126, "count": 3,
                       "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36}],
        "buffers": [{"byteLength": 36, "uri": "tri.bin"}],
    }
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    (tmp_path / "tri.bin").write_bytes(verts.tobytes())
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(tri))
    sc = Scene()
    meshes, mats = MeshRegistry(), MaterialRegistry()
    importers.load_model(str(p), sc, meshes, mats, SkeletonRegistry())
    m = mats.materials[-1]
    assert m.transmission_weight == 0.9
    np.testing.assert_allclose(m.transmission_color, [0.2, 0.9, 0.3])
    assert m.transmission_depth == 0.25
    assert m.anisotropy_strength == 0.7 and m.anisotropy_rotation == 1.1
    assert m.ior == 1.31
    assert m.coat_weight == 0.8 and m.coat_roughness == 0.2
    np.testing.assert_allclose(m.sheen_color, [0.5, 0.4, 0.3])
    row = m.pack()
    assert row[30] == np.float32(0.9) and row[40] == np.float32(0.5)
    assert row[41] == np.float32(0.7)

"""Texture registry + atlas sampling + frame integration."""

import numpy as np
import jax
import jax.numpy as jnp

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.models.textures import TextureRegistry
from basicrenderer_tpu.ops.textures import sample_layered_atlas
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def test_registry_and_atlas():
    reg = TextureRegistry(resolution=64)
    tid = reg.checkerboard(squares=4)
    t2 = reg.add(np.full((32, 48, 3), 128, np.uint8))
    a0, a1 = reg.atlas()
    assert a0.shape == (2, 64, 64, 4)
    assert a1.shape == (2, 32, 32, 4)
    # sRGB decode: 128/255 -> ~0.216 linear
    assert abs(a0[t2, 0, 0, 0] - 0.216) < 0.01


def test_sample_layered_atlas_checker():
    reg = TextureRegistry(resolution=64)
    tid = reg.checkerboard(a=(1, 0, 0), b=(0, 0, 1), squares=2)
    _, a1 = reg.atlas()
    H = W = 32
    tex_id = jnp.full((H, W), tid, jnp.int32)
    u = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5) / W
    v = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5) / H
    uv = jnp.stack([u, v], -1)
    out = np.asarray(sample_layered_atlas(jnp.asarray(a1), tex_id, uv,
                                          downscale=1))
    # quadrants: (0,0)=red, (1,0)... checker 2x2: top-left red.
    assert out[4, 4, 0] > 0.9 and out[4, 4, 2] < 0.1
    assert out[4, 28, 2] > 0.9 and out[4, 28, 0] < 0.1
    # id -1 -> white
    out2 = np.asarray(sample_layered_atlas(
        jnp.asarray(a1), jnp.full((H, W), -1, jnp.int32), uv, 1))
    assert (out2 == 1.0).all()


def test_textured_frame():
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard(a=(1, 1, 1), b=(0.05, 0.05, 0.05), squares=8)
    plane = meshes.add(procedural.make_plane(8.0, 1))
    m = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                          roughness=0.9, base_color_texture=checker))
    sc = Scene()
    sc.create_renderable(plane, m)
    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0, 6, 0.1), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=4,
                            max_materials=4, max_lights=2, max_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=256, use_pallas_raster=False,
                      enable_textures=True, texture_downscale=1)
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32)
    vis = np.asarray(out["vis"])
    cov = vis > 0
    assert cov.mean() > 0.5
    # Checkerboard visible: covered pixels split into bright + dark modes.
    lum = img[..., 0][cov]
    bright = (lum > lum.mean()).mean()
    assert 0.2 < bright < 0.8
    assert lum.std() > 25


def test_normal_mapping_perturbs_shading():
    """A bumpy normal map on a flat plane must modulate lighting where a
    flat normal would shade uniformly."""
    import jax.numpy as jnp
    from basicrenderer_tpu.ops.textures import apply_normal_map

    reg = TextureRegistry(resolution=64)
    # Normal map: stripes tilting left/right in tangent space.
    r = 64
    xs = np.arange(r)
    tilt = np.where((xs // 8) % 2 == 0, 0.35, -0.35)
    nm = np.zeros((r, r, 3), np.float32)
    nm[..., 0] = tilt[None, :]
    nm[..., 2] = np.sqrt(1 - tilt[None, :] ** 2)
    tid = reg.add(nm * 0.5 + 0.5, srgb=False)
    _, a1 = reg.atlas()

    H = W = 32
    normal = jnp.zeros((H, W, 3), jnp.float32).at[..., 1].set(1.0)  # flat up
    u = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5) / W
    v = (jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5) / H
    uv = jnp.stack([u, v], -1)
    # World pos: XZ plane spanning [0,8]^2, y=0 — consistent with uv.
    wp = jnp.stack([u * 8.0, jnp.zeros((H, W)), v * 8.0], -1)
    ntex = jnp.full((H, W), tid, jnp.int32)
    out = np.asarray(apply_normal_map(normal, wp, uv, jnp.asarray(a1),
                                      ntex, downscale=1))
    # Normals tilt in +-X alternating; y stays dominant.
    assert out[16, 2:30, 0].std() > 0.1
    assert (out[..., 1] > 0.8).mean() > 0.9
    # id -1 leaves normals unchanged.
    out2 = np.asarray(apply_normal_map(normal, wp, uv, jnp.asarray(a1),
                                       jnp.full((H, W), -1, jnp.int32), 1))
    np.testing.assert_allclose(out2, np.asarray(normal), atol=1e-6)

"""Importers: generate a glTF + an OBJ in-test, load, and render."""

import base64
import json
import os

import numpy as np
import jax
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models.animation import SkeletonRegistry
from basicrenderer_tpu.models.importers import load_model
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def _write_triangle_gltf(path):
    """A red triangle with TRS node + material factors."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + nrm.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0.5, 0, 0],
                   "name": "tri"}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"name": "red", "pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.1, 0.1, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.9}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
    }
    with open(path, "w") as f:
        json.dump(gltf, f)


def test_gltf_loads_and_renders(tmp_path):
    p = str(tmp_path / "tri.gltf")
    _write_triangle_gltf(p)
    meshes, mats = MeshRegistry(), MaterialRegistry()
    sc = Scene()
    out = load_model(p, sc, meshes, mats, SkeletonRegistry())
    assert len(meshes) == 1
    assert len(mats) == 2           # default + red
    m = mats.get(1)
    assert abs(m.base_color[0] - 0.9) < 1e-6 and m.roughness == 0.9

    sc.create_directional_light(direction=(0, 0, -1), intensity=3.0)
    sc.set_camera(position=(0.5, 0.3, 3), target=(0.5, 0.3, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=4,
                            max_materials=4, max_lights=2, max_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=256, use_pallas_raster=False)
    outf = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                        FrameParams.default())
    img = np.asarray(outf["image"])
    vis = np.asarray(outf["vis"])
    assert (vis > 0).any()
    red = img[vis > 0]
    assert red[:, 0].mean() > red[:, 2].mean() * 1.5  # it's red


def test_obj_loads(tmp_path):
    p = str(tmp_path / "quad.obj")
    with open(p, "w") as f:
        f.write("""v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
""")
    meshes, mats = MeshRegistry(), MaterialRegistry()
    sc = Scene()
    load_model(p, sc, meshes, mats)
    mesh = meshes.get(0)
    assert mesh.num_triangles == 2   # quad fan-triangulated
    assert np.allclose(mesh.normals[:, 2], 1.0)


def test_unknown_format_raises(tmp_path):
    p = str(tmp_path / "x.xyz123")
    open(p, "w").write("")
    with pytest.raises(ValueError, match="unsupported"):
        load_model(p, Scene(), MeshRegistry(), MaterialRegistry())


def _write_textured_gltf(path):
    """A quad with UVs + an embedded PNG base-color texture (data URI)."""
    from io import BytesIO
    from PIL import Image
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = (255, 0, 0)
    img[:, 4:] = (0, 0, 255)
    buf = BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png_uri = ("data:image/png;base64,"
               + base64.b64encode(buf.getvalue()).decode())
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = pos.tobytes() + uv.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}}}],
        "textures": [{"source": 0}],
        "images": [{"uri": png_uri}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
    }
    with open(path, "w") as f:
        json.dump(gltf, f)


def test_gltf_decodes_texture_images(tmp_path):
    from basicrenderer_tpu.models.textures import TextureRegistry
    p = str(tmp_path / "texquad.gltf")
    _write_textured_gltf(p)
    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=8)
    sc = Scene()
    load_model(p, sc, meshes, mats, textures=tex)
    assert len(tex) == 1
    m = mats.get(1)  # id 0 = default
    assert m.base_color_texture == 0
    assert tex.srgb[0] is True
    # Decoded image: left half red, right half blue (linearized).
    img = tex.images[0]
    assert img[4, 1, 0] > 0.9 and img[4, 1, 2] < 0.1
    assert img[4, 6, 2] > 0.9 and img[4, 6, 0] < 0.1

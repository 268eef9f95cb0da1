"""Minimal USD (.usda) importer (reference: USDLoader.cpp)."""

import numpy as np
import jax

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models.importers import load_model
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene

USDA = '''#usda 1.0
(
    defaultPrim = "World"
    metersPerUnit = 1
)

def Xform "World"
{
    def Material "Red"
    {
        def Shader "pbr"
        {
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:diffuseColor = (0.9, 0.1, 0.1)
            float inputs:metallic = 0.0
            float inputs:roughness = 0.4
        }
    }

    def Xform "quadX"
    {
        double3 xformOp:translate = (0.5, 0, 0)
        uniform token[] xformOpOrder = ["xformOp:translate"]

        def Mesh "quad"
        {
            point3f[] points = [(-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)]
            int[] faceVertexIndices = [0, 2, 1, 0, 3, 2]
            int[] faceVertexCounts = [3, 3]
            texCoord2f[] primvars:st = [(0, 0), (1, 0), (1, 1), (0, 1)]
            rel material:binding = </World/Red>
        }
    }
}
'''


def test_usda_loads_and_renders(tmp_path):
    p = tmp_path / "scene.usda"
    p.write_text(USDA)
    meshes, mats = MeshRegistry(), MaterialRegistry()
    sc = Scene()
    load_model(str(p), sc, meshes, mats)
    assert len(meshes) == 1
    mesh = meshes.get(0)
    assert mesh.num_triangles == 2
    assert mesh.num_vertices == 4
    # Material resolved through the binding path.
    assert len(mats) == 2
    m = mats.get(1)
    assert abs(m.base_color[0] - 0.9) < 1e-5
    assert abs(m.roughness - 0.4) < 1e-5

    sc.create_directional_light(direction=(0, -1, 0), intensity=3.0)
    sc.set_camera(position=(0.5, 4, 0.1), target=(0.5, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=64, max_triangles=64, max_objects=8,
                            max_materials=4, max_lights=2, max_clusters=8,
                            max_geom_clusters=8)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=64, height=64, tile_h=16, tile_w=128,
                      max_pairs=256, use_pallas_raster=False)
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    img = np.asarray(out["image"]).astype(np.float32)
    vis = np.asarray(out["vis"])
    assert (vis > 0).mean() > 0.15
    px = img[vis > 0]
    assert px[:, 0].mean() > px[:, 2].mean() + 20   # the red material

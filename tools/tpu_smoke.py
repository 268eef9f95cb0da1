"""On-TPU Mosaic smoke test: pixel parity of the production Pallas raster
against the pure-jnp twin at small resolution.

Closes the CI blind spot where the real Mosaic lowering is only ever
exercised by bench.py timing (interpret-mode tests run the same kernel
code but not the Mosaic compiler): an OOB-DMA-class regression (`TPU
backend error (Internal)`) or a lowering miscompile would otherwise ship
green. Run standalone (`python tools/tpu_smoke.py`) or via bench.py, which
appends the result to its JSON line.

Reference analogue: the reference validates its SW raster against the HW
path (softwareRaster.hlsl vs mesh-shader raster parity debugging).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def run_smoke(width: int = 256, height: int = 256) -> dict:
    """Returns {'mosaic_ok': bool, 'depth_max_err': float, 'vis_mismatch':
    int, 'image_max_err': int} comparing Pallas vs jnp twin frames."""
    import jax
    import jax.numpy as jnp
    from basicrenderer_tpu.graph.framedata import (FrameConfig, FrameParams,
                                                   make_view)
    from basicrenderer_tpu.graph.frame import build_frame_fn
    from basicrenderer_tpu.models import procedural
    from basicrenderer_tpu.models import clusters
    from basicrenderer_tpu.models.materials import Material, MaterialRegistry
    from basicrenderer_tpu.models.mesh import MeshRegistry
    from basicrenderer_tpu.models.textures import TextureRegistry
    from basicrenderer_tpu.scene.bridge import (BridgeCapacities,
                                                SceneRenderBridge)
    from basicrenderer_tpu.scene.scene import Scene

    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=64)
    checker = tex.checkerboard(a=(1, 1, 1), b=(0.1, 0.1, 0.1), squares=8)
    sphere = meshes.add(clusters.to_mesh_data(clusters.build_cluster_lod(
        procedural.make_uv_sphere(1.0, rings=24, sectors=48))))
    plane = meshes.add(procedural.make_plane(6.0, 2))
    m0 = mats.add(Material(base_color=np.array([0.9, 0.6, 0.3, 1],
                                               np.float32), roughness=0.4,
                           base_color_texture=checker))
    sc = Scene()
    sc.create_renderable(plane, 0)
    sc.create_renderable(sphere, m0, position=(0, 0.8, 0))
    sc.create_directional_light(direction=(-0.4, -1, -0.3), intensity=3.0)
    sc.set_camera(position=(2.2, 1.6, 2.6), target=(0, 0.5, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 15, max_triangles=1 << 15,
                            max_objects=8, max_materials=4, max_lights=4,
                            max_clusters=1 << 10, max_geom_clusters=1 << 10)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    base = FrameConfig(width=width, height=height, tile_h=32, tile_w=128,
                       max_pairs=1 << 14, enable_clod=True,
                       enable_textures=True, texture_downscale=1,
                       use_pallas_raster=True)
    params = FrameParams.default()
    out_p = jax.jit(build_frame_fn(base))(buffers, vd, params)
    twin = dataclasses.replace(base, use_pallas_raster=False)
    out_t = jax.jit(build_frame_fn(twin))(buffers, vd, params)
    d_err = float(jnp.abs(out_p["depth_padded"]
                          - out_t["depth_padded"]).max())
    img_err = int(jnp.abs(out_p["image"].astype(jnp.int32)
                          - out_t["image"].astype(jnp.int32)).max())
    res = {"mosaic_ok": bool(d_err == 0.0 and img_err <= 1),
           "depth_max_err": d_err, "image_max_err": img_err}
    return res


if __name__ == "__main__":
    import json
    print(json.dumps(run_smoke()))

"""Benchmark matrix: steady-state ms/frame at 1920x1080 on one TPU chip
across the BASELINE.md-style configs, on a Bistro-class scene.

Prints ONE JSON line. `value` is the FULL config (every subsystem on) —
the honest headline; per-config rows ride in `matrix`.
vs_baseline = 16.0 / value (>1 = faster than the 16 ms target).

Scene: dense procedural courtyard (models/scenes.py) — ~2.4M source
triangles (Bistro-class; the reference's demo content is not
redistributable), 1000 dynamic point lights, textured + normal-mapped
materials, cluster-LOD DAGs on every curved mesh.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

BASELINE_MS = 16.0


def main() -> None:
    import jax
    from basicrenderer_tpu.graph.frame import build_frame_fn
    from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
    from basicrenderer_tpu.models.scenes import build_courtyard
    from basicrenderer_tpu.models.textures import TextureRegistry
    from basicrenderer_tpu.ops import vsm as vsm_ops
    from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge

    width, height = 1920, 1080
    tex = TextureRegistry(resolution=256)
    built = build_courtyard(grid=14, lod=True, dense=True, textures=tex,
                            num_point_lights=1000)
    caps = BridgeCapacities(max_vertices=1 << 21, max_triangles=1 << 21,
                            max_objects=512, max_materials=64,
                            max_lights=1024 + 8, max_clusters=1 << 15)
    bridge = SceneRenderBridge(built.scene, built.meshes, built.materials,
                               caps, textures=tex)
    buffers = bridge.build_scene_buffers()
    view_np, proj_np, cam = built.scene.camera_matrices(aspect=width / height)
    vd = make_view(view_np, proj_np, cam)
    params = FrameParams.default()

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    # All rows shade the 1000-light field through the tiled clustered pass
    # (the non-clustered loop is O(lights) per pixel — not a usable path at
    # this light count, and the reference always runs clustered too).
    base = FrameConfig(width=width, height=height, tile_h=32, tile_w=128,
                       max_pairs=1 << 18, max_tiles_per_tri=8,
                       enable_clod=True, max_visible_clusters=2048,
                       max_phase2_clusters=256, shadow_clusters=512,
                       enable_clustered=True, use_pallas_raster=on_tpu)

    configs = {
        "config1_minimal": base,
        "config2_manylight": dataclasses.replace(
            base, enable_ibl=True,
            enable_textures=True, tex_channels=("base", "normal", "mr")),
        "config3_shadows": dataclasses.replace(
            base, enable_vsm=True, enable_occlusion=True),
        "config4_post": dataclasses.replace(
            base, enable_gtao=True, enable_bloom=True, enable_taa=True,
            enable_auto_exposure=True, enable_ssr=True),
        "full": dataclasses.replace(
            base, enable_ibl=True,
            enable_textures=True, tex_channels=("base", "normal", "mr"),
            enable_vsm=True, enable_occlusion=True, enable_gtao=True,
            enable_bloom=True, enable_taa=True, enable_auto_exposure=True,
            enable_ssr=True),
    }

    matrix = {}
    counters = {}
    for name, cfg in configs.items():
        frame = jax.jit(build_frame_fn(cfg))

        def call(state):
            kwargs = {}
            if cfg.enable_occlusion or cfg.enable_taa:
                kwargs["prev_depth"] = state.get("prev_depth")
            if cfg.enable_taa:
                kwargs["taa_history"] = state.get("taa_history")
            if cfg.enable_vsm:
                kwargs["vsm_state"] = state.get("vsm_state")
            if "prev_depth" in kwargs and kwargs["prev_depth"] is None:
                import jax.numpy as jnp
                kwargs["prev_depth"] = jnp.zeros(
                    (cfg.padded_height, cfg.padded_width), jnp.float32)
            out = frame(buffers, vd, params, **kwargs)
            if cfg.enable_occlusion or cfg.enable_taa:
                state["prev_depth"] = out["depth_padded"]
            if cfg.enable_taa:
                state["taa_history"] = out["taa_out"]
            if cfg.enable_vsm:
                state["vsm_state"] = out["vsm_state"]
            return out

        state = {}
        if cfg.enable_vsm:
            state["vsm_state"] = vsm_ops.init_state()
        out = call(state)
        np.asarray(out["image"][0, 0])          # compile + warmup
        for _ in range(24):                     # converge caches (VSM, TAA)
            out = call(state)
        np.asarray(out["image"][0, 0])
        counters[name] = {
            "bin_overflow": int(out["bin_overflow"]),
            "cluster_overflow": int(out["cluster_overflow"]),
            "num_pairs": int(out["num_pairs"]),
        }

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = call(state)
            np.asarray(o["image"][0, 0])
            return time.perf_counter() - t0

        iters = 15
        run(3)
        t1 = run(iters)
        t2 = run(iters * 2)
        matrix[name] = round((t2 - t1) / iters * 1000.0, 2)
        print(f"# {name}: {matrix[name]} ms {counters[name]}",
              file=sys.stderr, flush=True)

    ms = matrix["full"]
    print(json.dumps({
        "metric": "ms/frame 1080p dense courtyard FULL config (clod+occlusion"
                  "+1k clustered lights+VSM+IBL+textures+GTAO+bloom+TAA+"
                  f"auto-exposure; {built.num_triangles} source tris)",
        "value": ms,
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 4),
        "matrix": matrix,
        "counters": counters,
    }))


if __name__ == "__main__":
    sys.exit(main())

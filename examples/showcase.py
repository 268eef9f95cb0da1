"""Render the five BASELINE.json configs to PNGs + print timings.

Usage: python examples/showcase.py [outdir] [--small]
(--small renders at 640x360 for quick CPU checks; default 1920x1080.)
`--serve [port]` instead starts a LIVE renderer behind the headless UI
(utils/ui_server.py — the reference Menu.h analogue): open the printed URL
to flip settings (structural ones recompile on the next frame), switch
debug views, and watch telemetry; a telemetry JSON dump is written on exit.

Scene stand-ins are procedural (the reference's Bistro/San Miguel/Zorah
content is not redistributable); each config exercises the same feature set
as its BASELINE.json counterpart.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicrenderer_tpu.models import clusters, procedural
from basicrenderer_tpu.models.materials import Material
from basicrenderer_tpu.models.scenes import build_courtyard
from basicrenderer_tpu.renderer import Renderer
from basicrenderer_tpu.scene.bridge import BridgeCapacities


def save(r, name, outdir):
    r.update()
    t0 = time.perf_counter()
    img = r.render_to_numpy()
    dt = (time.perf_counter() - t0) * 1e3
    import imageio.v3 as iio
    path = os.path.join(outdir, f"{name}.png")
    iio.imwrite(path, img)
    print(f"{name}: {img.shape[1]}x{img.shape[0]} "
          f"first-frame {dt:.0f} ms (includes compile) -> {path}", flush=True)


def base_renderer(res, lights_cap=1024):
    r = Renderer(caps=BridgeCapacities(
        max_vertices=1 << 18, max_triangles=1 << 18, max_objects=512,
        max_materials=64, max_lights=lights_cap, max_clusters=1 << 17))
    r.settings.set("renderResolution", res)
    r.settings.set("maxTrianglePairs", 1 << 17)
    # Feature defaults off; each config turns on what it needs.
    for k in ("enableShadows", "enableClusteredLighting", "enableIBL",
              "enableBloom", "enableGTAO", "enableTAA", "enableOIT",
              "enableAutoExposure"):
        r.settings.set(k, False)
    return r


def serve(port: int = 0):
    """Live mode: courtyard scene + headless settings/telemetry UI."""
    from basicrenderer_tpu.utils.ui_server import UIServer
    r = base_renderer((640, 360))
    built = build_courtyard(grid=6, lod=True, meshes=r.meshes,
                            materials=r.materials, textures=r.textures)
    built.scene.propagate_transforms()
    r.settings.set("enableBloom", True)
    r.settings.set("enableClusteredLighting", True)
    r.set_current_scene(built.scene)
    ui = UIServer(r, port=port).start()
    print(f"live UI at {ui.url} — ctrl-C to stop", flush=True)
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        pass
    finally:
        r.telemetry.dump_json("/tmp/showcase_telemetry.json")
        print("telemetry dumped to /tmp/showcase_telemetry.json", flush=True)
        ui.stop()


def main():
    if "--serve" in sys.argv:
        i = sys.argv.index("--serve")
        port = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 0
        return serve(port)
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "/tmp/showcase"
    small = "--small" in sys.argv
    res = (640, 360) if small else (1920, 1080)
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)

    # Config 1 — Forward+: 1 directional light, GGX PBR, no shadows/post.
    built = build_courtyard(grid=10)
    r = base_renderer(res)
    r.meshes, r.materials = built.meshes, built.materials
    r.set_current_scene(built.scene)
    save(r, "config1_forward", outdir)

    # Config 2 — Deferred + tiled lighting (1k point/spot) + IBL.
    built = build_courtyard(grid=10)
    sc = built.scene
    for i in range(1000):
        p = rng.uniform(-11, 11, 3); p[1] = rng.uniform(0.5, 3)
        col = rng.uniform(0.2, 1.0, 3)
        if i % 4 == 0:
            sc.create_spot_light(position=p, direction=(0, -1, 0), color=col,
                                 intensity=8.0, range=rng.uniform(2, 5))
        else:
            sc.create_point_light(position=p, color=col, intensity=6.0,
                                  range=rng.uniform(1.5, 4))
    sc.propagate_transforms()
    r = base_renderer(res)
    r.meshes, r.materials = built.meshes, built.materials
    r.settings.set("enableClusteredLighting", True)
    r.set_current_scene(sc)
    r.set_environment("procedural")
    save(r, "config2_deferred_1klights_ibl", outdir)

    # Config 3 — cascaded shadows + two-phase HZB occlusion culling.
    built = build_courtyard(grid=10)
    r = base_renderer(res)
    r.meshes, r.materials = built.meshes, built.materials
    r.settings.set("enableShadows", True)
    r.settings.set("numShadowCascades", 3)
    r.settings.set("shadowResolution", 1024)
    r.settings.set("enableOcclusionCulling", True)
    r.set_current_scene(built.scene)
    save(r, "config3_shadows_occlusion", outdir)

    # Config 4 — visibility-buffer virtualized geometry (cluster-LOD).
    sphere_lod = clusters.build_cluster_lod(
        procedural.make_uv_sphere(0.5, rings=64, sectors=128))
    torus_lod = clusters.build_cluster_lod(
        procedural.make_torus(0.5, 0.2, rings=64, sides=48))
    r = base_renderer(res)
    ms = r.meshes.add(clusters.to_mesh_data(sphere_lod))
    mt = r.meshes.add(clusters.to_mesh_data(torus_lod))
    terrain = r.meshes.add(procedural.make_fractal_terrain(120.0, 96, 3.0))
    gray = r.materials.add(Material(base_color=np.array([.55, .52, .5, 1], np.float32),
                                    roughness=.9))
    mats = [r.materials.add(Material(
        base_color=np.array([*rng.uniform(0.3, 0.9, 3), 1], np.float32),
        roughness=float(rng.uniform(0.3, 0.8)))) for _ in range(8)]
    from basicrenderer_tpu.scene.scene import Scene
    sc = Scene()
    sc.create_renderable(terrain, gray)
    for i in range(20):
        for j in range(20):
            sc.create_renderable(ms if (i + j) % 2 else mt, mats[(i * 3 + j) % 8],
                                 position=((i - 10) * 3.0, 0.6, (j - 10) * 3.0))
    sc.create_directional_light(direction=(-.4, -1, -.3), intensity=3.0)
    sc.set_camera(position=(12, 6, 18), target=(0, 0, 0), aspect=res[0] / res[1])
    sc.propagate_transforms()
    r.set_current_scene(sc)
    r.set_environment("procedural")
    save(r, "config4_virtualized_geometry", outdir)

    # Config 5 — full frame: OIT + GTAO + bloom + TAA + auto-exposure +
    # shadows + tiled lights + IBL.
    built = build_courtyard(grid=10)
    glass = built.materials.add(Material(
        base_color=np.array([0.2, 0.6, 0.9, 0.4], np.float32),
        alpha_blend=True, roughness=0.2))
    pane = built.meshes.add(procedural.make_plane(6.0, 1))
    import basicrenderer_tpu.utils.math3d as m3
    q = np.asarray(m3.quat_from_axis_angle([1, 0, 0], np.pi / 2))
    built.scene.create_renderable(pane, glass, position=(0, 2.0, 6.0), rotation=q)
    built.scene.propagate_transforms()
    r = base_renderer(res)
    r.meshes, r.materials = built.meshes, built.materials
    for k in ("enableShadows", "enableClusteredLighting", "enableBloom",
              "enableGTAO", "enableTAA", "enableOIT", "enableAutoExposure"):
        r.settings.set(k, True)
    r.settings.set("numShadowCascades", 3)
    r.set_current_scene(built.scene)
    r.set_environment("procedural")
    save(r, "config5_full", outdir)
    # A few extra frames so TAA accumulates.
    for _ in range(4):
        r.update()
        img = r.render_to_numpy()
    import imageio.v3 as iio
    iio.imwrite(os.path.join(outdir, "config5_full_taa.png"), img)
    print("config5 TAA-converged frame saved", flush=True)

    # Config 6 (round 2) — VSM + SSR + textures + streaming + a
    # shadow-casting spot light.
    r = base_renderer(res)
    built = build_courtyard(grid=10, lod=True, meshes=r.meshes,
                            materials=r.materials, textures=r.textures)
    built.scene.create_spot_light(
        position=(4, 7, 4), direction=(-0.4, -1, -0.4), intensity=120.0,
        range=24.0, inner_cone=0.4, outer_cone=0.8, cast_shadows=True)
    built.scene.propagate_transforms()
    r.settings.set("enableVSM", True)
    r.settings.set("enableSSR", True)
    r.settings.set("enableClusteredLighting", True)
    r.settings.set("enableStreaming", True)
    r.settings.set("streamingSlots", 2048)
    r.set_current_scene(built.scene)
    for _ in range(12):   # stream pages in + converge VSM
        r.update()
        img = r.render_to_numpy()
    iio.imwrite(os.path.join(outdir, "config6_vsm_ssr_streaming.png"), img)
    print(f"config6 saved (streamed {r._streamer.loads} pages, "
          f"{r._streamer.resident_groups} groups resident)", flush=True)


if __name__ == "__main__":
    main()

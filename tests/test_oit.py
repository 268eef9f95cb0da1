"""OIT: K-layer depth peeling composite ordering + integration."""

import numpy as np
import jax

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene


def build_oit_scene():
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    plane = meshes.add(procedural.make_plane(8.0, 1))
    white = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                              roughness=1.0))
    red_glass = mats.add(Material(
        base_color=np.array([1, 0, 0, 0.5], np.float32), alpha_blend=True,
        unlit=False, roughness=0.5))
    blue_glass = mats.add(Material(
        base_color=np.array([0, 0, 1, 0.5], np.float32), alpha_blend=True,
        roughness=0.5))
    sc = Scene()
    # Floor facing the camera (+Y plane rotated to face +Z).
    import basicrenderer_tpu.utils.math3d as m3
    q = np.asarray(m3.quat_from_axis_angle([1, 0, 0], np.pi / 2))
    sc.create_renderable(plane, white, position=(0, 0, -2), rotation=q)
    sc.create_renderable(plane, red_glass, position=(0, 0, 0), rotation=q,
                         scale=(0.4, 1, 0.4))
    sc.create_renderable(plane, blue_glass, position=(0, 0, 1), rotation=q,
                         scale=(0.25, 1, 0.25))
    sc.create_directional_light(direction=(0, -0.3, -1), intensity=3.0)
    sc.set_camera(position=(0, 0, 5), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 8, max_triangles=1 << 8,
                            max_objects=8, max_materials=8, max_lights=4,
                            max_clusters=64)
    return sc, SceneRenderBridge(sc, meshes, mats, caps)


def _render(oit):
    sc, bridge = build_oit_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 11, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=64,
                      enable_oit=oit, oit_layers=4)
    return jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())


def test_oit_blends_two_layers():
    out = _render(True)
    img = np.asarray(out["hdr"])
    # Center: white floor + red glass + blue glass stacked.
    center = img[64, 64]
    # Both glasses contribute: red and blue present, not fully opaque.
    assert center[0] > 0.05 and center[2] > 0.05
    # Ring covered only by the red glass (scale 0.4 vs 0.25).
    mid = img[64, 34]
    assert mid[0] > mid[2] * 1.5  # predominantly red there

    # Without OIT the transparent quads draw opaque (alpha ignored):
    out2 = _render(False)
    img2 = np.asarray(out2["hdr"])
    center2 = img2[64, 64]
    # Nearest (blue) quad wins the depth test; no red contribution.
    assert center2[2] > center2[0] * 2


def _glass_stack(n_layers, alpha=0.4):
    """n parallel glass quads in front of a white floor."""
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    plane = meshes.add(procedural.make_plane(8.0, 1))
    white = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                              roughness=1.0))
    glass = mats.add(Material(
        base_color=np.array([0.2, 0.9, 0.3, alpha], np.float32),
        alpha_blend=True, roughness=0.5))
    sc = Scene()
    import basicrenderer_tpu.utils.math3d as m3
    q = np.asarray(m3.quat_from_axis_angle([1, 0, 0], np.pi / 2))
    sc.create_renderable(plane, white, position=(0, 0, -2), rotation=q)
    for k in range(n_layers):
        sc.create_renderable(plane, glass, position=(0, 0, -1 + 0.2 * k),
                             rotation=q, scale=(0.4, 1, 0.4))
    sc.create_directional_light(direction=(0, -0.3, -1), intensity=3.0)
    sc.set_camera(position=(0, 0, 5), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 9, max_triangles=1 << 9,
                            max_objects=16, max_materials=8, max_lights=4,
                            max_clusters=64)
    return sc, SceneRenderBridge(sc, meshes, mats, caps)


def test_oit_overflow_observable_and_attenuated():
    """8 glass layers through a K=4 peel: the overflow counter reports the
    beyond-K pixels, and the background behind the stack is darker than
    with the probe disabled (estimated transmittance applied) — deep
    stacks are accounted, not silently dropped (reference: AVBOIT's role,
    CLodCommon.h:82-86)."""
    import dataclasses
    sc, bridge = _glass_stack(8)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 11, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=64,
                      enable_oit=True, oit_layers=4, oit_clusters=64)
    out = jax.jit(build_frame_fn(cfg))(buffers, vd, FrameParams.default())
    assert int(out["oit_overflow"]) > 100      # stack center: 4 extra layers
    cfg_np = dataclasses.replace(cfg, oit_overflow_probe=False)
    out2 = jax.jit(build_frame_fn(cfg_np))(buffers, vd,
                                           FrameParams.default())
    c = np.asarray(out["hdr"])[64, 64]
    c2 = np.asarray(out2["hdr"])[64, 64]
    assert c.mean() < c2.mean()                # extra transmittance darkens
    # A 4-layer stack fits the peel budget exactly: no overflow.
    sc4, bridge4 = _glass_stack(4)
    buffers4 = bridge4.build_scene_buffers()
    v4, p4, pos4 = sc4.camera_matrices(aspect=1.0)
    out4 = jax.jit(build_frame_fn(cfg))(buffers4, make_view(v4, p4, pos4),
                                        FrameParams.default())
    assert int(out4["oit_overflow"]) == 0


def test_oit_tail_transmittance_adapts_to_material_alpha():
    """The beyond-K tail uses the pixel's OWN layer alphas (AVBOIT-style
    adaptive transmittance), not a global constant: a deep stack of thin
    (alpha 0.15) glass keeps most of the background, a deep stack of dense
    (alpha 0.8) glass removes almost all of it. A fixed 0.5 estimate would
    darken both by (1-0.5)^4 = 6% retention."""
    import dataclasses
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 11, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=64,
                      enable_oit=True, oit_layers=4, oit_clusters=64)
    cfg_np = dataclasses.replace(cfg, oit_overflow_probe=False)
    retention = {}
    for alpha in (0.15, 0.8):
        sc, bridge = _glass_stack(8, alpha=alpha)
        buffers = bridge.build_scene_buffers()
        view, proj, pos = sc.camera_matrices(aspect=1.0)
        vd = make_view(view, proj, pos)
        on = np.asarray(jax.jit(build_frame_fn(cfg))(
            buffers, vd, FrameParams.default())["hdr"])[64, 64]
        off = np.asarray(jax.jit(build_frame_fn(cfg_np))(
            buffers, vd, FrameParams.default())["hdr"])[64, 64]
        retention[alpha] = float(on.mean() / max(off.mean(), 1e-6))
    # Thin glass tail: (1-0.15)^4 = 52% of the background survives the
    # unresolved layers — far above the fixed-constant 6%, so the pixel
    # keeps well over a third of its probe-off value (it would sit much
    # lower under the old constant estimate) while still darkening.
    assert 0.35 < retention[0.15] < 0.995, retention
    # Dense glass: the 4 exact layers transmit only 0.2^4 of the
    # background, so the tail barely changes the pixel — must stay ~1,
    # NOT get over-darkened by a constant estimate.
    assert retention[0.8] > 0.9, retention


def _tinted_stack(n_layers):
    """n red TRANSMISSION (OpenPBR glass) quads over a white floor."""
    meshes = MeshRegistry()
    mats = MaterialRegistry()
    plane = meshes.add(procedural.make_plane(8.0, 1))
    white = mats.add(Material(base_color=np.array([1, 1, 1, 1], np.float32),
                              roughness=1.0))
    glass = mats.add(Material(
        base_color=np.array([1, 1, 1, 1], np.float32), roughness=0.1,
        transmission_weight=1.0,
        transmission_color=np.array([0.9, 0.25, 0.25], np.float32)))
    sc = Scene()
    import basicrenderer_tpu.utils.math3d as m3
    q = np.asarray(m3.quat_from_axis_angle([1, 0, 0], np.pi / 2))
    sc.create_renderable(plane, white, position=(0, 0, -2), rotation=q)
    for k in range(n_layers):
        sc.create_renderable(plane, glass, position=(0, 0, -1 + 0.2 * k),
                             rotation=q, scale=(0.4, 1, 0.4))
    sc.create_directional_light(direction=(0, -0.3, -1), intensity=3.0)
    sc.set_camera(position=(0, 0, 5), target=(0, 0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 9, max_triangles=1 << 9,
                            max_objects=16, max_materials=8, max_lights=4,
                            max_clusters=64)
    return sc, SceneRenderBridge(sc, meshes, mats, caps)


def test_oit_tail_per_channel_tint():
    """The beyond-K tail is PER-CHANNEL (AVBOIT optical-depth curve,
    AVBOITAdaptiveFit.hlsl analogue): a deep red-glass stack keeps the
    red share of the background while suppressing green/blue — a scalar
    alpha tail could only darken uniformly."""
    import dataclasses
    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 11, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=64,
                      enable_oit=True, oit_layers=2, oit_clusters=64,
                      enable_transmission=True)
    sc, bridge = _tinted_stack(8)          # 6 layers beyond K=2
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    on = np.asarray(jax.jit(build_frame_fn(cfg))(
        buffers, vd, FrameParams.default())["hdr"])[64, 64]
    off = np.asarray(jax.jit(build_frame_fn(dataclasses.replace(
        cfg, oit_overflow_probe=False)))(
        buffers, vd, FrameParams.default())["hdr"])[64, 64]
    ret = on / np.maximum(off, 1e-6)       # per-channel tail retention
    # Red survives the tail far better than green/blue: T_r=0.9 vs 0.25
    # per layer -> over 6 tail layers exp(-6*ln(1/0.9)) = 0.53 vs 0.0002.
    assert ret[0] > 3.0 * ret[1], ret
    assert ret[0] > 3.0 * ret[2], ret
    assert ret[0] > 0.25, ret


def test_oit_tail_emission_is_depth_weighted():
    """The beyond-K tail composites a depth-warp-weighted emission average
    (AVBOIT depth-warp/adaptive-fit analogue, AVBOITDepthWarp.hlsl):
    NEARER tail fragments dominate the tail's color. Swapping a red and a
    blue pane inside the tail flips the composited hue; plain Σod
    attenuation alone commutes and could not tell the orders apart."""
    import dataclasses

    def stack(order):
        meshes = MeshRegistry()
        mats = MaterialRegistry()
        plane = meshes.add(procedural.make_plane(8.0, 1))
        white = mats.add(Material(
            base_color=np.array([1, 1, 1, 1], np.float32), roughness=1.0))
        gray = mats.add(Material(
            base_color=np.array([0.5, 0.5, 0.5, 0.5], np.float32),
            alpha_blend=True, roughness=0.5))
        red = mats.add(Material(
            base_color=np.array([1, 0.05, 0.05, 0.6], np.float32),
            alpha_blend=True, roughness=0.5))
        blue = mats.add(Material(
            base_color=np.array([0.05, 0.05, 1, 0.6], np.float32),
            alpha_blend=True, roughness=0.5))
        sc = Scene()
        import basicrenderer_tpu.utils.math3d as m3
        q = np.asarray(m3.quat_from_axis_angle([1, 0, 0], np.pi / 2))
        sc.create_renderable(plane, white, position=(0, 0, -2), rotation=q)
        sc.create_renderable(plane, gray, position=(0, 0, 1), rotation=q,
                             scale=(0.4, 1, 0.4))
        for k, mat in enumerate(order):
            sc.create_renderable(plane, mat == "r" and red or blue,
                                 position=(0, 0, 0.2 - 0.4 * k), rotation=q,
                                 scale=(0.4, 1, 0.4))
        sc.create_directional_light(direction=(0, -0.3, -1), intensity=3.0)
        sc.set_camera(position=(0, 0, 5), target=(0, 0, 0), aspect=1.0)
        sc.propagate_transforms()
        caps = BridgeCapacities(max_vertices=1 << 9, max_triangles=1 << 9,
                                max_objects=16, max_materials=8,
                                max_lights=4, max_clusters=64)
        return sc, SceneRenderBridge(sc, meshes, mats, caps)

    cfg = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                      max_pairs=1 << 11, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=64,
                      enable_oit=True, oit_layers=1, oit_clusters=64)
    px = {}
    for order in ("rb", "br"):          # near..far inside the tail
        sc, bridge = stack(order)
        buffers = bridge.build_scene_buffers()
        view, proj, pos = sc.camera_matrices(aspect=1.0)
        out = jax.jit(build_frame_fn(cfg))(
            buffers, make_view(view, proj, pos), FrameParams.default())
        px[order] = np.asarray(out["hdr"])[64, 64]
    # Red-near order leans redder than blue-near order, and vice versa.
    assert px["rb"][0] - px["rb"][2] > px["br"][0] - px["br"][2] + 0.01, px

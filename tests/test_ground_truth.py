"""External ground truth: the renderer's linear HDR output vs an
INDEPENDENT numpy ray tracer over analytic scenes (primary rays +
direct Cook-Torrance lighting + analytic shadow rays).

The production RMSE rows in bench.py compare the engine against itself
at max quality; this bounds ABSOLUTE shading error instead (BASELINE.md's
"pixel RMSE vs reference" metric, done against closed-form light
transport). It would have caught the round-3 GTAO unused-normal class of
bug: any mis-wired normal, attenuation, or BRDF normalization shows up as
a large RMSE against the oracle."""

import numpy as np
import jax
import pytest

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn
from basicrenderer_tpu.models import procedural
from basicrenderer_tpu.models.materials import Material, MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.bridge import BridgeCapacities, SceneRenderBridge
from basicrenderer_tpu.scene.scene import Scene

RES = 192


# ---------------------------------------------------------------------------
# The oracle: analytic sphere + ground plane, one light, numpy only.
# ---------------------------------------------------------------------------

def _ggx_brdf(n, v, l, albedo, metallic, roughness):
    """Standard Cook-Torrance GGX (height-correlated Smith, Schlick
    Fresnel) + Lambert — written from the published equations, matching
    the model the renderer claims (GGX/Smith/Schlick is THE standard
    triple; agreement validates the wiring, normalization and cosine
    factors end to end)."""
    def dot(a, b):
        return np.sum(a * b, -1, keepdims=True)
    h = l + v
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    ndl = np.maximum(dot(n, l), 0.0)
    ndv = np.maximum(dot(n, v), 1e-4)
    ndh = np.maximum(dot(n, h), 0.0)
    vdh = np.maximum(dot(v, h), 0.0)
    alpha = np.maximum(roughness ** 2, 1e-3)
    a2 = alpha ** 2
    D = a2 / np.maximum(np.pi * ((ndh ** 2) * (a2 - 1.0) + 1.0) ** 2, 1e-12)
    lv = ndl * np.sqrt(ndv ** 2 * (1 - a2) + a2)
    ll = ndv * np.sqrt(ndl ** 2 * (1 - a2) + a2)
    Vis = 0.5 / np.maximum(lv + ll, 1e-8)
    f0 = 0.04 * (1 - metallic) + albedo * metallic
    F = f0 + (1 - f0) * np.clip(1 - vdh, 0, 1) ** 5
    kd = (1 - F) * (1 - metallic)
    return (kd * albedo / np.pi + D * Vis * F) * ndl


def _trace(cam_pos, inv_vp, res, sphere_c, sphere_r, sphere_mat, plane_y,
           plane_mat, light_dir, light_intensity, light_color):
    """Primary rays through pixel centers; sphere + infinite plane;
    one directional light with analytic shadow rays. Returns
    (hdr (res,res,3), hit_id (res,res): 0 none, 1 plane, 2 sphere)."""
    iy, ix = np.mgrid[0:res, 0:res].astype(np.float64)
    ndc_x = (ix + 0.5) / res * 2.0 - 1.0
    ndc_y = 1.0 - (iy + 0.5) / res * 2.0
    p = np.stack([ndc_x, ndc_y, 0.5 * np.ones_like(ndc_x),
                  np.ones_like(ndc_x)], -1) @ inv_vp.T
    p = p[..., :3] / p[..., 3:4]
    d = p - cam_pos
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam_pos, d.shape)

    # Sphere.
    oc = o - sphere_c
    b = np.sum(oc * d, -1)
    c = np.sum(oc * oc, -1) - sphere_r ** 2
    disc = b * b - c
    t_s = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
    t_s = np.where(t_s > 1e-4, t_s, np.inf)
    # Plane y = plane_y.
    t_p = np.where(np.abs(d[..., 1]) > 1e-9,
                   (plane_y - o[..., 1]) / d[..., 1], np.inf)
    t_p = np.where(t_p > 1e-4, t_p, np.inf)

    hit_id = np.where(np.isinf(np.minimum(t_s, t_p)), 0,
                      np.where(t_s < t_p, 2, 1))
    t = np.where(hit_id == 2, t_s, t_p)
    pos = o + d * np.where(np.isfinite(t), t, 0.0)[..., None]
    n = np.where((hit_id == 2)[..., None],
                 (pos - sphere_c) / sphere_r,
                 np.broadcast_to([0.0, 1.0, 0.0], pos.shape))
    l = -np.asarray(light_dir)
    l = l / np.linalg.norm(l)
    # Shadow ray vs the sphere (the only occluder).
    so = pos + n * 1e-4 - sphere_c
    sb = np.sum(so * l, -1)
    sc = np.sum(so * so, -1) - sphere_r ** 2
    sdisc = sb * sb - sc
    st = -sb - np.sqrt(np.maximum(sdisc, 0))
    shadowed = (sdisc >= 0) & (st > 1e-4)
    v = -d
    hdr = np.zeros(pos.shape)
    for hid, mat in ((1, plane_mat), (2, sphere_mat)):
        m = hit_id == hid
        brdf = _ggx_brdf(n, v, np.broadcast_to(l, pos.shape),
                         np.asarray(mat["albedo"]), mat["metallic"],
                         mat["roughness"])
        contrib = brdf * (np.asarray(light_color) * light_intensity)
        contrib = np.where(shadowed[..., None], 0.0, contrib)
        hdr = np.where(m[..., None], contrib, hdr)
    return hdr, hit_id


# ---------------------------------------------------------------------------
# The renderer render of the same scene.
# ---------------------------------------------------------------------------

def _render_scene(sphere_mat, cast_shadows):
    meshes, mats = MeshRegistry(), MaterialRegistry()
    sphere = meshes.add(procedural.make_uv_sphere(0.8, rings=96,
                                                  sectors=192))
    plane = meshes.add(procedural.make_plane(60.0, 2))
    plane_m = mats.add(Material(
        base_color=np.array([0.55, 0.55, 0.58, 1], np.float32),
        roughness=0.8))
    sphere_m = mats.add(Material(
        base_color=np.array(list(sphere_mat["albedo"]) + [1], np.float32),
        metallic=sphere_mat["metallic"], roughness=sphere_mat["roughness"]))
    sc = Scene()
    sc.create_renderable(plane, plane_m, position=(0, 0, 0))
    sc.create_renderable(sphere, sphere_m, position=(0, 0.9, 0))
    sc.create_directional_light(direction=(-0.4, -1.0, -0.3), intensity=2.5,
                                color=(1.0, 0.95, 0.9))
    sc.set_camera(position=(2.2, 1.8, 3.2), target=(0, 0.7, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 16, max_triangles=1 << 16,
                            max_objects=8, max_materials=4, max_lights=2)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=RES, height=RES, tile_h=16, tile_w=128,
                      max_pairs=1 << 15, use_pallas_raster=False,
                      enable_shadows=cast_shadows, num_cascades=2,
                      shadow_resolution=2048)
    out = jax.jit(build_frame_fn(cfg))(buffers, vd := make_view(view, proj,
                                                                pos),
                                       FrameParams.default())
    inv_vp = np.linalg.inv((proj @ view).astype(np.float64))
    return (np.asarray(out["hdr"]), np.asarray(out["vis"]),
            pos.astype(np.float64), inv_vp)


def _interior_mask(hit_id, vis):
    """Pixels where both renderers agree on the surface AND no neighbor
    disagrees (erodes silhouette/shadow edge pixels where rasterization
    and analytic intersection legitimately differ by half a pixel)."""
    agree = (hit_id > 0) == (vis > 0)
    m = agree.copy()
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        m &= np.roll(agree, sh, axis=ax)
    # Also erode around the sphere/plane boundary and shadow edge via the
    # oracle's own discontinuities.
    edge = np.zeros_like(m)
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        edge |= np.roll(hit_id, sh, axis=ax) != hit_id
    return m & ~edge & (hit_id > 0)


LIGHT = dict(light_dir=(-0.4, -1.0, -0.3), light_intensity=2.5,
             light_color=(1.0, 0.95, 0.9))
PLANE_MAT = {"albedo": (0.55, 0.55, 0.58), "metallic": 0.0,
             "roughness": 0.8}


@pytest.mark.parametrize("name,mat", [
    ("diffuse", {"albedo": (0.7, 0.3, 0.25), "metallic": 0.0,
                 "roughness": 0.9}),
    ("glossy", {"albedo": (0.2, 0.5, 0.8), "metallic": 0.0,
                "roughness": 0.3}),
    ("metal", {"albedo": (0.95, 0.75, 0.35), "metallic": 1.0,
               "roughness": 0.4}),
])
def test_shading_matches_ray_traced_ground_truth(name, mat):
    hdr, vis, cam, inv_vp = _render_scene(mat, cast_shadows=True)
    gt, hit_id = _trace(cam, inv_vp, RES, np.array([0.0, 0.9, 0.0]), 0.8,
                        mat, 0.0, PLANE_MAT, **LIGHT)
    m = _interior_mask(hit_id, vis)
    assert m.sum() > RES * RES * 0.5         # enough interior coverage
    err = hdr - gt
    # Shadow-map edges: the CSM shadow boundary is quantized to shadow
    # texels while the oracle's is exact — mask pixels where the two
    # disagree on LIT vs SHADOWED entirely (binary visibility mismatch),
    # then bound the remaining shading error tightly.
    lit_r = hdr.sum(-1) > 1e-3
    lit_g = gt.sum(-1) > 1e-3
    m = m & (lit_r == lit_g)
    rmse = float(np.sqrt(np.mean(err[m] ** 2)))
    assert rmse <= 2e-2, (name, rmse)
    # Mean signed error catches systematic energy bias at finer grain.
    assert abs(float(np.mean(err[m]))) <= 5e-3, (name, float(np.mean(
        err[m])))


def test_shadow_coverage_matches_oracle():
    """The CSM shadow footprint agrees with analytic shadow rays to within
    an edge band: binary visibility mismatches stay under 2% of pixels."""
    mat = {"albedo": (0.7, 0.3, 0.25), "metallic": 0.0, "roughness": 0.9}
    hdr, vis, cam, inv_vp = _render_scene(mat, cast_shadows=True)
    gt, hit_id = _trace(cam, inv_vp, RES, np.array([0.0, 0.9, 0.0]), 0.8,
                        mat, 0.0, PLANE_MAT, **LIGHT)
    m = _interior_mask(hit_id, vis)
    lit_r = hdr.sum(-1) > 1e-3
    lit_g = gt.sum(-1) > 1e-3
    mismatch = float(np.mean((lit_r != lit_g)[m]))
    assert mismatch < 0.02, mismatch
    # And the shadow exists at all (the oracle shadows >2% of the plane).
    assert float(np.mean((~lit_g)[m & (hit_id == 1)])) > 0.02

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


# ---------------------------------------------------------------------------
# Textured + IBL ground truth (VERDICT r4 item 10).
# ---------------------------------------------------------------------------

def _env_brdf_true(roughness, n_samples=8192, n_ndv=257):
    """TRUE split-sum environment BRDF integral (A, B) over a grid of
    n.v — GGX half-vector importance sampling of EXACTLY the integral the
    Karis analytic fit (ops/ibl.env_brdf_karis) approximates, with the
    height-correlated Smith visibility the renderer shades with. For a
    CONSTANT environment the split-sum is exact, so L*(f0*A+B) is closed-
    form ground truth. Returns (ndv_grid, A, B)."""
    a = max(roughness * roughness, 1e-3)
    i = np.arange(n_samples)
    xi2 = (i + 0.5) / n_samples                    # stratified
    phi = 2.0 * np.pi * ((i * 0.6180339887498949) % 1.0)
    ct = np.sqrt((1.0 - xi2) / (1.0 + (a * a - 1.0) * xi2))
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    h = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)  # (S, 3)
    ndv = np.linspace(1e-3, 1.0, n_ndv)
    v = np.stack([np.sqrt(np.maximum(1 - ndv ** 2, 0.0)),
                  np.zeros_like(ndv), ndv], -1)                 # (N, 3)
    vdh = v @ h.T                                               # (N, S)
    l = 2.0 * vdh[..., None] * h[None] - v[:, None]             # (N, S, 3)
    ndl = l[..., 2]
    ok = (ndl > 0) & (vdh > 0)
    ndl = np.maximum(ndl, 1e-6)
    a2 = a * a
    lv = ndl * np.sqrt(ndv[:, None] ** 2 * (1 - a2) + a2)
    ll = ndv[:, None] * np.sqrt(ndl ** 2 * (1 - a2) + a2)
    vis = 0.5 / np.maximum(lv + ll, 1e-9)
    # pdf_h = D*ndh/(4*vdh)  =>  weight = 4*Vis*ndl*vdh/ndh.
    w = np.where(ok, 4.0 * vis * ndl * vdh / np.maximum(ct[None], 1e-6), 0.0)
    fc = np.clip(1.0 - vdh, 0.0, 1.0) ** 5
    return ndv, (w * (1 - fc)).mean(-1), (w * fc).mean(-1)


def _grad_albedo(u, v):
    """The gradient texture, evaluated the way the bilinear sampler sees
    it: 256 texels of value i/255 along each axis -> sampling at texel
    coordinate u*256-0.5 returns exactly that linear ramp (every box-
    filtered mip of a linear ramp is the same linear function, so mip
    selection cannot matter — the property that makes a texture
    ground-truthable at all)."""
    r = np.clip(u * 256.0 - 0.5, 0.0, 255.0) / 255.0
    b = np.clip(v * 256.0 - 0.5, 0.0, 255.0) / 255.0
    return np.stack([r, 0.45 * np.ones_like(r), b], -1)


def test_textured_ibl_matches_ground_truth():
    """Textured albedo + constant-environment IBL vs closed-form transport:
    direct GGX sun + (SH diffuse == albedo*kd*L exactly for a constant env)
    + (split-sum specular == L*(f0*A+B) with the TRUE numerically
    integrated A,B). Bounds the whole texture pipeline (atlas pack, strip
    sampler, sRGB/linear handling, mip chain) AND the IBL chain (SH
    projection/eval, prefilter sampling, env-BRDF) at once."""
    from basicrenderer_tpu.models.textures import TextureRegistry
    from basicrenderer_tpu.ops import ibl as ibl_ops
    import jax.numpy as jnp

    L_ENV = np.array([0.35, 0.3, 0.4])
    sph_mat = {"albedo": (0.3, 0.55, 0.8), "metallic": 0.0, "roughness": 0.45}
    pl_base = np.array([0.9, 0.85, 0.8])

    # Gradient texture (linear data, srgb=False: stored + sampled linear).
    i = np.arange(256, dtype=np.float32)
    tex_img = np.zeros((256, 256, 4), np.float32)
    tex_img[..., 0] = i[None, :] / 255.0
    tex_img[..., 1] = 0.45
    tex_img[..., 2] = i[:, None] / 255.0
    tex_img[..., 3] = 1.0

    meshes, mats = MeshRegistry(), MaterialRegistry()
    tex = TextureRegistry(resolution=256)
    tid = tex.add(tex_img, srgb=False)
    sphere = meshes.add(procedural.make_uv_sphere(0.8, rings=96,
                                                  sectors=192))
    plane = meshes.add(procedural.make_plane(60.0, 2))
    plane_m = mats.add(Material(
        base_color=np.array(list(pl_base) + [1], np.float32),
        roughness=0.85, base_color_texture=tid))
    sphere_m = mats.add(Material(
        base_color=np.array(list(sph_mat["albedo"]) + [1], np.float32),
        metallic=sph_mat["metallic"], roughness=sph_mat["roughness"]))
    sc = Scene()
    sc.create_renderable(plane, plane_m)
    sc.create_renderable(sphere, sphere_m, position=(0, 0.9, 0))
    sc.create_directional_light(direction=(-0.4, -1.0, -0.3), intensity=2.5,
                                color=(1.0, 0.95, 0.9))
    sc.set_camera(position=(2.2, 1.8, 3.2), target=(0, 0.7, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 16, max_triangles=1 << 16,
                            max_objects=8, max_materials=4, max_lights=2)
    bridge = SceneRenderBridge(sc, meshes, mats, caps, textures=tex)

    # EXACT constant environment: band-0 SH calibrated so
    # eval_sh_irradiance returns exactly L_ENV; prefiltered stack constant.
    unit = np.zeros((9, 3), np.float32)
    unit[0] = 1.0
    k = float(np.asarray(ibl_ops.eval_sh_irradiance(
        jnp.asarray(unit), jnp.asarray([[0.0, 1.0, 0.0]],
                                       jnp.float32)))[0, 0])
    sh = np.zeros((9, 3), np.float32)
    sh[0] = L_ENV / k
    spec = np.broadcast_to(L_ENV.astype(np.float32),
                           (5, 6, 16, 16, 3)).copy()
    buffers = bridge.build_scene_buffers(env_sh=sh, env_specular=spec)

    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=RES, height=RES, tile_h=16, tile_w=128,
                      max_pairs=1 << 15, use_pallas_raster=False,
                      enable_shadows=False, enable_ibl=True,
                      ibl_specular_downscale=2,
                      enable_textures=True, texture_downscale=1,
                      tex_channels=("base",))
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    hdr = np.asarray(out["hdr"])
    vis = np.asarray(out["vis"])
    cam = pos.astype(np.float64)
    inv_vp = np.linalg.inv((proj @ view).astype(np.float64))

    # --- the oracle --------------------------------------------------------
    iy, ix = np.mgrid[0:RES, 0:RES].astype(np.float64)
    ndc = np.stack([(ix + 0.5) / RES * 2 - 1, 1 - (iy + 0.5) / RES * 2,
                    0.5 * np.ones_like(ix), np.ones_like(ix)], -1)
    p = ndc @ inv_vp.T
    p = p[..., :3] / p[..., 3:4]
    d = p - cam
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam, d.shape)
    sc_c, sc_r = np.array([0.0, 0.9, 0.0]), 0.8
    oc = o - sc_c
    b = np.sum(oc * d, -1)
    c = np.sum(oc * oc, -1) - sc_r ** 2
    disc = b * b - c
    t_s = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
    t_s = np.where(t_s > 1e-4, t_s, np.inf)
    t_p = np.where(np.abs(d[..., 1]) > 1e-9, -o[..., 1] / d[..., 1], np.inf)
    t_p = np.where(t_p > 1e-4, t_p, np.inf)
    hit_id = np.where(np.isinf(np.minimum(t_s, t_p)), 0,
                      np.where(t_s < t_p, 2, 1))
    t = np.where(hit_id == 2, t_s, t_p)
    pos3 = o + d * np.where(np.isfinite(t), t, 0.0)[..., None]
    n = np.where((hit_id == 2)[..., None], (pos3 - sc_c) / sc_r,
                 np.broadcast_to([0.0, 1.0, 0.0], pos3.shape))
    l = -np.array([-0.4, -1.0, -0.3])
    l = l / np.linalg.norm(l)
    v = -d
    ndv = np.maximum(np.sum(n * v, -1), 1e-4)
    u_pl = pos3[..., 0] / 60.0 + 0.5
    v_pl = pos3[..., 2] / 60.0 + 0.5
    alb_pl = pl_base * _grad_albedo(u_pl, v_pl)
    gt = np.zeros_like(pos3)
    for hid, rough, alb in ((1, 0.85, alb_pl),
                            (2, sph_mat["roughness"],
                             np.asarray(sph_mat["albedo"]))):
        direct = _ggx_brdf(n, v, np.broadcast_to(l, pos3.shape), alb,
                           0.0, rough) * (np.array([1.0, 0.95, 0.9]) * 2.5)
        f0 = 0.04
        kd = (1.0 - f0)
        diffuse_ibl = kd * alb * L_ENV
        grid, A, B = _env_brdf_true(rough)
        Ai = np.interp(ndv, grid, A)
        Bi = np.interp(ndv, grid, B)
        spec_ibl = L_ENV * (f0 * Ai + Bi)[..., None]
        gt = np.where((hit_id == hid)[..., None],
                      direct + diffuse_ibl + spec_ibl, gt)

    m = _interior_mask(hit_id, vis)
    assert m.sum() > RES * RES * 0.5
    err = hdr - gt
    rmse = float(np.sqrt(np.mean(err[m] ** 2)))
    assert rmse <= 2e-2, rmse
    assert abs(float(np.mean(err[m]))) <= 8e-3, float(np.mean(err[m]))
    # Non-vacuous: the texture gradient actually varies across the plane.
    pm = m & (hit_id == 1)
    assert hdr[pm][:, 0].std() > 0.01


# ---------------------------------------------------------------------------
# Transmission / glass ground truth (VERDICT r4 item 10).
# ---------------------------------------------------------------------------

def test_transmission_glass_matches_ground_truth():
    """A thin glass pane over a diffuse ground vs the closed-form thin-
    surface transmission model the renderer claims (OpenPBR transmission
    through the OIT peel, ops/oit.py): at a glass pixel
        out = spec_direct + background * tint * (1 - F(n.v))
    with F Schlick at f0 = ((ior-1)/(ior+1))^2 and the diffuse lobe
    removed (transmission_weight = 1). Validates the OIT raster + peel +
    Beer-Lambert composite wiring end to end against independent math."""
    import jax.numpy as jnp

    TINT = np.array([0.55, 0.85, 0.65])
    PY = 1.2          # glass pane height
    PHALF = 1.5       # pane half-extent
    g_rough = 0.25
    pl_alb = np.array([0.5, 0.52, 0.55])
    LDIR = np.array([-0.35, -1.0, -0.25])
    LI = 2.5

    meshes, mats = MeshRegistry(), MaterialRegistry()
    plane = meshes.add(procedural.make_plane(40.0, 2))
    pane = meshes.add(procedural.make_plane(2 * PHALF, 1))
    ground_m = mats.add(Material(
        base_color=np.array(list(pl_alb) + [1], np.float32), roughness=0.85))
    glass_m = mats.add(Material(
        base_color=np.array([1, 1, 1, 1], np.float32), roughness=g_rough,
        alpha_blend=True, transmission_weight=1.0,
        transmission_color=TINT.astype(np.float32), ior=1.5))
    sc = Scene()
    sc.create_renderable(plane, ground_m)
    sc.create_renderable(pane, glass_m, position=(0, PY, 0))
    sc.create_directional_light(direction=tuple(LDIR), intensity=LI)
    sc.set_camera(position=(2.8, 4.2, 3.4), target=(0, 0.0, 0), aspect=1.0)
    sc.propagate_transforms()
    caps = BridgeCapacities(max_vertices=1 << 10, max_triangles=1 << 10,
                            max_objects=8, max_materials=4, max_lights=2,
                            max_clusters=32)
    bridge = SceneRenderBridge(sc, meshes, mats, caps)
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    cfg = FrameConfig(width=RES, height=RES, tile_h=16, tile_w=128,
                      max_pairs=1 << 13, use_pallas_raster=False,
                      enable_clod=True, max_visible_clusters=64,
                      enable_shadows=False, enable_oit=True, oit_layers=2,
                      oit_clusters=64, enable_transmission=True)
    out = jax.jit(build_frame_fn(cfg))(buffers, make_view(view, proj, pos),
                                       FrameParams.default())
    hdr = np.asarray(out["hdr"])
    vis = np.asarray(out["vis"])
    cam = pos.astype(np.float64)
    inv_vp = np.linalg.inv((proj @ view).astype(np.float64))

    # --- the oracle --------------------------------------------------------
    iy, ix = np.mgrid[0:RES, 0:RES].astype(np.float64)
    ndc = np.stack([(ix + 0.5) / RES * 2 - 1, 1 - (iy + 0.5) / RES * 2,
                    0.5 * np.ones_like(ix), np.ones_like(ix)], -1)
    p = ndc @ inv_vp.T
    p = p[..., :3] / p[..., 3:4]
    d = p - cam
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam, d.shape)
    l = -LDIR / np.linalg.norm(LDIR)
    v = -d
    up = np.array([0.0, 1.0, 0.0])

    # Ground hit (y=0) is the background everywhere it exists.
    t_g = np.where(np.abs(d[..., 1]) > 1e-9, -o[..., 1] / d[..., 1], np.inf)
    t_g = np.where(t_g > 1e-4, t_g, np.inf)
    gpos = o + d * np.where(np.isfinite(t_g), t_g, 0.0)[..., None]
    nrm = np.broadcast_to(up, gpos.shape)
    bg = _ggx_brdf(nrm, v, np.broadcast_to(l, gpos.shape), pl_alb, 0.0,
                   0.85) * LI
    bg = np.where(np.isfinite(t_g)[..., None], bg, 0.0)

    # Glass pane hit (y=PY, |x|,|z| <= PHALF), camera above only.
    t_q = np.where(d[..., 1] < -1e-9, (PY - o[..., 1]) / d[..., 1], np.inf)
    qpos = o + d * np.where(np.isfinite(t_q), t_q, 0.0)[..., None]
    on_pane = (np.isfinite(t_q) & (np.abs(qpos[..., 0]) <= PHALF)
               & (np.abs(qpos[..., 2]) <= PHALF) & (t_q < t_g))
    ndv = np.maximum(np.sum(up * v, -1), 1e-4)
    f0 = ((1.5 - 1.0) / (1.5 + 1.0)) ** 2
    F = f0 + (1 - f0) * np.clip(1 - ndv, 0, 1) ** 5
    # Specular-only direct on the glass (diffuse removed at tw=1): reuse
    # the shared BRDF with albedo 0 / metallic 0 -> kd*albedo term = 0.
    gspec = _ggx_brdf(nrm, v, np.broadcast_to(l, gpos.shape),
                      np.zeros(3), 0.0, g_rough) * LI
    glass = gspec + bg * TINT * (1 - F)[..., None]
    gt = np.where(on_pane[..., None], glass, bg)
    hit_id = np.where(on_pane, 2, np.where(np.isfinite(t_g), 1, 0))

    m = _interior_mask(hit_id, vis)
    assert (m & (hit_id == 2)).sum() > 400     # glass interior covered
    err = hdr - gt
    rmse = float(np.sqrt(np.mean(err[m] ** 2)))
    assert rmse <= 2e-2, rmse
    rmse_g = float(np.sqrt(np.mean(err[m & (hit_id == 2)] ** 2)))
    assert rmse_g <= 2e-2, rmse_g
    # Non-vacuous: the pane really tints (green channel survives best).
    gm = m & (hit_id == 2)
    assert (hdr[gm][:, 1] / np.maximum(hdr[gm][:, 0], 1e-4)).mean() > 1.2

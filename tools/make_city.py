"""Author the real-content benchmark asset: a Bistro-class city block as a
binary .glb with embedded PNG textures.

The reference's demo content (Bistro / San Miguel / Zorah — README.md:41-52)
is not redistributable and this environment has no network egress, so the
benchmark street is authored here and serialized through a real glTF 2.0
binary exporter (tools/gltf_export.py), then ingested through the actual
importer path (models/importers.load_gltf): binary accessors, embedded PNG
decode, PBR materials with alpha-MASK foliage, normal maps, instanced node
hierarchy, UV seams — the full pipeline the reference exercises on Bistro.

Content: plastered/brick buildings with window insets, balconies, pilasters
and ground-floor arcades around a cobbled plaza with a fountain, street
lamps, and alpha-MASK trees. Curved arches/columns/domes give the LOD
builder real curvature; instanced prototypes exercise geometry sharing.

    python tools/make_city.py [out.glb] [--subdiv N]

Default subdivision yields ~1M unique triangles (~4M instanced).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.gltf_export import GlbBuilder  # noqa: E402


# ---------------------------------------------------------------------------
# Mesh soup helpers: lists of (positions, normals, uvs, indices) merged late.
# ---------------------------------------------------------------------------

class Soup:
    def __init__(self):
        self.pos, self.nrm, self.uv, self.idx = [], [], [], []
        self.count = 0

    def add(self, p, n, u, i):
        self.pos.append(np.asarray(p, np.float32))
        self.nrm.append(np.asarray(n, np.float32))
        self.uv.append(np.asarray(u, np.float32))
        self.idx.append(np.asarray(i, np.int32) + self.count)
        self.count += len(p)

    def merged(self):
        return (np.concatenate(self.pos), np.concatenate(self.nrm),
                np.concatenate(self.uv), np.concatenate(self.idx))

    @property
    def tris(self):
        return sum(len(i) for i in self.idx)


def grid(nx, ny):
    """Unit XY grid [0,1]^2 facing +Z: (verts, uv, indices)."""
    xs = np.linspace(0, 1, nx + 1, dtype=np.float32)
    ys = np.linspace(0, 1, ny + 1, dtype=np.float32)
    xx, yy = np.meshgrid(xs, ys, indexing="xy")
    v = np.stack([xx, yy, np.zeros_like(xx)], -1).reshape(-1, 3)
    uv = np.stack([xx, yy], -1).reshape(-1, 2)
    i0 = (np.arange(ny)[:, None] * (nx + 1) + np.arange(nx)[None]).reshape(-1)
    quads = np.stack([i0, i0 + 1, i0 + nx + 2, i0, i0 + nx + 2, i0 + nx + 1],
                     -1).reshape(-1, 3)
    return v, uv, quads


def xform(p, n, basis, origin):
    """Apply a (3,3) basis + origin to positions and its rotation to
    normals."""
    b = np.asarray(basis, np.float32)
    return p @ b.T + np.asarray(origin, np.float32), \
        n @ np.linalg.inv(b).astype(np.float32)  # normal via inv-transpose^T


def panel(soup, origin, du, dv, nx=1, ny=1, uscale=(1.0, 1.0)):
    """Rectangle spanned by du, dv from origin, subdivided nx x ny."""
    v, uv, idx = grid(nx, ny)
    du = np.asarray(du, np.float32)
    dv = np.asarray(dv, np.float32)
    n = np.cross(du, dv)
    n = n / (np.linalg.norm(n) + 1e-9)
    p = origin + v[:, 0:1] * du + v[:, 1:2] * dv
    soup.add(p, np.tile(n, (len(p), 1)), uv * np.asarray(uscale, np.float32),
             idx)


def box(soup, center, size, sub=1, uscale=1.0):
    """Axis-aligned box; every face subdivided `sub` x `sub`."""
    cx, cy, cz = center
    sx, sy, sz = np.asarray(size, np.float32) * 0.5
    o = np.array([cx, cy, cz], np.float32)
    faces = [
        (o + [-sx, -sy, sz], [2 * sx, 0, 0], [0, 2 * sy, 0]),    # +z
        (o + [sx, -sy, -sz], [-2 * sx, 0, 0], [0, 2 * sy, 0]),   # -z
        (o + [sx, -sy, sz], [0, 0, -2 * sz], [0, 2 * sy, 0]),    # +x
        (o + [-sx, -sy, -sz], [0, 0, 2 * sz], [0, 2 * sy, 0]),   # -x
        (o + [-sx, sy, sz], [2 * sx, 0, 0], [0, 0, -2 * sz]),    # +y
        (o + [-sx, -sy, -sz], [2 * sx, 0, 0], [0, 0, 2 * sz]),   # -y
    ]
    for orig, du, dv in faces:
        ext = (np.linalg.norm(du), np.linalg.norm(dv))
        panel(soup, orig, du, dv, sub, sub,
              uscale=(ext[0] * uscale, ext[1] * uscale))


def cylinder(soup, center, radius, height, seg=24, vsub=4, uscale=1.0,
             taper=1.0):
    """Y-axis cylinder (optionally tapered)."""
    a = np.linspace(0, 2 * np.pi, seg + 1, dtype=np.float32)
    ys = np.linspace(0, 1, vsub + 1, dtype=np.float32)
    rr = radius * (1 + (taper - 1) * ys)                       # (vsub+1,)
    px = np.cos(a)[None] * rr[:, None]
    pz = np.sin(a)[None] * rr[:, None]
    py = (ys * height)[:, None] * np.ones_like(a)[None]
    p = np.stack([px, py, pz], -1).reshape(-1, 3) + np.asarray(center)
    n = np.stack([np.cos(a)[None] * np.ones_like(rr)[:, None],
                  np.zeros_like(px),
                  np.sin(a)[None] * np.ones_like(rr)[:, None]], -1
                 ).reshape(-1, 3)
    uv = np.stack([np.tile(a / (2 * np.pi), vsub + 1) * seg / 4 * uscale,
                   np.repeat(ys * height * uscale, seg + 1)], -1)
    i0 = (np.arange(vsub)[:, None] * (seg + 1) + np.arange(seg)[None]
          ).reshape(-1)
    idx = np.stack([i0, i0 + seg + 1, i0 + 1,
                    i0 + 1, i0 + seg + 1, i0 + seg + 2], -1).reshape(-1, 3)
    soup.add(p, n, uv, idx)


def dome(soup, center, radius, seg=24, rings=10, uscale=1.0):
    a = np.linspace(0, 2 * np.pi, seg + 1, dtype=np.float32)
    t = np.linspace(0, np.pi / 2, rings + 1, dtype=np.float32)
    px = np.outer(np.cos(t), np.cos(a)) * radius
    pz = np.outer(np.cos(t), np.sin(a)) * radius
    py = np.outer(np.sin(t), np.ones_like(a)) * radius
    p = np.stack([px, py, pz], -1).reshape(-1, 3) + np.asarray(center)
    n = (p - np.asarray(center)) / radius
    uv = np.stack([np.tile(a / (2 * np.pi) * 4, rings + 1),
                   np.repeat(t / (np.pi / 2), seg + 1)], -1) * uscale
    i0 = (np.arange(rings)[:, None] * (seg + 1) + np.arange(seg)[None]
          ).reshape(-1)
    idx = np.stack([i0, i0 + 1, i0 + seg + 1,
                    i0 + 1, i0 + seg + 2, i0 + seg + 1], -1).reshape(-1, 3)
    soup.add(p, n, uv, idx)


def arch_wall(soup, origin, width, height, depth, r, seg=16, sub=6):
    """A wall segment with a round-arched opening (the arcade element).
    Faces +z; origin = bottom-left-front corner."""
    w, h = width, height
    cx = w / 2
    cy = h - r * 1.15
    a = np.linspace(np.pi, 0, seg + 1, dtype=np.float32)
    ax = cx + np.cos(a) * r
    ay = cy + np.sin(a) * r
    for z in (0.0, -depth):
        flip = z < 0
        # Side strips beside the opening + lintel above the arch.
        for x0, x1 in ((0, cx - r), (cx + r, w)):
            v, uv, idx = grid(sub, sub * 2)
            p = np.stack([x0 + v[:, 0] * (x1 - x0), v[:, 1] * h,
                          np.full(len(v), z)], -1)
            n = np.tile([0, 0, -1.0 if flip else 1.0], (len(p), 1))
            soup.add(p, n, uv * [x1 - x0, h],
                     idx[:, ::-1] if flip else idx)
        # Fan between the arch curve and the wall top.
        ring = np.stack([ax, ay, np.full(seg + 1, z)], -1)
        top = np.stack([ax, np.full(seg + 1, h), np.full(seg + 1, z)], -1)
        p = np.concatenate([ring, top])
        n = np.tile([0, 0, -1.0 if flip else 1.0], (len(p), 1))
        uv = np.concatenate([np.stack([ax, ay], -1),
                             np.stack([ax, np.full(seg + 1, h)], -1)])
        i0 = np.arange(seg)
        idx = np.stack([i0, i0 + 1, i0 + seg + 2,
                        i0, i0 + seg + 2, i0 + seg + 1], -1).reshape(-1, 3)
        soup.add(p, n, uv, idx[:, ::-1] if flip else idx)
    # Arch soffit (the curved underside).
    inner = np.stack([ax, ay, np.zeros(seg + 1)], -1)
    outer = np.stack([ax, ay, np.full(seg + 1, -depth)], -1)
    p = np.concatenate([inner, outer])
    n = np.stack([-(np.cos(a)), -(np.sin(a)), np.zeros(seg + 1)], -1)
    n = np.concatenate([n, n])
    uv = np.concatenate([np.stack([a * r, np.zeros(seg + 1)], -1),
                         np.stack([a * r, np.full(seg + 1, depth)], -1)])
    i0 = np.arange(seg)
    idx = np.stack([i0, i0 + seg + 1, i0 + 1,
                    i0 + 1, i0 + seg + 1, i0 + seg + 2], -1).reshape(-1, 3)
    soup.add(p, n, uv, idx)


# ---------------------------------------------------------------------------
# Procedural textures (encoded to PNG by the exporter).
# ---------------------------------------------------------------------------

def _noise(rng, r, octaves=4):
    img = np.zeros((r, r), np.float32)
    for o in range(octaves):
        s = 1 << (o + 2)
        coarse = rng.random((s, s)).astype(np.float32)
        reps = r // s
        img += np.kron(coarse, np.ones((reps, reps), np.float32)) / (o + 1)
    return (img - img.min()) / (np.ptp(img) + 1e-9)


def _to_rgba(rgb, a=None):
    rgb8 = np.clip(rgb * 255, 0, 255).astype(np.uint8)
    if a is None:
        a8 = np.full(rgb8.shape[:2] + (1,), 255, np.uint8)
    else:
        a8 = np.clip(a * 255, 0, 255).astype(np.uint8)[..., None]
    return np.concatenate([rgb8, a8], -1)


def _height_to_normal(h, strength=2.0):
    gy, gx = np.gradient(h.astype(np.float32))
    n = np.stack([-gx * strength, -gy * strength, np.ones_like(h)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return _to_rgba(n * 0.5 + 0.5)


def make_textures(r=256, seed=11):
    rng = np.random.default_rng(seed)
    out = {}
    yy, xx = np.mgrid[0:r, 0:r].astype(np.float32) / r

    # Brick: staggered courses.
    rows = (yy * 16).astype(int)
    mortar_y = np.abs((yy * 16) % 1 - 0.5) > 0.42
    bx = (xx * 8 + (rows % 2) * 0.5)
    mortar_x = np.abs(bx % 1 - 0.5) > 0.45
    mortar = mortar_y | mortar_x
    tone = 0.55 + 0.25 * _noise(rng, r) + 0.1 * rng.random((r, r))
    brick = np.stack([tone * 0.75, tone * 0.38, tone * 0.30], -1)
    brick[mortar] = [0.62, 0.58, 0.54]
    out["brick"] = _to_rgba(brick)
    bh = np.where(mortar, 0.0, tone)
    out["brick_n"] = _height_to_normal(bh, 1.5)

    # Plaster: warm noise + streaks.
    pl = 0.78 + 0.12 * _noise(rng, r) - 0.08 * (yy ** 2)
    out["plaster"] = _to_rgba(np.stack([pl, pl * 0.92, pl * 0.78], -1))
    out["plaster_n"] = _height_to_normal(_noise(rng, r), 0.6)

    # Cobblestone: jittered cell darkening.
    cell = 10
    cyid = (yy * cell).astype(int)
    cxid = (xx * cell).astype(int)
    cseed = ((cyid * 31 + cxid * 17) % 13) / 13.0
    fy = (yy * cell) % 1 - 0.5
    fx = (xx * cell) % 1 - 0.5
    d = np.sqrt(fx ** 2 + fy ** 2)
    stone = np.clip(0.55 - d * 0.6 + cseed * 0.2, 0.12, 0.7) \
        + 0.08 * _noise(rng, r)
    out["cobble"] = _to_rgba(np.stack([stone, stone * 0.97, stone * 0.9], -1))
    out["cobble_n"] = _height_to_normal(-d + 0.1 * _noise(rng, r), 2.5)

    # Roof tiles.
    trow = np.abs((yy * 12) % 1 - 0.5) > 0.38
    tcol = np.abs((xx * 12 + (yy * 12).astype(int) % 2 * 0.5) % 1 - 0.5) > 0.44
    tt = 0.45 + 0.15 * _noise(rng, r)
    roof = np.stack([tt * 0.75, tt * 0.35, tt * 0.3], -1)
    roof[trow | tcol] *= 0.55
    out["roof"] = _to_rgba(roof)

    # Leaf card (alpha MASK): elliptical clusters of leaflets.
    cx2 = xx - 0.5
    cy2 = yy - 0.5
    alpha = np.zeros((r, r), np.float32)
    g = np.zeros((r, r), np.float32)
    for _ in range(60):
        lx, ly = rng.uniform(-0.42, 0.42, 2)
        rr2 = (cx2 - lx) ** 2 * rng.uniform(4, 9) \
            + (cy2 - ly) ** 2 * rng.uniform(8, 18)
        blob = rr2 < 0.012
        alpha[blob] = 1.0
        g[blob] = np.maximum(g[blob], rng.uniform(0.35, 0.9))
    leaf = np.stack([g * 0.25, g * 0.55, g * 0.18], -1)
    out["leaf"] = _to_rgba(leaf, alpha)

    # Bark.
    streak = _noise(rng, r)
    bark = 0.3 + 0.25 * np.abs(np.sin(xx * 40 + streak * 6))
    out["bark"] = _to_rgba(np.stack([bark * 0.55, bark * 0.42, bark * 0.3],
                                    -1))
    # Painted metal (lamps, doors).
    mt = 0.2 + 0.1 * _noise(rng, r)
    out["metal"] = _to_rgba(np.stack([mt * 0.6, mt * 0.75, mt * 0.7], -1))
    return out


# ---------------------------------------------------------------------------
# Prototypes
# ---------------------------------------------------------------------------

def building_proto(rng, sub, floors, bays, wall_mat, glass_mat, trim_mat,
                   roof_mat, arcade=False):
    """One building prototype: returns {material: Soup}."""
    soups = {m: Soup() for m in (wall_mat, glass_mat, trim_mat, roof_mat)}
    wall = soups[wall_mat]
    glass = soups[glass_mat]
    trim = soups[trim_mat]
    roof = soups[roof_mat]
    fw = 2.6                    # bay width
    fh = 3.2                    # floor height
    W = bays * fw
    D = 10.0
    H = floors * fh

    def facade(origin, right, bays_n, depth_n):
        """One face: per-floor window strips with inset glass boxes."""
        nrm = np.cross([0, 1, 0], right)
        for f in range(floors):
            y0 = f * fh
            ground = f == 0 and arcade and depth_n
            for b in range(bays_n):
                x0 = np.asarray(origin, np.float32) + np.asarray(right) * (b * fw)
                if ground:
                    arch_wall(wall, x0, fw, fh, 0.4, fw * 0.3,
                              seg=8 * max(sub // 2, 1), sub=3 * sub)
                    continue
                # Wall panel with a window hole approximated as: full panel
                # + inset glass + frame trim (cheap and watertight enough).
                panel(wall, x0 + np.array([0, y0, 0], np.float32),
                      np.asarray(right) * fw, [0, fh, 0], 3 * sub, 4 * sub,
                      uscale=(fw, fh))
                wx = np.asarray(right) * (fw * 0.28)
                wo = x0 + np.asarray(right) * (fw * 0.36) \
                    + [0, y0 + fh * 0.25, 0] + nrm * 0.02
                panel(glass, wo, wx * 2.0 / 2.6 * 1.3, [0, fh * 0.5, 0], 2, 2,
                      uscale=(1, 1))
                # Sill + lintel trim bars.
                c = x0 + np.asarray(right) * (fw * 0.5) + nrm * 0.08
                box(trim, c + [0, y0 + fh * 0.22, 0],
                    np.abs(np.asarray(right)) * fw * 0.6 + [0, 0.1, 0]
                    + np.abs(nrm) * 0.18, sub=1)
                if f > 0 and b % 2 == rng.integers(0, 2):
                    # Balcony slab + rail posts.
                    box(trim, c + [0, y0 - 0.06, 0] + nrm * 0.35,
                        np.abs(np.asarray(right)) * fw * 0.8 + [0, 0.12, 0]
                        + np.abs(nrm) * 0.9, sub=sub)
                    for k in range(5):
                        post = c + np.asarray(right) * ((k - 2) * fw * 0.18) \
                            + nrm * 0.78 + [0, y0 + 0.45, 0]
                        box(trim, post, [0.06, 1.0, 0.06], sub=1)
        # Cornice.
        ext = np.asarray(right) * (bays_n * fw)
        box(trim, np.asarray(origin, np.float32) + ext * 0.5
            + [0, H + 0.15, 0] + nrm * 0.1,
            np.abs(ext) + [0.5, 0.3, 0.5] * np.abs(nrm) + [0, 0.3, 0],
            sub=sub)

    dbays = max(int(D / fw), 1)
    facade([0, 0, 0], [1, 0, 0], bays, True)                 # front (+z face)
    facade([W, 0, -D], [-1, 0, 0], bays, False)              # back
    facade([W, 0, 0], [0, 0, -1], dbays, False)              # right
    facade([0, 0, -D], [0, 0, 1], dbays, False)              # left
    # Roof: low pitched prism.
    rs = Soup()
    ridge_h = 1.8
    v = np.array([[0, H, 0], [W, H, 0], [W, H, -D], [0, H, -D],
                  [W / 2, H + ridge_h, -0.3], [W / 2, H + ridge_h, -D + 0.3]],
                 np.float32)
    tris = [(0, 1, 4), (2, 3, 5), (1, 2, 5), (1, 5, 4), (3, 0, 4), (3, 4, 5)]
    for t in tris:
        p = v[list(t)]
        n = np.cross(p[1] - p[0], p[2] - p[0])
        n = n / (np.linalg.norm(n) + 1e-9)
        uv = p[:, [0, 2]] * 0.3
        roof.add(p, np.tile(n, (3, 1)), uv, np.arange(3).reshape(1, 3))
    # Corner tower with dome on one corner.
    cylinder(wall, [W, 0, 0.6], 1.6, H + 1.2, seg=10 * sub, vsub=6 * sub,
             uscale=0.5)
    dome(roof, [W, H + 1.2, 0.6], 1.6, seg=10 * sub, rings=5 * sub)
    return {**soups, roof_mat: roof}


def tree_proto(rng, sub, bark_mat, leaf_mat):
    soups = {bark_mat: Soup(), leaf_mat: Soup()}
    trunk = soups[bark_mat]
    leaves = soups[leaf_mat]
    cylinder(trunk, [0, 0, 0], 0.22, 3.2, seg=8 * sub, vsub=4 * sub,
             taper=0.6)
    for k in range(3):
        a = k * 2.1 + rng.uniform(0, 0.5)
        c = np.array([np.cos(a) * 0.5, 2.2 + k * 0.4, np.sin(a) * 0.5])
        cylinder(trunk, c, 0.1, 1.4, seg=6, vsub=2, taper=0.4)
    ncards = 40 * sub
    for _ in range(ncards):
        c = np.array([rng.uniform(-1.6, 1.6), rng.uniform(3.0, 5.6),
                      rng.uniform(-1.6, 1.6)])
        if np.linalg.norm(c - [0, 4.3, 0]) > 2.1:
            continue
        a = rng.uniform(0, np.pi)
        du = np.array([np.cos(a), 0, np.sin(a)]) * rng.uniform(0.9, 1.5)
        dv = np.array([0, 1.0, 0]) * rng.uniform(0.9, 1.5)
        panel(leaves, c - du / 2 - dv / 2, du, dv, 1, 1)
    return soups


def lamp_proto(metal_mat, glow_mat):
    soups = {metal_mat: Soup(), glow_mat: Soup()}
    cylinder(soups[metal_mat], [0, 0, 0], 0.09, 3.4, seg=10, vsub=3,
             taper=0.7)
    box(soups[glow_mat], [0, 3.6, 0], [0.35, 0.5, 0.35], sub=1)
    box(soups[metal_mat], [0, 3.9, 0], [0.5, 0.1, 0.5], sub=1)
    return soups


def fountain_proto(stone_mat):
    soups = {stone_mat: Soup()}
    s = soups[stone_mat]
    cylinder(s, [0, 0, 0], 3.0, 0.8, seg=40, vsub=3)
    cylinder(s, [0, 0.8, 0], 0.5, 1.8, seg=16, vsub=4, taper=0.8)
    dome(s, [0, 2.8, 0], 0.9, seg=24, rings=8)
    return soups


# ---------------------------------------------------------------------------

def build(out_path: str, subdiv: int = 2, seed: int = 5):
    rng = np.random.default_rng(seed)
    g = GlbBuilder()
    tex = make_textures()
    t = {name: g.add_image(img, name) for name, img in tex.items()}

    m_plaster = g.add_material("plaster", (1, 1, 1, 1), 0.0, 0.85,
                               base_tex=t["plaster"],
                               normal_tex=t["plaster_n"])
    m_brick = g.add_material("brick", (1, 1, 1, 1), 0.0, 0.9,
                             base_tex=t["brick"], normal_tex=t["brick_n"])
    m_glass = g.add_material("glass", (0.25, 0.3, 0.35, 1), 0.9, 0.08)
    m_trim = g.add_material("trim", (0.85, 0.83, 0.78, 1), 0.0, 0.6)
    m_roof = g.add_material("roof", (1, 1, 1, 1), 0.0, 0.8,
                            base_tex=t["roof"])
    m_cobble = g.add_material("cobble", (1, 1, 1, 1), 0.0, 0.95,
                              base_tex=t["cobble"],
                              normal_tex=t["cobble_n"])
    m_leaf = g.add_material("leaf", (1, 1, 1, 1), 0.0, 0.9,
                            base_tex=t["leaf"], alpha_mode="MASK",
                            alpha_cutoff=0.5, double_sided=True)
    m_bark = g.add_material("bark", (1, 1, 1, 1), 0.0, 0.95,
                            base_tex=t["bark"])
    m_metal = g.add_material("metal", (1, 1, 1, 1), 0.6, 0.45,
                             base_tex=t["metal"])
    m_glow = g.add_material("glow", (1, 1, 1, 1), 0.0, 0.4,
                            emissive=(6.0, 5.2, 3.5))
    m_stone = g.add_material("stone", (0.75, 0.73, 0.7, 1), 0.0, 0.85)

    total = 0

    def emit(proto, name):
        nonlocal total
        meshes = []
        for mat, soup in proto.items():
            if soup.count == 0:
                continue
            p, n, uv, idx = soup.merged()
            meshes.append(g.add_mesh(p, n, uv, idx, mat,
                                     name=f"{name}_{mat}"))
            total += len(idx)
        return meshes

    # Building prototypes (instanced around the plaza).
    protos = []
    for i in range(4):
        wall = m_plaster if i % 2 == 0 else m_brick
        p = building_proto(rng, subdiv, floors=3 + i % 3, bays=4 + i % 3,
                           wall_mat=wall, glass_mat=m_glass, trim_mat=m_trim,
                           roof_mat=m_roof, arcade=(i % 2 == 0))
        protos.append(emit(p, f"building{i}"))

    tree_meshes = [emit(tree_proto(rng, subdiv, m_bark, m_leaf), f"tree{i}")
                   for i in range(2)]
    lamp_meshes = emit(lamp_proto(m_metal, m_glow), "lamp")
    fountain_meshes = emit(fountain_proto(m_stone), "fountain")

    # Ground.
    gr = Soup()
    v, uv, idx = grid(48 * subdiv, 48 * subdiv)
    p = np.stack([(v[:, 0] - 0.5) * 90, np.zeros(len(v)),
                  (v[:, 1] - 0.5) * 90], -1)
    gr.add(p, np.tile([0, 1, 0], (len(p), 1)), uv * 45, idx)
    ground_meshes = emit({m_cobble: gr}, "ground")

    def place(meshes, pos, rot_y=0.0, name=""):
        q = (0.0, float(np.sin(rot_y / 2)), 0.0, float(np.cos(rot_y / 2)))
        for mi in meshes:
            g.add_node(mi, translation=pos, rotation=q, name=name)

    for mi in ground_meshes:
        g.add_node(mi, name="ground")
    for mi in fountain_meshes:
        g.add_node(mi, name="fountain")

    # Street: buildings along 4 sides of the plaza (instancing prototypes).
    slots = []
    for k in range(4):
        slots += [(-32 + 17 * k, -34, 0.0), (-32 + 17 * k, 34, np.pi)]
    for k in range(3):
        slots += [(-34, -24 + 17 * k, np.pi / 2),
                  (34, -24 + 17 * k, -np.pi / 2)]
    for i, (x, z, ry) in enumerate(slots):
        place(protos[i % len(protos)], (x, 0, z), ry, f"bld{i}")

    for i in range(16):
        a = i / 16 * 2 * np.pi
        r = 24 + (i % 3) * 3
        place(tree_meshes[i % 2],
              (float(np.cos(a) * r), 0, float(np.sin(a) * r)),
              float(rng.uniform(0, np.pi)), f"tree{i}")
    for i in range(12):
        a = (i + 0.5) / 12 * 2 * np.pi
        place(lamp_meshes, (float(np.cos(a) * 14), 0, float(np.sin(a) * 14)),
              0.0, f"lamp{i}")

    g.save(out_path)
    size = os.path.getsize(out_path) / 1e6
    print(f"wrote {out_path}: {total} unique tris, {len(g.nodes)} nodes, "
          f"{size:.1f} MB")
    return total


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "assets/city.glb"
    sub = 2
    if "--subdiv" in sys.argv:
        sub = int(sys.argv[sys.argv.index("--subdiv") + 1])
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    build(out, subdiv=sub)

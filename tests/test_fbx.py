"""FBX importer: ASCII FBX 7.x array payloads, ByPolygon layer mapping,
material slot ordering from per-model connection order, and a binary
round-trip built from the documented record layout."""

import struct
import zlib

import numpy as np

from basicrenderer_tpu.models.fbx import load_fbx, _read_ascii
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.scene.components import Renderable


ASCII_FBX7 = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
\tFBXVersion: 7400
}
Objects:  {
\tGeometry: 140, "Geometry::quadpair", "Mesh" {
\t\tVertices: *18 {
\t\t\ta: 0,0,0, 1,0,0, 1,1,0, 0,1,0, 2,0,0, 2,1,0
\t\t}
\t\tPolygonVertexIndex: *8 {
\t\t\ta: 0,1,2,-4, 1,4,5,-3
\t\t}
\t\tLayerElementNormal: 0 {
\t\t\tVersion: 102
\t\t\tMappingInformationType: "ByPolygon"
\t\t\tReferenceInformationType: "Direct"
\t\t\tNormals: *6 {
\t\t\t\ta: 0,0,1, 0,1,0
\t\t\t}
\t\t}
\t\tLayerElementMaterial: 0 {
\t\t\tVersion: 101
\t\t\tMappingInformationType: "ByPolygon"
\t\t\tReferenceInformationType: "IndexToDirect"
\t\t\tMaterials: *2 {
\t\t\t\ta: 0,1
\t\t\t}
\t\t}
\t}
\tModel: 100, "Model::quadpair", "Mesh" {
\t\tVersion: 232
\t\tProperties70:  {
\t\t\tP: "Lcl Translation", "Lcl Translation", "", "A",1,2,3
\t\t}
\t}
\tMaterial: 200, "Material::red", "" {
\t\tVersion: 102
\t\tProperties70:  {
\t\t\tP: "DiffuseColor", "Color", "", "A",1,0,0
\t\t}
\t}
\tMaterial: 201, "Material::blue", "" {
\t\tVersion: 102
\t\tProperties70:  {
\t\t\tP: "DiffuseColor", "Color", "", "A",0,0,1
\t\t}
\t}
}
Connections:  {
\tC: "OO",140,100
\tC: "OO",{MAT_A},100
\tC: "OO",{MAT_B},100
}
"""


def _load_ascii(tmp_path, mat_order=("200", "201")):
    txt = ASCII_FBX7.replace("{MAT_A}", mat_order[0]).replace(
        "{MAT_B}", mat_order[1])
    p = str(tmp_path / "scene.fbx")
    with open(p, "w") as f:
        f.write(txt)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_fbx(p, sc, meshes, mats)
    return sc, meshes, mats


def test_ascii_fbx7_arrays_parse():
    """The `a:` payload folds into the enclosing array node's props."""
    root = _read_ascii(ASCII_FBX7.replace("{MAT_A}", "200")
                       .replace("{MAT_B}", "201"))
    geom = root.find("Objects").find("Geometry")
    v = geom.prop_array("Vertices")
    assert v is not None and v.size == 18
    pvi = geom.prop_array("PolygonVertexIndex")
    assert pvi is not None and list(pvi[:4]) == [0, 1, 2, -4]


def test_ascii_fbx7_geometry_loads(tmp_path):
    sc, meshes, mats = _load_ascii(tmp_path)
    # Two quads split across two material slots -> two meshes, 2 tris each.
    assert len(meshes) == 2
    total = sum(meshes.get(i).num_triangles for i in range(len(meshes)))
    assert total == 4
    # Lcl Translation survives into the node transform.
    ents = [e for e, _ in sc.world.query(Renderable)]
    assert len(ents) == 2


def test_ascii_fbx7_bypolygon_normals(tmp_path):
    sc, meshes, mats = _load_ascii(tmp_path)
    # Polygon 0 -> normal (0,0,1); polygon 1 -> (0,1,0). Material slot 0
    # holds polygon 0's triangles, slot 1 polygon 1's.
    by_slot = {}
    for i in range(len(meshes)):
        md = meshes.get(i)
        slot = int(md.name.rsplit(".", 1)[-1]) if "." in md.name else 0
        by_slot[slot] = md
    assert np.allclose(by_slot[0].normals, [0, 0, 1])
    assert np.allclose(by_slot[1].normals, [0, 1, 0])


def test_material_slot_order_follows_connections(tmp_path):
    ents_mats = []
    for order in (("200", "201"), ("201", "200")):
        sc, meshes, mats = _load_ascii(tmp_path, order)
        slot_color = {}
        for e, (r,) in sc.world.query(Renderable):
            md = meshes.get(r.mesh_id)
            slot = int(md.name.rsplit(".", 1)[-1]) if "." in md.name else 0
            slot_color[slot] = mats.get(r.material_id).base_color[:3]
        ents_mats.append(slot_color)
    # red connected first -> slot 0 red; reversed -> slot 0 blue.
    assert np.allclose(ents_mats[0][0], [1, 0, 0])
    assert np.allclose(ents_mats[0][1], [0, 0, 1])
    assert np.allclose(ents_mats[1][0], [0, 0, 1])
    assert np.allclose(ents_mats[1][1], [1, 0, 0])


# --------------------------------------------------------------------------
# Binary FBX fixture (records written from the documented layout)
# --------------------------------------------------------------------------

def _bin_prop(v):
    if isinstance(v, str):
        b = v.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(v, int):
        return b"L" + struct.pack("<q", v)
    if isinstance(v, float):
        return b"D" + struct.pack("<d", v)
    if isinstance(v, np.ndarray):
        t = {np.dtype(np.int32): b"i", np.dtype(np.float64): b"d",
             np.dtype(np.int64): b"l"}[v.dtype]
        comp = zlib.compress(v.tobytes())
        return t + struct.pack("<III", v.size, 1, len(comp)) + comp
    raise TypeError(v)


def _build_binary_fbx():
    ver = 7400
    header = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", ver)

    def node(name, props, child_fns=()):
        """Build at an absolute offset; record header is 13 bytes
        (<III end,nprops,plen> + <B nlen>) for version < 7500."""
        def build(offset):
            nb = name.encode()
            pb = b"".join(_bin_prop(p) for p in props)
            inner_off = offset + 13 + len(nb) + len(pb)
            children = b""
            for fn in child_fns:
                children += fn(inner_off + len(children))
            term = b"\x00" * 13 if child_fns else b""
            end = offset + 13 + len(nb) + len(pb) + len(children) + len(term)
            hdr = struct.pack("<III", end, len(props), len(pb))
            return hdr + bytes([len(nb)]) + nb + pb + children + term
        return build

    verts = np.array([0, 0, 0, 1, 0, 0, 0, 1, 0], np.float64)
    pvi = np.array([0, 1, -3], np.int32)
    geo = node("Geometry", [140, "Geometry::tri\x00\x01Geometry", "Mesh"], (
        node("Vertices", [verts]),
        node("PolygonVertexIndex", [pvi]),
    ))
    model = node("Model", [100, "Model::tri\x00\x01Model", "Mesh"], (
        node("Version", [232]),
    ))
    objects = node("Objects", [], (geo, model))
    conns = node("Connections", [], (
        node("C", ["OO", 140, 100]),
    ))
    out = header
    out += objects(len(out))
    out += conns(len(out))
    out += b"\x00" * 13
    return out


def test_binary_fbx_loads(tmp_path):
    p = str(tmp_path / "tri.fbx")
    with open(p, "wb") as f:
        f.write(_build_binary_fbx())
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_fbx(p, sc, meshes, mats)
    assert len(meshes) == 1
    md = meshes.get(0)
    assert md.num_triangles == 1
    assert np.allclose(md.positions[:, :2].max(0), [1, 1])


ASCII_FBX_ANIM = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
\tFBXVersion: 7400
}
Objects:  {
\tGeometry: 140, "Geometry::tri", "Mesh" {
\t\tVertices: *9 {
\t\t\ta: 0,0,0, 1,0,0, 0,1,0
\t\t}
\t\tPolygonVertexIndex: *3 {
\t\t\ta: 0,1,-3
\t\t}
\t}
\tModel: 100, "Model::tri", "Mesh" {
\t\tVersion: 232
\t\tProperties70:  {
\t\t\tP: "Lcl Translation", "Lcl Translation", "", "A",1,0,0
\t\t}
\t}
\tAnimationStack: 500, "AnimStack::walk", "" {
\t}
\tAnimationLayer: 510, "AnimLayer::base", "" {
\t}
\tAnimationCurveNode: 520, "AnimCurveNode::T", "" {
\t\tProperties70:  {
\t\t\tP: "d|X", "Number", "", "A",1
\t\t\tP: "d|Y", "Number", "", "A",0
\t\t\tP: "d|Z", "Number", "", "A",0
\t\t}
\t}
\tAnimationCurveNode: 530, "AnimCurveNode::R", "" {
\t}
\tAnimationCurve: 540, "AnimCurve::", "" {
\t\tKeyTime: *2 {
\t\t\ta: 0,92372316000
\t\t}
\t\tKeyValueFloat: *2 {
\t\t\ta: 1,5
\t\t}
\t}
\tAnimationCurve: 550, "AnimCurve::", "" {
\t\tKeyTime: *2 {
\t\t\ta: 0,92372316000
\t\t}
\t\tKeyValueFloat: *2 {
\t\t\ta: 0,90
\t\t}
\t}
}
Connections:  {
\tC: "OO",140,100
\tC: "OO",520,510
\tC: "OO",530,510
\tC: "OO",510,500
\tC: "OP",540,520,"d|X"
\tC: "OP",550,530,"d|Z"
\tC: "OP",520,100,"Lcl Translation"
\tC: "OP",530,100,"Lcl Rotation"
}
"""


def test_fbx_animation_curves(tmp_path):
    """AnimationStack import: T curve on X (1 -> 5 over 2 s, Y/Z from the
    curve-node defaults) and an R curve on Z (0 -> 90 deg) drive the
    model's Position/Rotation through NodeAnimation.apply."""
    from basicrenderer_tpu.scene.components import Position, Rotation
    p = str(tmp_path / "anim.fbx")
    with open(p, "w") as f:
        f.write(ASCII_FBX_ANIM)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    out = load_fbx(p, sc, meshes, mats)
    clips = out["clips"]
    assert len(clips) == 1
    clip = clips[0]
    assert clip.name == "walk"
    assert abs(clip.duration - 2.0) < 1e-6
    ents = {tr.entity for tr in clip.tracks}
    assert len(ents) == 1
    ent = next(iter(ents))
    paths = {ch.path for tr in clip.tracks for ch in tr.channels}
    assert paths == {"translation", "rotation"}

    clip.apply(sc, 0.0)
    pos = sc.world.get(ent, Position)
    np.testing.assert_allclose(pos.value, [1, 0, 0], atol=1e-6)
    clip.apply(sc, 1.0)          # halfway: x = 3, rz = 45 deg
    pos = sc.world.get(ent, Position)
    np.testing.assert_allclose(pos.value, [3, 0, 0], atol=1e-5)
    rot = sc.world.get(ent, Rotation)
    np.testing.assert_allclose(
        rot.value, [0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)], atol=2e-2)
    clip.apply(sc, 2.0)
    pos = sc.world.get(ent, Position)
    np.testing.assert_allclose(pos.value, [1, 0, 0], atol=1e-5)  # looped
    clip.apply(sc, 1.999999, loop=False)
    pos = sc.world.get(ent, Position)
    np.testing.assert_allclose(pos.value, [5, 0, 0], atol=1e-4)
    sc.propagate_transforms()    # downstream consumers see the new TRS

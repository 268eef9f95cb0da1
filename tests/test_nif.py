"""NIF (NetImmerse/Gamebryo) importer: binary container round-trip.

Reference analogue: the NIF import path (NifLoader.cpp:12-40 +
BRNiflyClient.cpp — reference converts via an external process; this
framework parses the container directly). Contracts tested: geometry +
hierarchy + transform round-trip, shader -> material mapping, strips
de-stripping, unknown-block skipping via the header size table, and
load_model dispatch.
"""

import numpy as np
import pytest

from basicrenderer_tpu.models.importers import load_model
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.models import nif as nifmod
from basicrenderer_tpu.scene.components import Renderable, WorldMatrix
from basicrenderer_tpu.scene.scene import Scene


def _quad(z=0.0):
    verts = np.array([[0, 0, z], [1, 0, z], [1, 1, z], [0, 1, z]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    normals = np.tile([0, 0, 1], (4, 1)).astype(np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return verts, tris, normals, uvs


def test_nif_roundtrip_geometry(tmp_path):
    v, t, n, uv = _quad()
    p = str(tmp_path / "m.nif")
    nifmod.write_nif(p, [dict(name="Quad", vertices=v, triangles=t,
                              normals=n, uvs=uv, translation=(1, 2, 3),
                              glossiness=500.0)])
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    out = load_model(p, sc, meshes, mats)
    assert len(out["entities"]) >= 2
    mesh = meshes.get(0)
    np.testing.assert_allclose(mesh.positions, v, atol=1e-6)
    np.testing.assert_array_equal(mesh.indices, t)
    np.testing.assert_allclose(mesh.normals, n, atol=1e-6)
    np.testing.assert_allclose(mesh.uvs, uv, atol=1e-6)
    # Transform landed on the renderable node.
    sc.propagate_transforms()
    rend = [e for e, _ in sc.world.query(Renderable)]
    wm = sc.world.get(rend[0], WorldMatrix).value
    np.testing.assert_allclose(wm[:3, 3], [1, 2, 3], atol=1e-5)
    # Shader glossiness mapped to a shiny (low) roughness, < default.
    m = mats.get(1)
    assert m.roughness < 0.35


def test_nif_unknown_blocks_skipped(tmp_path):
    v, t, n, uv = _quad()
    p = str(tmp_path / "u.nif")
    nifmod.write_nif(p, [dict(name="Quad", vertices=v, triangles=t,
                              normals=n, uvs=uv)],
                     extra_unknown_block=True)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_model(p, sc, meshes, mats)
    assert meshes.get(0).num_triangles == 2


def test_nif_two_shapes_share_root(tmp_path):
    v, t, n, uv = _quad()
    p = str(tmp_path / "two.nif")
    nifmod.write_nif(p, [
        dict(name="A", vertices=v, triangles=t, normals=n, uvs=uv),
        dict(name="B", vertices=v + 2.0, triangles=t, normals=n, uvs=uv,
             translation=(0, 5, 0)),
    ])
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_model(p, sc, meshes, mats)
    assert len(meshes) == 2
    rend = [e for e, _ in sc.world.query(Renderable)]
    assert len(rend) == 2


def test_nif_strips_destripped():
    """NiTriStripsData strips unroll to triangles with alternating winding
    and degenerate stitches dropped."""
    w = nifmod._W()
    # NiGeometryData prefix: 4 verts, no normals/colors/uvs.
    w.i32(0)            # group id
    w.u16(4)            # num vertices
    w.u8(0)
    w.u8(0)
    w.u8(1)             # has vertices
    w.f32s(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                    np.float32).reshape(-1))
    w.u16(0)            # vector flags
    w.u32(0)            # material CRC
    w.u8(0)             # no normals
    w.f32s(np.zeros(3, np.float32))
    w.f32(1.0)
    w.u8(0)             # no colors
    w.u16(0)            # consistency
    w.i32(-1)           # additional data
    # strips: one strip 0,1,2,3 plus a degenerate pair
    w.u16(2)            # num triangles
    w.u16(1)            # num strips
    w.u16(6)
    w.u8(1)             # has points
    w.u16s(np.array([0, 1, 2, 3, 3, 3], np.uint16))
    r = nifmod._R(bytes(w.b))
    g = nifmod._read_tri_strips_data(r, [])
    assert g.triangles.shape[0] == 2          # degenerates dropped
    np.testing.assert_array_equal(g.triangles[0], [0, 1, 2])
    np.testing.assert_array_equal(g.triangles[1], [1, 3, 2])  # odd: swapped


def test_nif_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.nif")
    open(p, "wb").write(b"not a nif at all\n\x00\x00")
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    with pytest.raises(ValueError, match="not a NIF"):
        load_model(p, sc, meshes, mats)


def test_nif_version_gate(tmp_path):
    p = str(tmp_path / "old.nif")
    data = b"NetImmerse File Format, Version 4.0.0.2\n" + \
        (0x04000002).to_bytes(4, "little") + b"\x01" + b"\x00" * 16
    open(p, "wb").write(data)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    with pytest.raises(ValueError, match="unsupported NIF version"):
        load_model(p, sc, meshes, mats)

"""Binary USD crate (.usdc/.usdz) reader+writer round trip
(reference: USDLoader.cpp loads these through the USD SDK)."""

import numpy as np
import pytest

from basicrenderer_tpu.models.importers import load_model
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshData, MeshRegistry
from basicrenderer_tpu.models.usdc import (
    CrateError, UsdPrim, export_meshes_usdc, read_usdc, save_usdc,
    save_usdz)
from basicrenderer_tpu.scene.scene import Scene


def _quad_prims():
    pts = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                     np.float32)
    return [
        UsdPrim("/World", "Xform"),
        UsdPrim("/World/Red", "Material", attrs={
            "inputs:diffuseColor": np.asarray([[0.9, 0.1, 0.1]], np.float32),
            "inputs:metallic": 0.0,
            "inputs:roughness": 0.4,
        }),
        UsdPrim("/World/quad", "Mesh", attrs={
            "points": pts,
            "faceVertexIndices": np.asarray([0, 2, 1, 0, 3, 2], np.int32),
            "faceVertexCounts": np.asarray([3, 3], np.int32),
            "primvars:st": np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]],
                                      np.float32),
            "xformOp:transform": np.asarray(
                [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
                 [0.5, 0, 0, 1]], np.float64),   # row-vector translate +x
        }, rels={"material:binding": "/World/Red"}),
    ]


def test_crate_round_trip(tmp_path):
    p = str(tmp_path / "scene.usdc")
    save_usdc(p, _quad_prims())
    with open(p, "rb") as f:
        data = f.read()
    assert data[:8] == b"PXR-USDC"
    back = {pr.path: pr for pr in read_usdc(data)}
    assert back["/World"].type_name == "Xform"
    quad = back["/World/quad"]
    assert quad.type_name == "Mesh"
    np.testing.assert_allclose(quad.attrs["points"],
                               _quad_prims()[2].attrs["points"])
    np.testing.assert_array_equal(quad.attrs["faceVertexIndices"],
                                  [0, 2, 1, 0, 3, 2])
    np.testing.assert_allclose(quad.attrs["xformOp:transform"][3, 0], 0.5)
    assert quad.rels["material:binding"] == "/World/Red"
    mat = back["/World/Red"]
    np.testing.assert_allclose(np.asarray(mat.attrs["inputs:diffuseColor"]
                                          ).reshape(-1), [0.9, 0.1, 0.1],
                               rtol=1e-6)
    assert mat.attrs["inputs:roughness"] == pytest.approx(0.4)


def test_usdc_loads_into_scene(tmp_path):
    p = str(tmp_path / "scene.usdc")
    save_usdc(p, _quad_prims())
    meshes, mats = MeshRegistry(), MaterialRegistry()
    sc = Scene()
    load_model(p, sc, meshes, mats)
    assert len(meshes) == 1
    md = meshes.get(0)
    assert md.positions.shape == (4, 3)
    assert md.indices.shape == (2, 3)
    m = mats.get(1)
    assert abs(float(m.base_color[0]) - 0.9) < 1e-5
    assert abs(m.roughness - 0.4) < 1e-5
    # Transform landed on the node: world position of the mesh node is +x.
    sc.propagate_transforms()


def test_usdz_zip_container(tmp_path):
    p = str(tmp_path / "scene.usdz")
    save_usdz(p, _quad_prims())
    meshes, mats = MeshRegistry(), MaterialRegistry()
    sc = Scene()
    load_model(p, sc, meshes, mats)
    assert len(meshes) == 1
    assert meshes.get(0).indices.shape == (2, 3)


def test_export_meshes_round_trip(tmp_path):
    meshes = MeshRegistry()
    tri = MeshData(
        positions=np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.asarray([[0, 0, 1]] * 3, np.float32),
        uvs=np.zeros((3, 2), np.float32),
        indices=np.asarray([[0, 1, 2]], np.int32))
    meshes.add(tri)
    mats = MaterialRegistry()
    p = str(tmp_path / "export.usdc")
    M = np.eye(4)
    M[:3, 3] = [2.0, 0.0, 0.0]
    export_meshes_usdc(p, meshes, mats, instances=[(0, 0, M)])
    meshes2, mats2 = MeshRegistry(), MaterialRegistry()
    sc = Scene()
    load_model(p, sc, meshes2, mats2)
    assert len(meshes2) == 1
    np.testing.assert_allclose(meshes2.get(0).positions, tri.positions)


def test_future_crate_rejected(tmp_path):
    p = tmp_path / "new.usdc"
    p.write_bytes(b"PXR-USDC" + bytes([0, 10, 0]) + bytes(77))
    with pytest.raises(CrateError, match="newer"):
        from basicrenderer_tpu.models.usdc import load_usdc
        load_usdc(str(p), Scene(), MeshRegistry(), MaterialRegistry())


def test_legacy_crate_round_trip(tmp_path):
    """The pre-0.4.0 uncompressed layout still writes and reads."""
    p = str(tmp_path / "legacy.usdc")
    save_usdc(p, _quad_prims(), version=(0, 0, 1))
    with open(p, "rb") as f:
        data = f.read()
    assert tuple(data[8:11]) == (0, 0, 1)
    back = {pr.path: pr for pr in read_usdc(data)}
    quad = back["/World/quad"]
    np.testing.assert_allclose(quad.attrs["points"],
                               _quad_prims()[2].attrs["points"])
    assert quad.rels["material:binding"] == "/World/Red"


def test_modern_crate_compressed_sections(tmp_path):
    """The default (0.8.0) writer emits lz4-compressed structural sections
    and compressed arrays, and the reader decodes them (reference:
    USDLoader.cpp loads any pxr-era stage through the SDK)."""
    rng = np.random.default_rng(3)
    # Big enough arrays to hit every compressed-array form: ints (delta
    # codec), integral floats ('i' form), low-cardinality floats ('t' LUT).
    idx = np.repeat(np.arange(300, dtype=np.int32), 3)[:900]
    f_int = np.arange(100, dtype=np.float32)
    f_lut = np.tile(np.asarray([0.25, 0.5, 1.0], np.float32), 40)
    f_raw = rng.normal(size=64).astype(np.float32)
    prims = [UsdPrim("/W", "Xform"), UsdPrim("/W/m", "Mesh", attrs={
        "faceVertexIndices": idx,
        "f_int": f_int, "f_lut": f_lut, "f_raw": f_raw,
        "points": rng.normal(size=(32, 3)).astype(np.float32),
        "wide": np.arange(20, dtype=np.int64) * (1 << 33),
    })]
    p = str(tmp_path / "modern.usdc")
    save_usdc(p, prims)
    with open(p, "rb") as f:
        data = f.read()
    assert tuple(data[8:11]) == (0, 8, 0)
    back = {pr.path: pr for pr in read_usdc(data)}
    a = back["/W/m"].attrs
    np.testing.assert_array_equal(a["faceVertexIndices"], idx)
    np.testing.assert_allclose(a["f_int"], f_int)
    np.testing.assert_allclose(a["f_lut"], f_lut)
    np.testing.assert_allclose(a["f_raw"], f_raw)
    np.testing.assert_array_equal(a["wide"], prims[1].attrs["wide"])
    assert back["/W"].type_name == "Xform"


def test_modern_crate_scene_load(tmp_path):
    p = str(tmp_path / "scene8.usdc")
    save_usdc(p, _quad_prims())           # 0.8.0 default
    meshes, mats = MeshRegistry(), MaterialRegistry()
    sc = Scene()
    load_model(p, sc, meshes, mats)
    assert len(meshes) == 1
    assert meshes.get(0).indices.shape == (2, 3)
    assert abs(float(mats.get(1).base_color[0]) - 0.9) < 1e-5


def test_value_rep_kinds(tmp_path):
    """Every value kind the writer emits survives the round trip."""
    prims = [UsdPrim("/P", "Xform", attrs={
        "f_inline": 0.25,
        "f_double": 0.1,              # not float-representable -> heap double
        "i_small": 7,
        "i_big": -3,                  # negative -> heap int64
        "tok": "hello",
        "tokvec": ["a", "b", "c"],
        "flag": True,
        "arr1": np.asarray([1.5, 2.5], np.float32),
        "arr3": np.asarray([[1, 2, 3]], np.float32),
        "arri": np.asarray([4, 5, 6], np.int32),
    })]
    p = str(tmp_path / "vals.usdc")
    save_usdc(p, prims)
    with open(p, "rb") as f:
        back = read_usdc(f.read())[0]
    a = back.attrs
    assert a["f_inline"] == 0.25
    assert a["f_double"] == pytest.approx(0.1, abs=0)
    assert a["i_small"] == 7 and a["i_big"] == -3
    assert a["tok"] == "hello" and a["tokvec"] == ["a", "b", "c"]
    assert a["flag"] is True
    np.testing.assert_allclose(a["arr1"], [1.5, 2.5])
    np.testing.assert_allclose(a["arr3"], [[1, 2, 3]])
    np.testing.assert_array_equal(a["arri"], [4, 5, 6])

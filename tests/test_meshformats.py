"""PLY/STL readers: binary PLY with list properties inside the vertex
element, face list selected by property name."""

import struct

import numpy as np

from basicrenderer_tpu.models.meshformats import load_ply, load_stl
from basicrenderer_tpu.models.materials import MaterialRegistry
from basicrenderer_tpu.models.mesh import MeshRegistry
from basicrenderer_tpu.scene.scene import Scene
from basicrenderer_tpu.scene.components import Renderable


def _mesh_of(sc, meshes):
    (e, (r,)), = sc.world.query(Renderable)
    return meshes.get(r.mesh_id)


def test_binary_ply_vertex_with_list_property(tmp_path):
    """Vertex elements carrying a list property (e.g. vertex texcoords as
    a list) must still collect the scalar x/y/z columns."""
    hdr = (b"ply\nformat binary_little_endian 1.0\n"
           b"element vertex 3\n"
           b"property float x\nproperty float y\nproperty float z\n"
           b"property list uchar float texcoord\n"
           b"element face 1\n"
           b"property list uchar int vertex_indices\n"
           b"end_header\n")
    body = b""
    for p in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
        body += struct.pack("<fff", *p)
        body += struct.pack("<B", 2) + struct.pack("<ff", 0.5, 0.5)
    body += struct.pack("<B", 3) + struct.pack("<iii", 0, 1, 2)
    p = str(tmp_path / "tri.ply")
    with open(p, "wb") as f:
        f.write(hdr + body)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_ply(p, sc, meshes, mats)
    md = _mesh_of(sc, meshes)
    assert md.num_triangles == 1
    assert np.allclose(sorted(md.positions[:, 0]), [0, 0, 1])


def test_binary_ply_face_extra_list_property(tmp_path):
    """A face element with a second list property after vertex_indices must
    still bind the face to vertex_indices, not the last list read."""
    hdr = (b"ply\nformat binary_little_endian 1.0\n"
           b"element vertex 3\n"
           b"property float x\nproperty float y\nproperty float z\n"
           b"element face 1\n"
           b"property list uchar int vertex_indices\n"
           b"property list uchar float texcoord\n"
           b"end_header\n")
    body = b""
    for p in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
        body += struct.pack("<fff", *p)
    body += struct.pack("<B", 3) + struct.pack("<iii", 0, 1, 2)
    body += struct.pack("<B", 6) + struct.pack("<6f", *([0.25] * 6))
    p = str(tmp_path / "tri2.ply")
    with open(p, "wb") as f:
        f.write(hdr + body)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_ply(p, sc, meshes, mats)
    md = _mesh_of(sc, meshes)
    assert md.num_triangles == 1
    assert list(md.indices.ravel()) == [0, 1, 2]


def test_ascii_ply_quad(tmp_path):
    txt = ("ply\nformat ascii 1.0\n"
           "element vertex 4\n"
           "property float x\nproperty float y\nproperty float z\n"
           "element face 1\n"
           "property list uchar int vertex_indices\n"
           "end_header\n"
           "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
           "4 0 1 2 3\n")
    p = str(tmp_path / "quad.ply")
    with open(p, "w") as f:
        f.write(txt)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_ply(p, sc, meshes, mats)
    md = _mesh_of(sc, meshes)
    assert md.num_triangles == 2


def test_binary_stl(tmp_path):
    hdr = b"\x00" * 80 + struct.pack("<I", 1)
    tri = struct.pack("<12f", 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0) + b"\x00\x00"
    p = str(tmp_path / "t.stl")
    with open(p, "wb") as f:
        f.write(hdr + tri)
    sc, meshes, mats = Scene(), MeshRegistry(), MaterialRegistry()
    load_stl(p, sc, meshes, mats)
    md = _mesh_of(sc, meshes)
    assert md.num_triangles == 1
    assert np.allclose(md.normals, [0, 0, 1])

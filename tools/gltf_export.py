"""Minimal glTF 2.0 binary (.glb) exporter + PNG encoder.

Used by tools/make_city.py to author the real-content benchmark asset
through the SAME interchange format the reference's own loader is built
around (reference: BasicRenderer/src/Import/GlTFLoader.cpp) — the file is
then ingested by basicrenderer_tpu.models.importers.load_gltf, proving the
import path on non-procedural-registry content (binary buffers, embedded
PNG textures, alpha-MASK materials, node hierarchy).

No external dependencies: PNG encoding is stdlib zlib, GLB packing is
struct. Not a general-purpose exporter — exactly the features the asset
needs.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import List, Optional

import numpy as np


def encode_png(rgba: np.ndarray) -> bytes:
    """(H, W, 4) uint8 -> PNG bytes (RGBA8, zlib default compression)."""
    h, w, c = rgba.shape
    assert c == 4 and rgba.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


class GlbBuilder:
    def __init__(self):
        self.buffers: List[bytes] = []
        self.buffer_views: List[dict] = []
        self.accessors: List[dict] = []
        self.meshes: List[dict] = []
        self.materials: List[dict] = []
        self.images: List[dict] = []
        self.textures: List[dict] = []
        self.nodes: List[dict] = []
        self.roots: List[int] = []
        self._off = 0

    # -- binary data -------------------------------------------------------
    def _add_view(self, data: bytes, target: Optional[int] = None) -> int:
        pad = (-len(data)) % 4
        view = {"buffer": 0, "byteOffset": self._off, "byteLength": len(data)}
        if target is not None:
            view["target"] = target
        self.buffers.append(data + b"\x00" * pad)
        self._off += len(data) + pad
        self.buffer_views.append(view)
        return len(self.buffer_views) - 1

    def _add_accessor(self, arr: np.ndarray, gl_type: str,
                      component: int, target: int) -> int:
        view = self._add_view(np.ascontiguousarray(arr).tobytes(), target)
        acc = {"bufferView": view, "componentType": component,
               "count": int(arr.shape[0]), "type": gl_type}
        if gl_type == "VEC3" and component == 5126:
            acc["min"] = [float(x) for x in arr.min(0)]
            acc["max"] = [float(x) for x in arr.max(0)]
        self.accessors.append(acc)
        return len(self.accessors) - 1

    # -- content -----------------------------------------------------------
    def add_image(self, rgba: np.ndarray, name: str = "") -> int:
        """Embed an (H, W, 4) uint8 image as PNG; returns TEXTURE index."""
        view = self._add_view(encode_png(rgba))
        self.images.append({"bufferView": view, "mimeType": "image/png",
                            "name": name})
        self.textures.append({"source": len(self.images) - 1})
        return len(self.textures) - 1

    def add_material(self, name: str, base_color=(1, 1, 1, 1), metallic=0.0,
                     roughness=0.9, emissive=(0, 0, 0), base_tex=-1,
                     normal_tex=-1, mr_tex=-1, alpha_mode: str = "OPAQUE",
                     alpha_cutoff: float = 0.5,
                     double_sided: bool = False) -> int:
        pbr = {"baseColorFactor": list(map(float, base_color)),
               "metallicFactor": float(metallic),
               "roughnessFactor": float(roughness)}
        if base_tex >= 0:
            pbr["baseColorTexture"] = {"index": base_tex}
        if mr_tex >= 0:
            pbr["metallicRoughnessTexture"] = {"index": mr_tex}
        m = {"name": name, "pbrMetallicRoughness": pbr,
             "emissiveFactor": list(map(float, emissive))}
        if normal_tex >= 0:
            m["normalTexture"] = {"index": normal_tex}
        if alpha_mode != "OPAQUE":
            m["alphaMode"] = alpha_mode
            if alpha_mode == "MASK":
                m["alphaCutoff"] = float(alpha_cutoff)
        if double_sided:
            m["doubleSided"] = True
        self.materials.append(m)
        return len(self.materials) - 1

    def add_mesh(self, positions: np.ndarray, normals: np.ndarray,
                 uvs: np.ndarray, indices: np.ndarray, material: int,
                 name: str = "") -> int:
        prim = {
            "attributes": {
                "POSITION": self._add_accessor(
                    positions.astype(np.float32), "VEC3", 5126, 34962),
                "NORMAL": self._add_accessor(
                    normals.astype(np.float32), "VEC3", 5126, 34962),
                "TEXCOORD_0": self._add_accessor(
                    uvs.astype(np.float32), "VEC2", 5126, 34962),
            },
            "indices": self._add_accessor(
                indices.astype(np.uint32).reshape(-1), "SCALAR", 5125, 34963),
            "material": material,
        }
        self.meshes.append({"name": name, "primitives": [prim]})
        return len(self.meshes) - 1

    def add_node(self, mesh: int = -1, translation=(0, 0, 0),
                 rotation=(0, 0, 0, 1), scale=(1, 1, 1), name: str = "",
                 root: bool = True) -> int:
        node = {"name": name}
        if mesh >= 0:
            node["mesh"] = mesh
        if tuple(translation) != (0, 0, 0):
            node["translation"] = list(map(float, translation))
        if tuple(rotation) != (0, 0, 0, 1):
            node["rotation"] = list(map(float, rotation))
        if tuple(scale) != (1, 1, 1):
            node["scale"] = list(map(float, scale))
        self.nodes.append(node)
        idx = len(self.nodes) - 1
        if root:
            self.roots.append(idx)
        return idx

    # -- output ------------------------------------------------------------
    def save(self, path: str) -> None:
        binary = b"".join(self.buffers)
        gltf = {
            "asset": {"version": "2.0", "generator": "basicrenderer_tpu"},
            "buffers": [{"byteLength": len(binary)}],
            "bufferViews": self.buffer_views,
            "accessors": self.accessors,
            "meshes": self.meshes,
            "materials": self.materials,
            "nodes": self.nodes,
            "scenes": [{"nodes": self.roots}],
            "scene": 0,
        }
        if self.images:
            gltf["images"] = self.images
            gltf["textures"] = self.textures
            gltf["samplers"] = [{}]
        js = json.dumps(gltf, separators=(",", ":")).encode()
        js += b" " * ((-len(js)) % 4)
        total = 12 + 8 + len(js) + 8 + len(binary)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(binary), 0x004E4942))
            f.write(binary)

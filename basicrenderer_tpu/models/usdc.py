"""Binary USD crate (.usdc) reader + writer, and .usdz (zip) packaging.

Reference analogue: USDLoader (reference: BasicRenderer/src/Import/
USDLoader.cpp) loads binary stages through the full USD SDK. That SDK is
not in this image, so this is a self-contained implementation of the
crate CONTAINER format — bootstrap header, table-of-contents, TOKENS /
STRINGS / FIELDS / FIELDSETS / PATHS / SPECS sections, 64-bit ValueRep
encoding (type | inline-bit | array-bit | 48-bit payload), and the
recursive path-tree encoding — targeting the uncompressed (pre-0.4.0)
section layouts. Files produced by modern pxr builds use lz4 + custom
integer compression in their sections; those are detected by version and
rejected with a clear message (re-export with
``USD_WRITE_NEW_USDC_FILES_AS_VERSION=0.0.1`` or as .usda). The writer
and reader here are exact inverses and are round-trip tested; .usdz is
the documented "zip with stored (uncompressed) entries" container.

Value model: each prim is a Spec (SpecType Prim) whose fieldset carries
``specifier`` and ``typeName``; each attribute is its own Spec (SpecType
Attribute) at ``<prim>.<name>`` with a ``default`` field; relationships
(``material:binding``) are Specs (SpecType Relationship) with a
``targetPaths`` path-list-op field. This mirrors how SdfData lays out a
flattened stage, which is what the scene builder below consumes.
"""

from __future__ import annotations

import dataclasses
import struct
import zipfile
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ..scene.scene import Scene
from .materials import Material, MaterialRegistry
from .mesh import MeshData, MeshRegistry, compute_normals

MAGIC = b"PXR-USDC"
_BOOTSTRAP = 88          # magic(8) + version(8) + tocOffset(8) + reserved(64)

# --- ValueRep type enums (crate data types; numbering follows the crate
# spec's table so reps stay recognizable in a hex dump) -------------------
T_BOOL, T_UCHAR, T_INT, T_UINT, T_INT64, T_UINT64 = 1, 2, 3, 4, 5, 6
T_HALF, T_FLOAT, T_DOUBLE, T_STRING, T_TOKEN, T_ASSET = 7, 8, 9, 10, 11, 12
T_VEC2F, T_VEC3F, T_VEC4F = 17, 21, 25
T_MATRIX4D = 30
T_PATH_LIST_OP = 40
T_TOKEN_VECTOR = 43
T_SPECIFIER = 44

_ARRAY_BIT = 1 << 63
_INLINE_BIT = 1 << 62
_PAYLOAD_MASK = (1 << 48) - 1

# SpecTypes (SdfSpecType values)
SPEC_ATTRIBUTE, SPEC_PRIM, SPEC_PSEUDO_ROOT, SPEC_RELATIONSHIP = 1, 6, 7, 8

# Specifier enum
SPECIFIER_DEF, SPECIFIER_OVER, SPECIFIER_CLASS = 0, 1, 2

_ARRAY_DTYPES = {
    T_INT: (np.int32, 1), T_UINT: (np.uint32, 1), T_FLOAT: (np.float32, 1),
    T_DOUBLE: (np.float64, 1), T_VEC2F: (np.float32, 2),
    T_VEC3F: (np.float32, 3), T_VEC4F: (np.float32, 4),
}


@dataclasses.dataclass
class UsdPrim:
    """Writer-side prim description: a typed prim plus typed attributes.

    attrs values: float / int / str(token) / np.ndarray (shape (N,),
    (N,2), (N,3), (N,4) float32 or (N,) int32, or (4,4) float64 matrix)
    / list[str] (token vector). rels values: target path strings.
    """
    path: str                      # e.g. "/World/quad"
    type_name: str                 # "Xform" | "Mesh" | "Material" | ...
    attrs: Dict[str, object] = dataclasses.field(default_factory=dict)
    rels: Dict[str, str] = dataclasses.field(default_factory=dict)


# =========================================================================
# Writer
# =========================================================================

class _CrateWriter:
    def __init__(self):
        self.tokens: List[str] = [""]
        self._tok_ix: Dict[str, int] = {"": 0}
        self.fields: List[Tuple[int, int]] = []        # (tokenIndex, rep)
        self._field_ix: Dict[Tuple[int, int], int] = {}
        self.fieldsets: List[int] = []                 # flat, 0xFFFFFFFF ends
        self.specs: List[Tuple[int, int, int]] = []    # (path, fset, type)
        self.body = bytearray()                        # value heap

    def token(self, s: str) -> int:
        if s not in self._tok_ix:
            self._tok_ix[s] = len(self.tokens)
            self.tokens.append(s)
        return self._tok_ix[s]

    def _heap(self, raw: bytes) -> int:
        # 8-align value payloads so doubles read back aligned.
        while len(self.body) % 8:
            self.body.append(0)
        off = _BOOTSTRAP + len(self.body)
        self.body += raw
        return off

    def rep_for(self, v: object) -> int:
        if isinstance(v, bool):
            return (T_BOOL << 48) | _INLINE_BIT | int(v)
        if isinstance(v, int):
            if 0 <= v < (1 << 32):
                return (T_INT << 48) | _INLINE_BIT | v
            return (T_INT64 << 48) | self._heap(struct.pack("<q", v))
        if isinstance(v, float):
            bits = struct.unpack("<I", struct.pack("<f", np.float32(v)))[0]
            if struct.unpack("<f", struct.pack("<f", np.float32(v)))[0] == v:
                return (T_FLOAT << 48) | _INLINE_BIT | bits
            return (T_DOUBLE << 48) | self._heap(struct.pack("<d", v))
        if isinstance(v, str):
            return (T_TOKEN << 48) | _INLINE_BIT | self.token(v)
        if isinstance(v, (list, tuple)) and all(isinstance(x, str) for x in v):
            raw = struct.pack("<Q", len(v)) + b"".join(
                struct.pack("<I", self.token(x)) for x in v)
            return (T_TOKEN_VECTOR << 48) | self._heap(raw)
        if isinstance(v, np.ndarray):
            if v.shape == (4, 4) and v.dtype == np.float64:
                return (T_MATRIX4D << 48) | self._heap(v.tobytes())
            t = self._array_type(v)
            raw = struct.pack("<Q", v.shape[0]) + np.ascontiguousarray(
                v).tobytes()
            return (t << 48) | _ARRAY_BIT | self._heap(raw)
        raise TypeError(f"unsupported crate value: {type(v)}")

    @staticmethod
    def _array_type(v: np.ndarray) -> int:
        lanes = 1 if v.ndim == 1 else v.shape[1]
        for t, (dt, ln) in _ARRAY_DTYPES.items():
            if v.dtype == dt and lanes == ln:
                return t
        raise TypeError(f"unsupported array {v.dtype} x{lanes}")

    def rep_specifier(self, s: int) -> int:
        return (T_SPECIFIER << 48) | _INLINE_BIT | s

    def rep_path_list(self, path_indexes: List[int]) -> int:
        # Minimal SdfPathListOp: flags byte (1 = explicit) + explicit items.
        raw = struct.pack("<BQ", 1, len(path_indexes)) + b"".join(
            struct.pack("<I", i) for i in path_indexes)
        return (T_PATH_LIST_OP << 48) | self._heap(raw)

    def field(self, name: str, rep: int) -> int:
        key = (self.token(name), rep)
        if key not in self._field_ix:
            self._field_ix[key] = len(self.fields)
            self.fields.append(key)
        return self._field_ix[key]

    def fieldset(self, field_indexes: List[int]) -> int:
        ix = len(self.fieldsets)
        self.fieldsets.extend(field_indexes)
        self.fieldsets.append(0xFFFFFFFF)
        return ix


def _path_parent(p: str) -> str:
    if "." in p:
        return p.rsplit(".", 1)[0]
    return p.rsplit("/", 1)[0] or "/"


def _path_element(p: str) -> Tuple[str, bool]:
    """(element token, is_property)."""
    if "." in p:
        return p.rsplit(".", 1)[1], True
    return p.rsplit("/", 1)[1], False


def _build_path_table(paths: List[str]) -> Tuple[List[str], Dict[str, int]]:
    """All paths incl. ancestors, DFS preorder from '/', + index map."""
    full = {"/"}
    for p in paths:
        while p != "/":
            full.add(p)
            p = _path_parent(p)
    kids: Dict[str, List[str]] = {p: [] for p in full}
    for p in sorted(full):
        if p != "/":
            kids[_path_parent(p)].append(p)
    order: List[str] = []

    def dfs(p: str):
        order.append(p)
        # Properties sort after child prims (writer convention only).
        for c in sorted(kids[p], key=lambda c: ("." in c, c)):
            dfs(c)

    dfs("/")
    return order, {p: i for i, p in enumerate(order)}


def _encode_paths(order: List[str], index: Dict[str, int],
                  w: _CrateWriter) -> bytes:
    """Iterative preorder emit with hasChild/hasSibling flags."""
    kids: Dict[str, List[str]] = {p: [] for p in order}
    for p in order:
        if p != "/":
            kids[_path_parent(p)].append(p)
    for p in kids:
        kids[p].sort(key=lambda c: index[c])
    sib_next: Dict[str, Optional[str]] = {}
    for p in order:
        cs = kids[p]
        for i, c in enumerate(cs):
            sib_next[c] = cs[i + 1] if i + 1 < len(cs) else None
    sib_next["/"] = None
    out = bytearray()
    for p in order:       # DFS preorder == emit order for this encoding
        has_child = bool(kids[p])
        has_sib = sib_next[p] is not None
        if p == "/":
            elem = 0
        else:
            tok, is_prop = _path_element(p)
            ti = w.token(tok)
            elem = -ti if is_prop else ti
        flags = (1 if has_child else 0) | (2 if has_sib else 0)
        out.extend(struct.pack("<IiB", index[p], elem, flags))
        if has_child and has_sib:
            out.extend(struct.pack("<q", 0))
    return bytes(out)


def save_usdc(path: str, prims: List[UsdPrim]) -> None:
    """Write a flattened stage of UsdPrims as a binary crate file."""
    w = _CrateWriter()
    all_paths = ["/"]
    for pr in prims:
        all_paths.append(pr.path)
        for a in pr.attrs:
            all_paths.append(f"{pr.path}.{a}")
        for r in pr.rels:
            all_paths.append(f"{pr.path}.{r}")
    order, index = _build_path_table(all_paths)

    # Pseudo-root spec.
    root_fs = w.fieldset([])
    w.specs.append((index["/"], root_fs, SPEC_PSEUDO_ROOT))
    for pr in prims:
        fs = w.fieldset([
            w.field("specifier", w.rep_specifier(SPECIFIER_DEF)),
            w.field("typeName", w.rep_for(pr.type_name)),
        ])
        w.specs.append((index[pr.path], fs, SPEC_PRIM))
        for name, val in pr.attrs.items():
            afs = w.fieldset([w.field("default", w.rep_for(val))])
            w.specs.append((index[f"{pr.path}.{name}"], afs, SPEC_ATTRIBUTE))
        for name, target in pr.rels.items():
            rfs = w.fieldset([w.field(
                "targetPaths", w.rep_path_list([index[target]]))])
            w.specs.append((index[f"{pr.path}.{name}"], rfs,
                            SPEC_RELATIONSHIP))

    paths_blob = struct.pack("<Q", len(order)) + _encode_paths(order, index, w)

    # Assemble sections AFTER the value heap (tokens got created during
    # path encoding too, so tokens must serialize last).
    sections: List[Tuple[bytes, bytes]] = []
    tok_blob = struct.pack("<Q", len(w.tokens)) + b"\0".join(
        t.encode() for t in w.tokens) + b"\0"
    sections.append((b"TOKENS", tok_blob))
    sections.append((b"STRINGS", struct.pack("<Q", 0)))
    f_blob = struct.pack("<Q", len(w.fields)) + b"".join(
        struct.pack("<IIQ", ti, 0, rep) for ti, rep in w.fields)
    sections.append((b"FIELDS", f_blob))
    fs_blob = struct.pack("<Q", len(w.fieldsets)) + np.asarray(
        w.fieldsets, np.uint32).tobytes()
    sections.append((b"FIELDSETS", fs_blob))
    sections.append((b"PATHS", paths_blob))
    sp_blob = struct.pack("<Q", len(w.specs)) + b"".join(
        struct.pack("<III", *s) for s in w.specs)
    sections.append((b"SPECS", sp_blob))

    with open(path, "wb") as f:
        f.write(MAGIC + bytes([0, 0, 1]) + bytes(5))
        f.write(struct.pack("<q", 0))          # tocOffset placeholder
        f.write(bytes(64))
        f.write(bytes(w.body))
        toc_entries = []
        for name, blob in sections:
            start = f.tell()
            f.write(blob)
            toc_entries.append((name, start, len(blob)))
        toc_off = f.tell()
        f.write(struct.pack("<q", len(toc_entries)))
        for name, start, size in toc_entries:
            f.write(name.ljust(16, b"\0") + struct.pack("<qq", start, size))
        f.seek(16)
        f.write(struct.pack("<q", toc_off))


def save_usdz(path: str, prims: List[UsdPrim],
              layer_name: str = "stage.usdc") -> None:
    """Package a crate layer into .usdz (zip, STORED entries only)."""
    import io
    import os
    import tempfile
    tmp = tempfile.NamedTemporaryFile(suffix=".usdc", delete=False)
    tmp.close()
    try:
        save_usdc(tmp.name, prims)
        with open(tmp.name, "rb") as f:
            blob = f.read()
    finally:
        os.unlink(tmp.name)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as z:
        z.writestr(layer_name, blob)


# =========================================================================
# Reader
# =========================================================================

class CrateError(ValueError):
    pass


class _CrateReader:
    def __init__(self, data: bytes):
        self.data = data
        if data[:8] != MAGIC:
            raise CrateError("not a usdc file")
        ver = tuple(data[8:11])
        if ver >= (0, 4, 0):
            raise CrateError(
                f"usdc version {ver[0]}.{ver[1]}.{ver[2]} uses compressed "
                "sections; re-export as .usda or usdc 0.0.1 "
                "(USD_WRITE_NEW_USDC_FILES_AS_VERSION=0.0.1)")
        (toc_off,) = struct.unpack_from("<q", data, 16)
        (n,) = struct.unpack_from("<q", data, toc_off)
        self.sections: Dict[bytes, Tuple[int, int]] = {}
        o = toc_off + 8
        for _ in range(n):
            name = data[o:o + 16].rstrip(b"\0")
            start, size = struct.unpack_from("<qq", data, o + 16)
            self.sections[name] = (start, size)
            o += 32
        self.tokens = self._read_tokens()
        self.fields = self._read_fields()
        self.fieldsets = self._read_fieldsets()
        self.paths = self._read_paths()
        self.specs = self._read_specs()

    def _sec(self, name: bytes) -> bytes:
        if name not in self.sections:
            raise CrateError(f"missing section {name!r}")
        s, z = self.sections[name]
        return self.data[s:s + z]

    def _read_tokens(self) -> List[str]:
        b = self._sec(b"TOKENS")
        (n,) = struct.unpack_from("<Q", b, 0)
        parts = b[8:].split(b"\0")
        return [p.decode() for p in parts[:n]]

    def _read_fields(self) -> List[Tuple[int, int]]:
        b = self._sec(b"FIELDS")
        (n,) = struct.unpack_from("<Q", b, 0)
        return [struct.unpack_from("<IIQ", b, 8 + 16 * i)[::2]
                for i in range(n)]

    def _read_fieldsets(self) -> List[int]:
        b = self._sec(b"FIELDSETS")
        (n,) = struct.unpack_from("<Q", b, 0)
        return list(np.frombuffer(b, np.uint32, count=n, offset=8))

    def _read_paths(self) -> List[str]:
        b = self._sec(b"PATHS")
        (n,) = struct.unpack_from("<Q", b, 0)
        paths: Dict[int, str] = {}
        pos = [8]

        def read_node(parent: str):
            ix, elem, flags = struct.unpack_from("<IiB", b, pos[0])
            pos[0] += 9
            has_child, has_sib = bool(flags & 1), bool(flags & 2)
            if has_child and has_sib:
                pos[0] += 8                       # sibling offset (unused)
            if elem == 0 and parent == "":
                p = "/"
            elif elem < 0:
                p = f"{parent}.{self.tokens[-elem]}"
            else:
                base = "" if parent == "/" else parent
                p = f"{base}/{self.tokens[elem]}"
            paths[ix] = p
            if has_child:
                read_node(p)
            if has_sib:
                read_node(parent)

        if n:
            read_node("")
        out = [""] * (max(paths) + 1)
        for i, p in paths.items():
            out[i] = p
        return out

    def _read_specs(self) -> List[Tuple[int, int, int]]:
        b = self._sec(b"SPECS")
        (n,) = struct.unpack_from("<Q", b, 0)
        return [struct.unpack_from("<III", b, 8 + 12 * i) for i in range(n)]

    # --- value decoding --------------------------------------------------
    def value(self, rep: int) -> object:
        t = (rep >> 48) & 0xFF
        payload = rep & _PAYLOAD_MASK
        inline = bool(rep & _INLINE_BIT)
        if rep & _ARRAY_BIT:
            dt, lanes = _ARRAY_DTYPES[t]
            (cnt,) = struct.unpack_from("<Q", self.data, payload)
            arr = np.frombuffer(self.data, dt, count=cnt * lanes,
                                offset=payload + 8)
            return arr.reshape(cnt, lanes) if lanes > 1 else arr.copy()
        if t == T_BOOL:
            return bool(payload & 1)
        if t in (T_INT, T_UINT):
            return int(payload & 0xFFFFFFFF)
        if t == T_INT64:
            return struct.unpack_from("<q", self.data, payload)[0]
        if t == T_FLOAT:
            return struct.unpack("<f", struct.pack(
                "<I", payload & 0xFFFFFFFF))[0]
        if t == T_DOUBLE:
            return struct.unpack_from("<d", self.data, payload)[0]
        if t in (T_TOKEN, T_STRING, T_ASSET):
            return self.tokens[payload]
        if t == T_SPECIFIER:
            return int(payload)
        if t == T_MATRIX4D:
            return np.frombuffer(self.data, np.float64, count=16,
                                 offset=payload).reshape(4, 4).copy()
        if t == T_TOKEN_VECTOR:
            (cnt,) = struct.unpack_from("<Q", self.data, payload)
            ix = np.frombuffer(self.data, np.uint32, count=cnt,
                               offset=payload + 8)
            return [self.tokens[i] for i in ix]
        if t == T_PATH_LIST_OP:
            flags, cnt = struct.unpack_from("<BQ", self.data, payload)
            ix = np.frombuffer(self.data, np.uint32, count=cnt,
                               offset=payload + 9)
            return [self.paths[i] for i in ix]
        raise CrateError(f"unsupported value type {t}")

    def spec_fields(self, fset: int) -> Dict[str, object]:
        out: Dict[str, object] = {}
        i = fset
        while i < len(self.fieldsets) and self.fieldsets[i] != 0xFFFFFFFF:
            ti, rep = self.fields[self.fieldsets[i]]
            out[self.tokens[ti]] = self.value(rep)
            i += 1
        return out


def read_usdc(data: bytes) -> List[UsdPrim]:
    """Decode crate bytes back into a flat UsdPrim list (DFS path order)."""
    r = _CrateReader(data)
    prims: Dict[str, UsdPrim] = {}
    for path_ix, fset, stype in r.specs:
        p = r.paths[path_ix]
        fields = r.spec_fields(fset)
        if stype == SPEC_PRIM:
            prims.setdefault(p, UsdPrim(p, "")).type_name = \
                fields.get("typeName", "")
        elif stype == SPEC_ATTRIBUTE and "." in p:
            prim_p, name = p.rsplit(".", 1)
            prims.setdefault(prim_p, UsdPrim(prim_p, ""))
            if "default" in fields:
                prims[prim_p].attrs[name] = fields["default"]
        elif stype == SPEC_RELATIONSHIP and "." in p:
            prim_p, name = p.rsplit(".", 1)
            prims.setdefault(prim_p, UsdPrim(prim_p, ""))
            targets = fields.get("targetPaths", [])
            if targets:
                prims[prim_p].rels[name] = targets[0]
    return [prims[p] for p in sorted(prims)]


# =========================================================================
# Scene building (shared by .usdc and .usdz entry points)
# =========================================================================

def _prims_to_scene(prims: List[UsdPrim], scene: Scene, meshes: MeshRegistry,
                    materials: MaterialRegistry,
                    parent: Optional[int]) -> List[int]:
    from .importers import _mat_to_quat
    by_path = {p.path: p for p in prims}
    mat_ids: Dict[str, int] = {}
    created: List[int] = []
    entity_of: Dict[str, Optional[int]] = {"/": parent}

    def mat_id_for(binding: Optional[str]) -> int:
        if binding is None:
            return 0
        if binding not in mat_ids:
            pr = by_path.get(binding)
            # UsdPreviewSurface inputs may live on a child Shader prim.
            srcs = [pr] if pr else []
            srcs += [q for q in prims
                     if q.path.startswith(binding + "/")]
            m = Material(name=binding.rsplit("/", 1)[-1])
            found = False
            for q in srcs:
                a = q.attrs
                if "inputs:diffuseColor" in a:
                    c = np.asarray(a["inputs:diffuseColor"], np.float32)
                    m.base_color = np.asarray(
                        list(c.reshape(-1)[:3]) + [1.0], np.float32)
                    found = True
                for key, field in (("inputs:metallic", "metallic"),
                                   ("inputs:roughness", "roughness"),
                                   ("inputs:opacityThreshold",
                                    "alpha_cutoff")):
                    if key in a:
                        setattr(m, field, float(np.asarray(a[key]).reshape(
                            -1)[0]))
                        found = True
                if "inputs:emissiveColor" in a:
                    m.emissive = np.asarray(
                        a["inputs:emissiveColor"], np.float32).reshape(-1)[:3]
                    found = True
            mat_ids[binding] = materials.add(m) if found else 0
        return mat_ids[binding]

    for pr in sorted(prims, key=lambda p: p.path.count("/")):
        if pr.type_name not in ("Xform", "Scope", "Mesh"):
            continue
        par = entity_of.get(_path_parent(pr.path), parent)
        M = np.asarray(pr.attrs.get("xformOp:transform", np.eye(4)),
                       np.float64)
        if M.shape != (4, 4):
            M = np.eye(4)
        else:
            M = M.T                 # usd stores row-major row-vector form
        t = M[:3, 3]
        s = np.linalg.norm(M[:3, :3], axis=0)
        r3 = M[:3, :3] / np.maximum(s, 1e-12)
        e = scene.create_node(par, tuple(t), tuple(_mat_to_quat(r3)),
                              tuple(s), name=pr.path.rsplit("/", 1)[-1])
        entity_of[pr.path] = e
        created.append(e)
        if pr.type_name != "Mesh":
            continue
        a = pr.attrs
        if "points" not in a or "faceVertexIndices" not in a:
            continue
        P = np.asarray(a["points"], np.float32).reshape(-1, 3)
        I = np.asarray(a["faceVertexIndices"], np.int32).reshape(-1)
        C = np.asarray(a.get("faceVertexCounts",
                             np.full(len(I) // 3, 3, np.int32)),
                       np.int32).reshape(-1)
        tris = []
        o = 0
        for c in C:
            c = int(c)
            for k in range(1, c - 1):
                tris.append((I[o], I[o + k], I[o + k + 1]))
            o += c
        T = np.asarray(tris, np.int32).reshape(-1, 3)
        uv = np.asarray(a.get("primvars:st", np.zeros((len(P), 2))),
                        np.float32).reshape(-1, 2)
        if len(uv) != len(P):
            uv = np.zeros((len(P), 2), np.float32)
        nrm = np.asarray(a.get("normals", ()), np.float32).reshape(-1, 3) \
            if "normals" in a else None
        if nrm is None or len(nrm) != len(P):
            nrm = compute_normals(P, T)
        md = MeshData(P, nrm, uv, T, name=pr.path.rsplit("/", 1)[-1])
        mid = meshes.add(md)
        scene.create_renderable(mid, mat_id_for(pr.rels.get(
            "material:binding")), parent=e)
    return created


def load_usdc(path: str, scene: Scene, meshes: MeshRegistry,
              materials: MaterialRegistry, parent: Optional[int] = None
              ) -> List[int]:
    with open(path, "rb") as f:
        data = f.read()
    return _prims_to_scene(read_usdc(data), scene, meshes, materials, parent)


def load_usdz(path: str, scene: Scene, meshes: MeshRegistry,
              materials: MaterialRegistry, parent: Optional[int] = None
              ) -> List[int]:
    with zipfile.ZipFile(path) as z:
        names = [n for n in z.namelist() if n.endswith((".usdc", ".usda"))]
        if not names:
            raise CrateError(".usdz contains no usd layer")
        blob = z.read(names[0])
    if blob[:8] == MAGIC:
        return _prims_to_scene(read_usdc(blob), scene, meshes, materials,
                               parent)
    # ASCII layer inside the zip: write-through to the usda parser.
    import tempfile
    import os
    tmp = tempfile.NamedTemporaryFile(suffix=".usda", delete=False)
    try:
        tmp.write(blob)
        tmp.close()
        from .usd import load_usda
        return load_usda(tmp.name, scene, meshes, materials, parent)
    finally:
        os.unlink(tmp.name)


# =========================================================================
# Scene export convenience (usdc writer front-end)
# =========================================================================

def export_meshes_usdc(path: str, meshes: MeshRegistry,
                       materials: Optional[MaterialRegistry] = None,
                       instances: Optional[List[Tuple[int, int,
                                                      np.ndarray]]] = None
                       ) -> None:
    """Write registry meshes (optionally with per-instance (mesh_id,
    material_id, world 4x4) placements) as a flattened crate stage."""
    prims: List[UsdPrim] = [UsdPrim("/World", "Xform")]
    mat_paths: Dict[int, str] = {}
    if materials is not None:
        for i in range(len(materials)):
            m = materials.get(i)
            p = f"/World/Materials/mat{i}"
            prims.append(UsdPrim(p, "Material", attrs={
                "inputs:diffuseColor": np.asarray(m.base_color[:3],
                                                  np.float32).reshape(1, 3),
                "inputs:metallic": float(m.metallic),
                "inputs:roughness": float(m.roughness),
                "inputs:emissiveColor": np.asarray(
                    m.emissive, np.float32).reshape(1, 3),
            }))
            mat_paths[i] = p
    if instances is None:
        instances = [(i, 0, np.eye(4)) for i in range(len(meshes))]
    for k, (mid, mat, M) in enumerate(instances):
        md = meshes.get(mid)
        attrs = {
            "points": np.asarray(md.positions, np.float32),
            "faceVertexIndices": np.asarray(md.indices,
                                            np.int32).reshape(-1),
            "faceVertexCounts": np.full(len(md.indices), 3, np.int32),
            "normals": np.asarray(md.normals, np.float32),
            "primvars:st": np.asarray(md.uvs, np.float32),
            # row-vector row-major on disk (transpose of our column form)
            "xformOp:transform": np.asarray(M, np.float64).T,
            "xformOpOrder": ["xformOp:transform"],
        }
        rels = {}
        if mat in mat_paths:
            rels["material:binding"] = mat_paths[mat]
        prims.append(UsdPrim(f"/World/mesh{k}", "Mesh", attrs=attrs,
                             rels=rels))
    save_usdc(path, prims)

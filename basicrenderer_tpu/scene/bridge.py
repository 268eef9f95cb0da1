"""Scene -> device bridge: packs the ECS world into SceneBuffers.

TPU-native analogue of the reference's SceneRenderBridge + the manager upload
path (reference: BasicRenderer/src/Render/SceneRenderBridge.cpp,
RunRenderResourceSyncStage Renderer.cpp:743-971). The reference exports a
SceneFrameSnapshot from the game world and ingests it into a render world each
frame; here the equivalent split is:

- `pack_geometry` (cold): flatten all renderable instances into the global
  fixed-capacity triangle soup once (geometry upload).
- `snapshot` (hot, per frame): gather object matrices + lights into small
  numpy arrays — cheap host work that runs while the previous frame's XLA
  program executes (frame overlap, reference Renderer.cpp:597-741).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..graph.framedata import LIGHT_STRIDE, SceneBuffers
from ..models.materials import MAT_STRIDE, MaterialRegistry
from ..models.mesh import MeshRegistry
from ..utils import math3d
from .components import Light, LightType, Renderable, WorldMatrix, Position, Rotation
from .scene import Scene


@dataclasses.dataclass
class BridgeCapacities:
    max_vertices: int = 1 << 20
    max_triangles: int = 1 << 20
    max_objects: int = 1 << 12
    max_materials: int = 1 << 10
    max_lights: int = 256
    max_clusters: int = 1 << 14
    max_joints: int = 256
    max_geom_clusters: int = 1 << 13   # unique (non-instanced) cluster pages
    max_groups: int = 1 << 12          # streaming group id capacity


@dataclasses.dataclass
class PackedGeometry:
    """Host-side packed arrays + instance bookkeeping."""
    positions: np.ndarray
    normals: np.ndarray
    tangents: np.ndarray
    uvs: np.ndarray
    vert_object: np.ndarray
    indices: np.ndarray
    tri_material: np.ndarray
    tri_object: np.ndarray
    num_verts: int
    num_tris: int
    entity_to_object: Dict[int, int]
    local_bounds: np.ndarray  # (O, 4) object-space bounding sphere xyz + r
    tri_cluster: np.ndarray   # (T,) i32 global cluster id (-1 none)
    cluster_table: np.ndarray # (C, CLUSTER_STRIDE) f32
    cluster_object: np.ndarray  # (C,) i32
    num_clusters: int = 0
    vert_joints: np.ndarray = None   # (V, 4) i32 global palette slots
    vert_weights: np.ndarray = None  # (V, 4) f32
    skin_instances: list = None      # [(skeleton_id, palette_offset, J)]
    cluster_verts: np.ndarray = None      # (G, SLAB*3) u32 quantized planar
    #                                       vertex pages (models/pageblob.py)
    cluster_dequant: np.ndarray = None    # (G, 8) f32 per-page AABB min/ext
    cluster_tangents: np.ndarray = None   # (G, 512) f32 per-tri FLAT
    #                                       corner-0 OBJECT tangent+w,
    #                                       plane-major (see pack_geometry)
    cluster_feeds: np.ndarray = None      # (C,) i32 streaming group of c
    cluster_made: np.ndarray = None       # (C,) i32 group c was built from
    geom_group: np.ndarray = None         # (G,) i32 owning group per page
    num_groups: int = 0


def pack_cluster_windows(cluster_table: np.ndarray,
                         cluster_object: np.ndarray,
                         num_clusters: int, window: int = 128) -> np.ndarray:
    """Window pre-cull table for ops/clod.cut_slots_windowed: one row per
    `window` consecutive cluster-table rows —
    [cx, cy, cz, r, max_parent_err, object(-1 mixed), live_count, pad].
    The sphere is the object-space union of the window's TIGHT cluster
    spheres (table lanes 16-19); it is only meaningful when every live
    cluster in the window shares one object (object >= 0), which the
    packer's per-instance contiguous layout makes the common case."""
    C = cluster_table.shape[0]
    NW = (C + window - 1) // window
    out = np.zeros((NW, 8), np.float32)
    out[:, 5] = -1.0
    for w in range(NW):
        lo, hi = w * window, min((w + 1) * window, C)
        live = min(hi, num_clusters) - lo
        if live <= 0:
            continue
        rows = cluster_table[lo:lo + live]
        objs = np.unique(cluster_object[lo:lo + live])
        c, r = rows[:, 16:19], rows[:, 19]
        # Union sphere: center = mean, radius covers every member sphere.
        cen = c.mean(axis=0)
        rad = float(np.max(np.linalg.norm(c - cen, axis=1) + r))
        out[w, 0:3] = cen
        out[w, 3] = rad
        out[w, 4] = float(rows[:, 5].max())      # max parent error
        out[w, 5] = float(objs[0]) if len(objs) == 1 else -1.0
        out[w, 6] = float(live)
    return out


class SceneRenderBridge:
    def __init__(self, scene: Scene, meshes: MeshRegistry, materials: MaterialRegistry,
                 caps: Optional[BridgeCapacities] = None, skeletons=None,
                 textures=None, tex_format: str = "rgba8"):
        self.scene = scene
        self.meshes = meshes
        self.materials = materials
        self.caps = caps or BridgeCapacities()
        self.packed: Optional[PackedGeometry] = None
        self.skeletons = skeletons  # models.animation.SkeletonRegistry
        self.textures = textures    # models.textures.TextureRegistry
        self.tex_format = tex_format  # atlas-at-rest format (FrameConfig)

    def snapshot_joint_palette(self, t: float = 0.0) -> np.ndarray:
        """(max_joints, 16) object-space skinning palette for all skinned
        instances (SkeletonManager upload analogue)."""
        c = self.caps
        pal = np.tile(np.eye(4, dtype=np.float32).reshape(1, 16),
                      (c.max_joints, 1))
        if self.packed and self.packed.skin_instances and self.skeletons:
            for sk_id, off, nj in self.packed.skin_instances:
                p = self.skeletons.palette(sk_id, t)
                pal[off:off + nj] = p.reshape(nj, 16)
        return pal

    # -- cold path ---------------------------------------------------------
    def pack_geometry(self) -> PackedGeometry:
        c = self.caps
        pos = np.zeros((c.max_vertices, 3), np.float32)
        nrm = np.zeros((c.max_vertices, 3), np.float32)
        tan = np.zeros((c.max_vertices, 4), np.float32)
        uv = np.zeros((c.max_vertices, 2), np.float32)
        vobj = np.zeros((c.max_vertices,), np.int32)
        idx = np.zeros((c.max_triangles, 3), np.int32)
        tmat = np.zeros((c.max_triangles,), np.int32)
        tobj = np.full((c.max_triangles,), -1, np.int32)

        v_off = 0
        t_off = 0
        ent2obj: Dict[int, int] = {}
        local_bounds = np.zeros((c.max_objects, 4), np.float32)
        tcl = np.full((c.max_triangles,), -1, np.int32)
        from ..models.clusters import CLUSTER_STRIDE as _CS, MESHLET_TRIS, SLAB_VERTS
        cluster_table = np.zeros((c.max_clusters, _CS), np.float32)
        cluster_object = np.zeros((c.max_clusters,), np.int32)
        # Cluster-local vertex pages (framedata.SceneBuffers docstring):
        # built ONCE per geometry cluster; instances share them. Stored
        # QUANTIZED (pos16-in-bounds / oct normals / half UVs — see
        # models/pageblob.py; reference: ClusterLODUtilities.cpp:1194-1330).
        from ..models.pageblob import DEQUANT_LANES, quantize_page
        cluster_verts = np.zeros((c.max_geom_clusters, SLAB_VERTS * 3),
                                 np.uint32)
        cluster_dequant = np.zeros((c.max_geom_clusters, DEQUANT_LANES),
                                   np.float32)
        cluster_dequant[:, 3:6] = 1.0
        # Per-tri corner-0 OBJECT-SPACE tangent+handedness, plane-major
        # [tx*128 | ty*128 | tz*128 | w*128] — rotated to world and encoded
        # as a theta at setup time (raster_setup), so instance rotations
        # stay correct (ONB(R n) != R ONB(n): a baked angle would not).
        cluster_tangents = np.zeros((c.max_geom_clusters, 4 * MESHLET_TRIS),
                                    np.float32)
        cluster_feeds = np.full((c.max_clusters,), -1, np.int32)
        cluster_made = np.full((c.max_clusters,), -1, np.int32)
        # -2 = unused capacity, -1 = live pinned page, >=0 = group
        geom_group = np.full((c.max_geom_clusters,), -2, np.int32)
        grp_off = 0
        g_off = 0
        cl_off = 0
        obj = 0
        # Geometry is packed ONCE PER MESH; instances only add cluster rows
        # pointing at the shared triangle ranges (object + material live in
        # the cluster row). Reference analogue: per-object cluster instances
        # over shared streamed geometry (MeshInstance / cluster instancing).
        vjoints = np.zeros((c.max_vertices, 4), np.int32)
        vweights = np.zeros((c.max_vertices, 4), np.float32)
        skin_instances = []
        joint_off = 0
        mesh_pack: Dict[int, tuple] = {}  # mesh_id -> (t_off, rows_template)
        for eid, (r,) in self.scene.world.query(Renderable):
            mesh = self.meshes.get(r.mesh_id)
            nv, nt = mesh.num_vertices, mesh.num_triangles
            if obj >= c.max_objects:
                raise ValueError("object capacity exceeded")
            skinned = r.skeleton_id >= 0 and mesh.joints is not None
            # Skinned instances deform uniquely -> never share vertex data.
            pack_key = ("skin", eid) if skinned else r.mesh_id
            if pack_key not in mesh_pack:
                if mesh.tangents is None or len(mesh.tangents) != nv:
                    from ..models.mesh import compute_tangents
                    mesh.tangents = compute_tangents(
                        mesh.positions, mesh.normals, mesh.uvs, mesh.indices)
                if v_off + nv > c.max_vertices or t_off + nt > c.max_triangles:
                    raise ValueError(
                        f"geometry capacity exceeded: verts {v_off + nv}/"
                        f"{c.max_vertices}, tris {t_off + nt}/{c.max_triangles}")
                pos[v_off:v_off + nv] = mesh.positions
                nrm[v_off:v_off + nv] = mesh.normals
                tan[v_off:v_off + nv] = mesh.tangents
                uv[v_off:v_off + nv] = mesh.uvs
                vobj[v_off:v_off + nv] = obj  # first instance (compat path)
                idx[t_off:t_off + nt] = mesh.indices + v_off
                tmat[t_off:t_off + nt] = r.material_id
                tobj[t_off:t_off + nt] = obj
                if mesh.tri_cluster is not None and mesh.clusters is not None:
                    template = mesh.clusters.copy()
                else:
                    # Synthesize single-LOD clusters (sequential 128-tri
                    # chunks) so ALL geometry flows through the cluster
                    # pipeline — the reference clusters everything at import.
                    ncl0 = (nt + MESHLET_TRIS - 1) // MESHLET_TRIS
                    template = np.zeros((ncl0, _CS), np.float32)
                    mesh.tri_cluster = np.arange(nt, dtype=np.int32) // MESHLET_TRIS
                    for ci in range(ncl0):
                        lo = ci * MESHLET_TRIS
                        hi = min(nt, lo + MESHLET_TRIS)
                        vs = mesh.positions[np.unique(mesh.indices[lo:hi])]
                        cen = (vs.min(0) + vs.max(0)) * 0.5
                        template[ci, :3] = cen
                        template[ci, 3] = np.linalg.norm(vs - cen, axis=1).max()
                        template[ci, 5] = np.inf
                        template[ci, 7] = lo
                        template[ci, 8] = hi - lo
                        template[ci, 12:16] = template[ci, 0:4]
                        template[ci, 16:20] = template[ci, 0:4]
                template = template.copy()
                # Geometry-cluster vertex pages + local corner indices.
                ncl_g = len(template)
                if g_off + ncl_g > c.max_geom_clusters:
                    raise ValueError("geometry cluster capacity exceeded")
                for ci in range(ncl_g):
                    lo = int(template[ci, 7])
                    cnt = int(template[ci, 8])
                    tris = mesh.indices[lo:lo + cnt]         # (cnt, 3) local
                    g = g_off + ci
                    # CORNER-MAJOR page rows (j = corner*MESHLET_TRIS +
                    # tri): the page stores each corner's values directly
                    # (384 corners = 3 * 128 tris, the same slab size a
                    # 384-vertex page had), so the setup path slices
                    # per-corner lane blocks with NO indirection — the
                    # one-hot corner-extraction einsum this replaced cost
                    # ~2.1 ms/frame at city scale.
                    # Pad dead corner rows with this cluster's own first
                    # vertex — a foreign vertex would bloat the page's
                    # quantization AABB (dequant range = union of rows).
                    fill = int(tris[0, 0]) if cnt > 0 else 0
                    corner_ids = np.full(SLAB_VERTS, fill, np.int64)
                    for cc in range(3):
                        corner_ids[cc * MESHLET_TRIS:
                                   cc * MESHLET_TRIS + cnt] = tris[:, cc]
                    rows10 = np.concatenate(
                        [mesh.positions[corner_ids],
                         mesh.normals[corner_ids], mesh.uvs[corner_ids],
                         np.zeros((SLAB_VERTS, 2), np.float32)], axis=1)
                    cluster_verts[g], cluster_dequant[g] = \
                        quantize_page(rows10, SLAB_VERTS)
                    # Per-tri FLAT tangent from the corner-0 wedge
                    # (world-theta encode at setup; decode at resolve via
                    # shade.tangent_from_theta).
                    t4 = mesh.tangents[tris[:, 0]]
                    M_ = MESHLET_TRIS
                    for comp_i in range(4):
                        cluster_tangents[
                            g, comp_i * M_:comp_i * M_ + cnt] = t4[:, comp_i]
                template[:, 11] = g_off + np.arange(ncl_g)
                # Streaming groups: offset this mesh's group ids into the
                # global space; top level / non-LOD clusters stay -1
                # (always resident).
                if mesh.feeds_group is not None:
                    feeds_t = np.where(mesh.feeds_group >= 0,
                                       mesh.feeds_group + grp_off, -1)
                    made_t = np.where(mesh.made_group >= 0,
                                      mesh.made_group + grp_off, -1)
                    n_grp = int(max(mesh.feeds_group.max(initial=-1),
                                    mesh.made_group.max(initial=-1))) + 1
                else:
                    feeds_t = np.full(ncl_g, -1, np.int32)
                    made_t = np.full(ncl_g, -1, np.int32)
                    n_grp = 0
                if grp_off + n_grp > c.max_groups:
                    raise ValueError("streaming group capacity exceeded")
                # Page g belongs to the group its cluster FEEDS (the unit
                # the streamer loads/evicts together).
                geom_group[g_off:g_off + ncl_g] = feeds_t
                grp_off += n_grp
                g_off += ncl_g
                template[:, 7] += t_off  # mesh-local -> global tri offsets
                tcl[t_off:t_off + nt] = mesh.tri_cluster + cl_off  # first inst
                if skinned:
                    from ..models.animation import SkeletonRegistry  # noqa
                    nj = len(self.skeletons.skeletons[r.skeleton_id].parents) \
                        if self.skeletons else int(mesh.joints.max()) + 1
                    if joint_off + nj > c.max_joints:
                        raise ValueError("joint palette capacity exceeded")
                    vjoints[v_off:v_off + nv] = mesh.joints + joint_off
                    vweights[v_off:v_off + nv] = mesh.weights
                    skin_instances.append((r.skeleton_id, joint_off, nj))
                    joint_off += nj
                mesh_pack[pack_key] = (t_off, template, feeds_t, made_t)
                v_off += nv
                t_off += nt
            _toff, template, feeds_t, made_t = mesh_pack[pack_key]
            ncl = len(template)
            if cl_off + ncl > c.max_clusters:
                raise ValueError("cluster capacity exceeded")
            rows = template.copy()
            rows[:, 9] = r.material_id
            m = self.materials.get(r.material_id)
            # Surface class: 0 opaque, 1 transparent (OIT), 2 alpha-MASK.
            # Transmission (OpenPBR glass) routes through the OIT peel: the
            # refracted background is the layer behind it (ops/oit.py).
            if m.alpha_blend or m.base_color[3] < 0.999 \
                    or m.transmission_weight > 0.0:
                rows[:, 10] = 1.0
            elif m.alpha_cutoff >= 0.0:
                rows[:, 10] = 2.0
            else:
                rows[:, 10] = 0.0
            cluster_table[cl_off:cl_off + ncl] = rows
            cluster_feeds[cl_off:cl_off + ncl] = feeds_t
            cluster_made[cl_off:cl_off + ncl] = made_t
            cluster_object[cl_off:cl_off + ncl] = obj
            cl_off += ncl
            bc, br = mesh.bounding_sphere()
            local_bounds[obj, :3] = bc
            local_bounds[obj, 3] = br
            ent2obj[eid] = obj
            obj += 1
        self.packed = PackedGeometry(pos, nrm, tan, uv, vobj, idx, tmat, tobj,
                                     v_off, t_off, ent2obj, local_bounds,
                                     tcl, cluster_table, cluster_object, cl_off,
                                     vjoints, vweights, skin_instances,
                                     cluster_verts, cluster_dequant,
                                     cluster_tangents,
                                     cluster_feeds, cluster_made,
                                     geom_group, grp_off)
        return self.packed

    def save_page_container(self, path: str) -> None:
        """Serialize the packed scene's quantized geometry pages to a disk
        page-blob container the streamer can cold-start from (reference:
        CLodCache.h:17-110 page blobs + locators)."""
        from ..models.pageblob import write_container
        p = self.packed if self.packed is not None else self.pack_geometry()
        write_container(path, p.cluster_verts,
                        p.geom_group, p.cluster_dequant, p.num_groups)

    # -- hot path ----------------------------------------------------------
    def snapshot_objects(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Model matrices, normal matrices, world bounding spheres, validity."""
        assert self.packed is not None
        c = self.caps
        mats = np.tile(np.eye(4, dtype=np.float32), (c.max_objects, 1, 1))
        valid = np.zeros((c.max_objects,), bool)
        for eid, o in self.packed.entity_to_object.items():
            wm = self.scene.world.get(eid, WorldMatrix)
            if wm is not None:
                mats[o] = wm.value
            valid[o] = True
        m3 = mats[:, :3, :3]
        # normal matrix = inverse-transpose of upper 3x3
        nmats = np.linalg.inv(m3.astype(np.float64)).transpose(0, 2, 1).astype(np.float32)
        # World bounding spheres: transform local center, scale radius by the
        # largest axis scale (conservative).
        lb = self.packed.local_bounds
        centers = np.einsum("oij,oj->oi", m3, lb[:, :3]) + mats[:, :3, 3]
        scale = np.linalg.norm(m3, axis=1).max(axis=1)  # max column norm
        bounds = np.concatenate(
            [centers, (lb[:, 3] * scale)[:, None]], axis=1).astype(np.float32)
        return mats, nmats, bounds, valid

    def snapshot_lights(self) -> Tuple[np.ndarray, int, int]:
        """(L, LIGHT_STRIDE) packed light table, total count, directional
        count. Directional lights are packed FIRST so the full-screen pass
        can loop over just rows [0, num_directional) while the tiled pass
        culls the positional rest (reference keeps one LightInfo table and
        branches per type; on TPU the split loop bound is cheaper)."""
        c = self.caps
        table = np.zeros((c.max_lights, LIGHT_STRIDE), np.float32)
        n = 0
        shadow_slot = 0
        cube_slot = 0
        entries = sorted(
            self.scene.world.query(Light),
            key=lambda e: 0 if e[1][0].type == LightType.DIRECTIONAL else 1)
        for eid, (l,) in entries:
            if n >= c.max_lights:
                break
            wm = self.scene.world.get(eid, WorldMatrix)
            m = wm.value if wm is not None else np.eye(4, dtype=np.float32)
            p = m[:3, 3]
            d = -m[:3, 2]  # light looks down local -Z
            d = d / (np.linalg.norm(d) + 1e-20)
            row = table[n]
            row[0:3] = p
            row[3] = float(l.type)
            row[4:7] = d
            row[7] = l.intensity
            row[8:11] = l.color
            row[11] = l.range
            row[12] = np.cos(l.inner_cone)
            row[13] = np.cos(l.outer_cone)
            # Local shadow slots (plain floats — bitcast ints break the
            # one-hot lookup path): lane 14 = spot view slot, lane 15 =
            # point cube index (6 faces each). The directional light rides
            # CSM/VSM.
            slot = -1
            cube = -1
            from ..graph.framedata import (MAX_SHADOW_CUBE_SLOTS,
                                           MAX_SHADOW_SPOT_SLOTS)
            if l.cast_shadows and l.type == LightType.SPOT and \
                    shadow_slot < MAX_SHADOW_SPOT_SLOTS:
                slot = shadow_slot
                shadow_slot += 1
            if l.cast_shadows and l.type == LightType.POINT and \
                    cube_slot < MAX_SHADOW_CUBE_SLOTS:
                cube = cube_slot
                cube_slot += 1
            row[14] = float(slot)
            row[15] = float(cube)
            n += 1
        n_dir = int(np.sum(table[:n, 3] == 0.0))
        return table, n, n_dir

    def build_scene_buffers(self, env_sh=None, env_specular=None, env_brdf_lut=None) -> SceneBuffers:
        """Full device upload (cold start or after geometry changes)."""
        if self.packed is None:
            self.pack_geometry()
        p = self.packed
        mats, nmats, bounds, ovalid = self.snapshot_objects()
        lights, num_lights, num_dir = self.snapshot_lights()
        mat_table = self.materials.packed_table(self.caps.max_materials)
        f32 = jnp.asarray
        if env_sh is None:
            env_sh = np.zeros((9, 3), np.float32)
        if env_specular is None:
            env_specular = np.zeros((1, 6, 8, 8, 3), np.float32)
        if env_brdf_lut is None:
            env_brdf_lut = np.zeros((32, 32, 2), np.float32)
        if self.textures and len(self.textures):
            tex_pyr, tex_flags = self.textures.strip_pyramid(
                fmt=self.tex_format)
        else:
            from ..ops.textures import strip_layout
            tex_pyr = np.full((strip_layout(4)[1], 128), 0xFFFFFFFF,
                              np.uint32)
            tex_flags = np.zeros((1,), np.int32)
        return SceneBuffers(
            positions=f32(p.positions), normals=f32(p.normals),
            tangents=f32(p.tangents), uvs=f32(p.uvs),
            vert_object=jnp.asarray(p.vert_object),
            indices=jnp.asarray(p.indices),
            tri_material=jnp.asarray(p.tri_material),
            tri_object=jnp.asarray(p.tri_object),
            tex_strips=jnp.asarray(tex_pyr), tex_flags=jnp.asarray(tex_flags),
            vert_joints=jnp.asarray(p.vert_joints),
            vert_weights=f32(p.vert_weights),
            joint_palette=f32(self.snapshot_joint_palette()),
            vertex_table=f32(np.concatenate(
                [p.positions, p.normals, p.uvs,
                 p.vert_object[:, None].astype(np.float32)], axis=1)),
            tri_cluster=jnp.asarray(p.tri_cluster),
            cluster_verts=jnp.asarray(p.cluster_verts),
            cluster_dequant=f32(p.cluster_dequant),
            cluster_tangents=f32(p.cluster_tangents),
            cluster_feeds=jnp.asarray(p.cluster_feeds),
            cluster_made=jnp.asarray(p.cluster_made),
            geom_slot=jnp.arange(p.cluster_verts.shape[0], dtype=jnp.int32),
            group_resident=jnp.ones((self.caps.max_groups,), bool),
            cluster_table=f32(p.cluster_table),
            cluster_object=jnp.asarray(p.cluster_object),
            cluster_windows=f32(pack_cluster_windows(
                p.cluster_table, p.cluster_object, p.num_clusters)),
            num_clusters=jnp.int32(p.num_clusters),
            num_tris=jnp.int32(p.num_tris), num_verts=jnp.int32(p.num_verts),
            object_mats=f32(mats), object_normal_mats=f32(nmats),
            object_bounds=f32(bounds), object_valid=jnp.asarray(ovalid),
            material_table=f32(mat_table),
            lights=f32(lights), num_lights=jnp.int32(num_lights),
            num_dir_lights=jnp.int32(num_dir),
            env_sh=f32(env_sh), env_specular=f32(env_specular),
            env_brdf_lut=f32(env_brdf_lut),
            **self._voxel_fields(),
        )

    def _voxel_fields(self) -> dict:
        v = getattr(self, "_voxel", None)
        if v is None:
            return {}
        return {"voxel_grid": jnp.asarray(v.grid),
                "voxel_meta": jnp.asarray(v.meta()),
                "voxel_sggx": jnp.asarray(
                    v.sggx if v.sggx is not None
                    else np.zeros(2, np.uint32))}

    def build_voxel_scene(self, n: int = 64, **kw):
        """Voxelize the packed world geometry + bake current lights into
        the ray-fallback pyramid (models/voxels.py). Rebuild when lights
        or object transforms change — the analogue of the reference's
        BLAS/TLAS refresh on residency change (Renderer.cpp:2001-2007).
        Returns the VoxelSceneGrid; build_scene_buffers embeds it."""
        from ..models.voxels import build_voxel_scene as _build
        if self.packed is None:
            self.pack_geometry()
        p = self.packed
        mats, _, _, _ = self.snapshot_objects()
        lights, _, num_dir = self.snapshot_lights()
        mat_table = self.materials.packed_table(self.caps.max_materials)
        self._voxel = _build(
            p.positions[:p.num_verts], p.indices[:p.num_tris],
            p.tri_material[:p.num_tris], p.tri_object[:p.num_tris],
            mats, mat_table, lights, num_dir, n=n, **kw)
        return self._voxel

    def update_dynamic(self, buffers: SceneBuffers, t: float = 0.0) -> SceneBuffers:
        """Per-frame refresh of matrices/lights/joints (geometry untouched)."""
        mats, nmats, bounds, ovalid = self.snapshot_objects()
        lights, num_lights, num_dir = self.snapshot_lights()
        return buffers.replace(
            joint_palette=jnp.asarray(self.snapshot_joint_palette(t)),
            object_mats=jnp.asarray(mats),
            object_normal_mats=jnp.asarray(nmats),
            object_bounds=jnp.asarray(bounds),
            object_valid=jnp.asarray(ovalid),
            lights=jnp.asarray(lights),
            num_lights=jnp.int32(num_lights),
            num_dir_lights=jnp.int32(num_dir),
        )

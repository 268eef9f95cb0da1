"""Cluster-scale stress: cost curve of the O(C) LOD cut + compaction.

The reference budgets 30M clusters through a DAG-frontier dispatch
(reference: Renderer.cpp:2494, computeCulling.hlsl:17-50); this engine's
vectorized cut scans ALL resident clusters every frame (ops/clod.py) and
relies on the streamer to bound residency. This tool measures where that
ceiling actually is on one chip so the budget is a documented number, not
a hope. Loop-in-jit timing (20 reps per dispatch; the axon tunnel makes
single-dispatch slopes noisy).

Usage:  python tools/cluster_scale_bench.py [max_log2]

Round-5 measurement (TPU v5 lite, O=512 objects, loop-in-jit x20):
    C=65536:    cut 1.65   cut+compact(3072) 1.64   windowed(1024) 1.67 ms
    C=262144:   cut 2.03   cut+compact(3072) 2.13   windowed(1024) 2.09 ms
    C=1048576:  cut 4.60   cut+compact(3072) 4.25   windowed(1024) 2.37 ms
The full scan is ~1.2 ms fixed + ~3 ns/cluster. The windowed pre-cull
(ops/clod.cut_slots_windowed — the DAG-frontier analogue) breaks the
O(C) slope: past ~256k resident clusters its cost tracks the surviving
window budget, 1.8-2.4 ms at 1M (45-57%% of the scan). Its floor is the
wide row-slab gather of the surviving windows (~1.7 ms at Wmax=1024;
Wmax=512 measured 1.83 ms end-to-end) — NOT the one-hot matrix fetch
(0.31 ms) or the window tests (~0.03 ms).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def synth_buffers(C: int, O: int = 512):
    """Synthetic SceneBuffers with C plausible clusters over O objects.

    Layout matches the bridge's packer: clusters CONTIGUOUS per object,
    spatially local to their object, LOD levels with geometric error decay
    — the structure both the windowed pre-cull (cluster_windows) and the
    reference's DAG traversal exploit."""
    import jax.numpy as jnp
    from basicrenderer_tpu.graph.framedata import SceneBuffers
    from basicrenderer_tpu.models.clusters import CLUSTER_STRIDE
    from basicrenderer_tpu.scene.bridge import pack_cluster_windows

    rng = np.random.default_rng(0)
    per_obj = C // O
    obj_pos = rng.uniform(-50, 50, (O, 3)).astype(np.float32)
    tbl = np.zeros((C, CLUSTER_STRIDE), np.float32)
    cobj = (np.arange(C) // per_obj).astype(np.int32)
    cobj = np.minimum(cobj, O - 1)
    # Per-cluster LOD level: finer levels fill most rows (4:1 decimation).
    lvl = np.minimum((np.arange(C) % per_obj) * 5 // per_obj, 4)
    tbl[:, :3] = obj_pos[cobj] + rng.uniform(-2, 2, (C, 3))
    tbl[:, 3] = rng.uniform(0.3, 0.8, C)             # radius
    tbl[:, 4] = 0.002 * (4.0 ** lvl) * rng.uniform(0.8, 1.2, C)
    tbl[:, 5] = tbl[:, 4] * 4.0                      # parent err
    tbl[:, 6] = lvl
    tbl[:, 7] = np.arange(C) * 128                   # tri offset
    tbl[:, 8] = 128                                  # tri count
    tbl[:, 12:16] = tbl[:, 0:4]
    tbl[:, 16:20] = tbl[:, 0:4]
    mats = np.tile(np.eye(4, dtype=np.float32), (O, 1, 1))
    mats[:, :3, 3] = rng.uniform(-5, 5, (O, 3))
    z1 = jnp.zeros(1, jnp.float32)
    zi = jnp.zeros(1, jnp.int32)
    return SceneBuffers(
        positions=z1.reshape(1, 1) * jnp.zeros((1, 3)),
        normals=jnp.zeros((1, 3)), tangents=jnp.zeros((1, 4)),
        uvs=jnp.zeros((1, 2)), vert_object=zi, indices=jnp.zeros((1, 3), jnp.int32),
        tri_material=zi, tri_object=zi, num_tris=jnp.int32(0),
        num_verts=jnp.int32(0), object_mats=jnp.asarray(mats),
        object_normal_mats=jnp.tile(jnp.eye(3), (O, 1, 1)),
        object_bounds=jnp.zeros((O, 4)), object_valid=jnp.ones(O, bool),
        material_table=jnp.zeros((1, 48)), lights=jnp.zeros((1, 16)),
        num_lights=jnp.int32(0), num_dir_lights=jnp.int32(0),
        vert_joints=jnp.zeros((1, 4), jnp.int32),
        vert_weights=jnp.zeros((1, 4)), joint_palette=jnp.zeros((1, 16)),
        vertex_table=jnp.zeros((1, 10)),
        cluster_verts=jnp.zeros((1, 1152), jnp.uint32),
        cluster_dequant=jnp.zeros((1, 8)),
        cluster_feeds=jnp.full((C,), -1, jnp.int32),
        cluster_made=jnp.full((C,), -1, jnp.int32),
        geom_slot=zi, group_resident=jnp.ones(1, bool),
        tri_cluster=zi, cluster_table=jnp.asarray(tbl),
        cluster_object=jnp.asarray(cobj), num_clusters=jnp.int32(C),
        cluster_windows=jnp.asarray(pack_cluster_windows(tbl, cobj, C)),
        tex_strips=jnp.zeros((1, 128), jnp.uint32),
        tex_flags=jnp.zeros(1, jnp.int32), env_sh=jnp.zeros((9, 3)),
        env_specular=jnp.zeros((1, 6, 4, 4, 3)),
        env_brdf_lut=jnp.zeros((4, 4, 2)),
    )


def main() -> None:
    import jax
    import jax.numpy as jnp
    from basicrenderer_tpu.graph.framedata import FrameConfig, make_view
    from basicrenderer_tpu.ops import clod
    from basicrenderer_tpu.utils import math3d

    max_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = FrameConfig(width=1920, height=1080, enable_clod=True,
                      max_visible_clusters=3072)
    view_m = np.asarray(math3d.np_look_at([0, 10, 60], [0, 0, 0],
                                          [0, 1, 0]), np.float32)
    proj_m = np.asarray(math3d.np_perspective(1.05, 16 / 9, 0.1, None),
                        np.float32)
    vd = make_view(view_m, proj_m, np.array([0, 10, 60], np.float32))

    for lg in range(16, max_log2 + 1, 2):
        C = 1 << lg
        buffers = synth_buffers(C)

        def cut_only(scene, view, eps):
            def body(i, acc):
                sel, _ = clod.select_cluster_cut(
                    scene, view, cfg, jnp.float32(1.0) + eps * i * 1e-12)
                return acc + jnp.sum(sel)
            return jax.lax.fori_loop(0, 20, body, jnp.int32(0))

        def cut_compact(scene, view, eps):
            def body(i, acc):
                sel, _ = clod.select_cluster_cut(
                    scene, view, cfg, jnp.float32(1.0) + eps * i * 1e-12)
                comp = clod.compact_visible_tris(
                    cut=sel, scene=scene, max_visible=3072)
                return acc + comp.indices[0, 0] + jnp.sum(sel)
            return jax.lax.fori_loop(0, 20, body, jnp.int32(0))

        import dataclasses as _dc
        wcfg = _dc.replace(cfg, cut_windows=1024)

        def cut_windowed(scene, view, eps):
            def body(i, acc):
                comp = clod.cut_slots_windowed(
                    scene, view, wcfg,
                    jnp.float32(1.0) + eps * i * 1e-12, 3072)
                return acc + comp.indices[0, 0] + comp.overflow
            return jax.lax.fori_loop(0, 20, body, jnp.int32(0))

        for name, fn in (("cut", cut_only), ("cut+compact", cut_compact),
                         ("windowed(1024)+compact", cut_windowed)):
            j = jax.jit(fn)
            np.asarray(j(buffers, vd, jnp.float32(1e-9)))     # compile
            t0 = time.perf_counter()
            np.asarray(j(buffers, vd, jnp.float32(2e-9)))
            ms = (time.perf_counter() - t0) / 20 * 1000.0
            print(f"C={C}: {name} {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

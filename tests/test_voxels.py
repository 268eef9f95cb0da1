"""Voxel scene grid + cone trace (reference: VoxelGroupBuilder.cpp,
CLodRayTracingSystem.h — see models/voxels.py docstring)."""

import numpy as np
import jax.numpy as jnp

from basicrenderer_tpu.models.voxels import (RADIANCE_SCALE,
                                             build_voxel_scene,
                                             empty_voxel_scene)
from basicrenderer_tpu.ops.voxel_rt import cone_trace


def _quad(size=4.0, z=0.0):
    """Two triangles spanning [-s,s]^2 at height z (XY plane, +Z normal)."""
    s = size
    pos = np.array([[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]],
                   np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return pos, idx


def _scene_arrays(pos, idx, albedo=(0.8, 0.2, 0.1), emissive=(0, 0, 0)):
    mat = np.zeros((2, 32), np.float32)
    mat[0, 0:3] = albedo
    mat[0, 6:9] = emissive
    lights = np.zeros((4, 16), np.float32)
    lights[0, 3] = 0.0                 # directional
    lights[0, 4:7] = (0, 0, -1)        # pointing straight down -Z
    lights[0, 7] = 2.0                 # intensity
    lights[0, 8:11] = 1.0              # white
    tmat = np.zeros(len(idx), np.int32)
    tobj = np.zeros(len(idx), np.int32)
    mats = np.eye(4, dtype=np.float32)[None]
    return tmat, tobj, mats, mat, lights


def test_build_occupancy_and_radiance():
    pos, idx = _quad(size=4.0, z=0.0)
    tmat, tobj, mats, mat, lights = _scene_arrays(pos, idx)
    vox = build_voxel_scene(pos, idx, tmat, tobj, mats, mat, lights,
                            num_dir_lights=1, n=16, ambient=0.0)
    n = vox.n
    l0 = vox.grid[:n ** 3].reshape(n, n, n)
    occ = (l0 & 0xFF) > 0
    # The quad lies in one z-slab; occupied cells exist and are confined
    # to at most two adjacent z slices.
    zs = np.unique(np.nonzero(occ)[0])
    assert occ.sum() > 0
    assert len(zs) <= 2
    # Radiance ~ albedo * N.L * I = (0.8,0.2,0.1) * 1 * 2
    w = l0[occ][0]
    r = ((w >> 24 & 0xFF) / 255.0) ** 2 * RADIANCE_SCALE
    g = ((w >> 16 & 0xFF) / 255.0) ** 2 * RADIANCE_SCALE
    assert abs(r - 1.6) < 0.15
    assert abs(g - 0.4) < 0.08


def test_mip_energy_conservation():
    pos, idx = _quad(size=4.0)
    tmat, tobj, mats, mat, lights = _scene_arrays(pos, idx)
    vox = build_voxel_scene(pos, idx, tmat, tobj, mats, mat, lights,
                            num_dir_lights=1, n=16)
    # Mean alpha is preserved level-to-level (premultiplied averaging).
    means = []
    nl = vox.n
    for off in vox.level_offsets:
        lv = vox.grid[off:off + nl ** 3]
        means.append(((lv & 0xFF) / 255.0).mean())
        nl //= 2
    for a, b in zip(means[:-1], means[1:]):
        assert abs(a - b) < 0.01


def test_trace_hit_and_miss():
    pos, idx = _quad(size=4.0, z=0.0)
    tmat, tobj, mats, mat, lights = _scene_arrays(pos, idx)
    vox = build_voxel_scene(pos, idx, tmat, tobj, mats, mat, lights,
                            num_dir_lights=1, n=32, ambient=0.0,
                            bounds=(np.float32([-4.2, -4.2, -4.2]),
                                    np.float32([4.2, 4.2, 4.2])))
    grid = jnp.asarray(vox.grid)
    origin = jnp.asarray(vox.origin)
    # Ray 0: from above the quad straight down -> hit (low transmittance,
    # reddish). Ray 1: parallel to the quad, far above -> miss (T ~ 1).
    px = jnp.float32([0.0, 0.0])
    py = jnp.float32([0.0, 0.0])
    pz = jnp.float32([3.0, 3.5])
    dx = jnp.float32([0.0, 1.0])
    dy = jnp.float32([0.0, 0.0])
    dz = jnp.float32([-1.0, 0.0])
    r, g, b, t = cone_trace(grid, origin, jnp.float32(vox.cell), vox.n,
                            vox.level_offsets, px, py, pz, dx, dy, dz,
                            steps=24, growth=1.2, cone_tan=0.03)
    r, g, b, t = map(np.asarray, (r, g, b, t))
    assert t[0] < 0.35, t
    assert r[0] > 0.2 and r[0] > g[0]
    assert t[1] > 0.98
    assert abs(r[1]) < 1e-3


def test_empty_grid_traces_clear():
    vox = empty_voxel_scene()
    r, g, b, t = cone_trace(jnp.asarray(vox.grid), jnp.asarray(vox.origin),
                            jnp.float32(vox.cell), vox.n, vox.level_offsets,
                            jnp.float32([0.0]), jnp.float32([0.0]),
                            jnp.float32([0.0]), jnp.float32([1.0]),
                            jnp.float32([0.0]), jnp.float32([0.0]),
                            steps=8)
    assert float(np.asarray(t)[0]) == 1.0


def test_sggx_anisotropic_occlusion():
    """SGGX moments (reference: VoxelGroupBuilder's per-voxel normal
    distributions): a flat quad's voxels occlude a perpendicular ray fully
    but a ray grazing IN the quad's plane only weakly — the isotropic
    trace can't tell the directions apart."""
    pos, idx = _quad(size=4.0, z=0.0)
    tmat, tobj, mats, mat, lights = _scene_arrays(pos, idx)
    vox = build_voxel_scene(pos, idx, tmat, tobj, mats, mat, lights,
                            num_dir_lights=1, n=32, ambient=0.0,
                            bounds=(np.float32([-4.2, -4.2, -4.2]),
                                    np.float32([4.2, 4.2, 4.2])))
    assert vox.sggx is not None and vox.sggx.size == 2 * vox.grid.size
    grid = jnp.asarray(vox.grid)
    sggx = jnp.asarray(vox.sggx)
    origin = jnp.asarray(vox.origin)
    # Ray 0: perpendicular (along -Z, the quad normal) -> blocked.
    # Ray 1: grazing, traveling IN the quad plane at z=0 -> SGGX projected
    # area ~0 -> mostly transmits (isotropically it would be fully
    # blocked after a few steps through occupied cells).
    px = jnp.float32([0.0, -3.9])
    py = jnp.float32([0.0, 0.0])
    pz = jnp.float32([3.0, -0.08])
    dx = jnp.float32([0.0, 1.0])
    dy = jnp.float32([0.0, 0.0])
    dz = jnp.float32([-1.0, 0.0])
    args = (grid, origin, jnp.float32(vox.cell), vox.n, vox.level_offsets,
            px, py, pz, dx, dy, dz)
    kw = dict(steps=24, growth=1.2, cone_tan=0.0)
    _, _, _, t_iso = cone_trace(*args, **kw)
    _, _, _, t_sgx = cone_trace(*args, **kw, sggx=sggx)
    t_iso, t_sgx = np.asarray(t_iso), np.asarray(t_sgx)
    # Perpendicular: both block hard (sigma ~ 1 head-on).
    assert t_sgx[0] < 0.35, (t_iso, t_sgx)
    assert t_sgx[0] < t_iso[0] + 0.1
    # Grazing: isotropic trace kills the ray, SGGX mostly passes it.
    assert t_iso[1] < 0.2, (t_iso, t_sgx)
    assert t_sgx[1] > 0.6, (t_iso, t_sgx)

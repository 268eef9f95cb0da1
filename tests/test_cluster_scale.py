"""Cluster-scale correctness: the vectorized LOD cut + budgeted
compaction stay correct at 2^18 clusters (the scaling ceiling itself is
measured on TPU by tools/cluster_scale_bench.py — reference bar: the
30M-cluster budget, Renderer.cpp:2494)."""

import sys
import os

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from basicrenderer_tpu.graph.framedata import FrameConfig, make_view
from basicrenderer_tpu.ops import clod
from basicrenderer_tpu.utils import math3d
from cluster_scale_bench import synth_buffers


def test_cut_and_compaction_at_quarter_million_clusters():
    C = 1 << 18
    buffers = synth_buffers(C, O=256)
    cfg = FrameConfig(width=1920, height=1080, enable_clod=True,
                      max_visible_clusters=1024)
    view_m = np.asarray(math3d.np_look_at([0, 10, 60], [0, 0, 0],
                                          [0, 1, 0]), np.float32)
    proj_m = np.asarray(math3d.np_perspective(1.05, 16 / 9, 0.1, None),
                        np.float32)
    vd = make_view(view_m, proj_m, np.array([0, 10, 60], np.float32))
    sel, num = clod.select_cluster_cut(buffers, vd, cfg, jnp.float32(1.0))
    sel_np = np.asarray(sel)
    assert sel_np.shape == (C,)
    n = int(np.asarray(num))
    assert 0 < n <= C and n == sel_np.sum()
    comp = clod.compact_visible_tris(cut=sel, scene=buffers,
                                     max_visible=1024)
    # The budget truncates; the overflow counter reports what was dropped.
    kept = int(np.asarray(comp.valid).sum())
    assert kept <= 1024 * 128
    ovf = int(np.asarray(comp.overflow))
    assert (ovf > 0) == (n > 1024), (n, ovf)
    # Tighter tau selects no MORE clusters (finer cut needs more budget,
    # but the SELECTION is monotone in tau for fixed errors).
    sel2, num2 = clod.select_cluster_cut(buffers, vd, cfg,
                                         jnp.float32(4.0))
    assert int(np.asarray(num2)) <= n * 4  # sanity scale, not exact


def test_windowed_cut_parity_vs_full_scan():
    """cut_slots_windowed == compact(select_cluster_cut) when the window
    budget suffices (the hierarchical pre-cull must be exact, not
    approximate — only its COST may differ)."""
    import dataclasses
    C = 1 << 16
    buffers = synth_buffers(C, O=256)
    cfg = FrameConfig(width=1920, height=1080, enable_clod=True,
                      max_visible_clusters=2048, cut_windows=C // 128)
    view_m = np.asarray(math3d.np_look_at([0, 10, 60], [0, 0, 0],
                                          [0, 1, 0]), np.float32)
    proj_m = np.asarray(math3d.np_perspective(1.05, 16 / 9, 0.1, None),
                        np.float32)
    vd = make_view(view_m, proj_m, np.array([0, 10, 60], np.float32))
    for tau in (0.5, 1.0, 3.0):
        sel, _n = clod.select_cluster_cut(buffers, vd, cfg,
                                          jnp.float32(tau))
        ref = clod.compact_visible_tris(cut=sel, scene=buffers,
                                        max_visible=2048)
        win = clod.cut_slots_windowed(buffers, vd, cfg, jnp.float32(tau),
                                      2048)
        np.testing.assert_array_equal(np.asarray(win.slot_cluster),
                                      np.asarray(ref.slot_cluster))
        np.testing.assert_array_equal(np.asarray(win.valid),
                                      np.asarray(ref.valid))
        np.testing.assert_array_equal(np.asarray(win.indices),
                                      np.asarray(ref.indices))
        assert int(np.asarray(win.overflow)) == int(np.asarray(ref.overflow))


def test_windowed_cut_budget_overflow_counts():
    """A too-small window budget truncates and reports overflow."""
    C = 1 << 16
    buffers = synth_buffers(C, O=256)
    cfg = FrameConfig(width=1920, height=1080, enable_clod=True,
                      max_visible_clusters=2048, cut_windows=4)
    view_m = np.asarray(math3d.np_look_at([0, 10, 60], [0, 0, 0],
                                          [0, 1, 0]), np.float32)
    proj_m = np.asarray(math3d.np_perspective(1.05, 16 / 9, 0.1, None),
                        np.float32)
    vd = make_view(view_m, proj_m, np.array([0, 10, 60], np.float32))
    win = clod.cut_slots_windowed(buffers, vd, cfg, jnp.float32(1.0), 2048)
    assert int(np.asarray(win.overflow)) > 0

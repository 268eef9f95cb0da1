"""Full-frame backend parity: the Pallas path (interpret mode) must match
the portable jnp path pixel-for-pixel — the correctness backbone for the
BASELINE pixel-RMSE metric."""

import dataclasses

import numpy as np
import jax

from basicrenderer_tpu.graph.framedata import FrameConfig, FrameParams, make_view
from basicrenderer_tpu.graph.frame import build_frame_fn

from tests.test_frame_e2e import build_test_scene


def test_full_frame_pallas_matches_jnp():
    sc, bridge = build_test_scene()
    buffers = bridge.build_scene_buffers()
    view, proj, pos = sc.camera_matrices(aspect=1.0)
    vd = make_view(view, proj, pos)
    params = FrameParams.default()
    base = FrameConfig(width=128, height=128, tile_h=16, tile_w=128,
                       max_pairs=1 << 12, use_pallas_raster=False)
    pall = dataclasses.replace(base, use_pallas_raster=True,
                               pallas_interpret=True)
    out_ref = jax.jit(build_frame_fn(base))(buffers, vd, params)
    out_pl = jax.jit(build_frame_fn(pall))(buffers, vd, params)

    vis_r = np.asarray(out_ref["vis"])
    vis_p = np.asarray(out_pl["vis"])
    np.testing.assert_array_equal(vis_p, vis_r)
    img_r = np.asarray(out_ref["image"]).astype(np.float32)
    img_p = np.asarray(out_pl["image"]).astype(np.float32)
    rmse = np.sqrt(((img_p - img_r) / 255.0) ** 2).mean()
    assert rmse < 1e-3, f"backend RMSE {rmse}"

"""Page pool + streaming worker: residency, LRU eviction, async loads."""

import time

import numpy as np

from basicrenderer_tpu.models.streaming import PagePool, StreamingWorker


def _page(key, rows=16, lanes=8):
    return np.full((rows, lanes), float(key), np.float32)


def test_pool_upload_and_residency():
    pool = PagePool(num_pages=4, page_rows=16, row_lanes=8)
    s0 = pool.upload(10, _page(10))
    s1 = pool.upload(11, _page(11))
    assert pool.is_resident(10) and pool.is_resident(11)
    assert s0 != s1
    slab = np.asarray(pool.slab)
    assert (slab[s0 * 16:(s0 + 1) * 16] == 10.0).all()
    assert (slab[s1 * 16:(s1 + 1) * 16] == 11.0).all()
    mask = pool.residency_mask(16)
    assert mask[10] and mask[11] and not mask[12]
    t = pool.slot_table(16)
    assert t[10] == s0 and t[12] == -1


def test_pool_lru_eviction():
    pool = PagePool(num_pages=2, page_rows=4, row_lanes=4)
    pool.upload(1, _page(1, 4, 4))
    time.sleep(0.01)
    pool.upload(2, _page(2, 4, 4))
    time.sleep(0.01)
    pool.touch(1)              # 2 becomes LRU
    time.sleep(0.01)
    pool.upload(3, _page(3, 4, 4))
    assert pool.is_resident(1) and pool.is_resident(3)
    assert not pool.is_resident(2)


def test_pool_partial_page_padded():
    pool = PagePool(num_pages=2, page_rows=8, row_lanes=4)
    s = pool.upload(5, _page(5, 3, 4))
    slab = np.asarray(pool.slab)
    assert (slab[s * 8:s * 8 + 3] == 5.0).all()
    assert (slab[s * 8 + 3:(s + 1) * 8] == 0.0).all()


def test_streaming_worker_loads_async():
    pool = PagePool(num_pages=8, page_rows=4, row_lanes=4)
    loaded = []

    def loader(key):
        loaded.append(key)
        return _page(key, 4, 4)

    w = StreamingWorker(pool, loader, budget_per_tick=4)
    for k, prio in [(3, 0.5), (1, 0.1), (7, 0.9)]:
        w.request(k, prio)
    deadline = time.time() + 5
    while w.pending() > 0 or len(loaded) < 3:
        if time.time() > deadline:
            break
        time.sleep(0.01)
    time.sleep(0.1)
    done = w.drain_completed()
    w.stop()
    assert set(done) == {1, 3, 7}
    assert all(pool.is_resident(k) for k in (1, 3, 7))
    # Duplicate requests for resident pages are ignored.
    w2 = StreamingWorker(pool, loader, budget_per_tick=4)
    before = len(loaded)
    w2.request(1)
    time.sleep(0.2)
    w2.stop()
    assert len(loaded) == before


def test_geometry_streamer_parent_chain_closure():
    """Residency must stay downward-closed along the LOD group chain: a
    wanted fine group pulls its coarser ancestors in first, and eviction
    never removes a group while a child is resident — a gapped chain makes
    a coarse ancestor's eff_self=0 fallback double-render over the fine cut
    (ops/clod.py:108; reference: CLodStreamingSystem parent chains)."""
    import types
    from basicrenderer_tpu.models.streaming import GeometryStreamer

    # Synthetic 3-level chain: group 2 (coarse root) <- 1 <- 0 (fine).
    # Cluster rows: made/feeds pairs encode the chain; page g holds group g.
    G = 3
    packed = types.SimpleNamespace(
        cluster_verts=np.arange(G * 8, dtype=np.uint32).reshape(G, 8),
        cluster_dequant=np.zeros((G, 8), np.float32),
        geom_group=np.arange(G, dtype=np.int32),
        cluster_feeds=np.array([0, 1, 2, -1], np.int32),
        cluster_made=np.array([-1, 0, 1, 2], np.int32),
    )
    st = GeometryStreamer(packed, max_groups=G, num_slots=G,
                          loads_per_update=16)
    assert st.group_parents[0] == [1] and st.group_parents[1] == [2]
    # Want ONLY the finest group: the whole chain must come in, root first.
    touched = np.zeros(G, bool)
    touched[0] = True
    st.update(touched)
    assert st.resident[[0, 1, 2]].all()
    # Eviction is leaf-first: groups 1/2 hold resident children, so the
    # first two evictions must take 0 then 1 — never leaving a gap.
    assert st._evict_one(protect=-1)
    assert not st.resident[0] and st.resident[1] and st.resident[2]
    assert st._evict_one(protect=-1)
    assert not st.resident[1] and st.resident[2]


def test_geometry_streamer_priority_order():
    """f32 priority feedback (reference: CLodPriorityMode Max/Sum,
    CLodCommon.h:50-53): with a 1-load budget, the most oversized group
    streams first, and ancestors inherit a descendant's priority so a
    high-priority fine group still loads chain-first."""
    import types
    from basicrenderer_tpu.models.streaming import GeometryStreamer

    # Two independent chains: 0 <- 1 (parent) and 2 (standalone).
    G = 3
    packed = types.SimpleNamespace(
        cluster_verts=np.arange(G * 8, dtype=np.uint32).reshape(G, 8),
        cluster_dequant=np.zeros((G, 8), np.float32),
        geom_group=np.arange(G, dtype=np.int32),
        cluster_feeds=np.array([0, 1, 2], np.int32),
        cluster_made=np.array([-1, 0, -1], np.int32),
    )
    st = GeometryStreamer(packed, max_groups=G, num_slots=G,
                          loads_per_update=1)
    # Standalone group 2 is more urgent than chain 0<-1.
    pri = np.array([1.5, 0.0, 9.0], np.float32)
    st.update(pri)
    assert st.resident[2] and not st.resident[0] and not st.resident[1]
    # Now the fine group 0 is most urgent: its PARENT (1) inherits the
    # priority and loads first (chain consistency), then 0 itself.
    pri = np.array([9.0, 0.0, 1.0], np.float32)
    st.update(pri)
    assert st.resident[1] and not st.resident[0]
    st.update(pri)
    assert st.resident[0]

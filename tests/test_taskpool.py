"""General task pool (reference: TaskSchedulerManager worker pools)."""

import threading
import time

import numpy as np
import pytest

from basicrenderer_tpu.utils.taskpool import TaskPool, shared_pool


def test_map_ordered_results():
    pool = TaskPool(workers=4, name="t")
    try:
        out = pool.map(lambda x: x * x, range(50))
        assert out == [x * x for x in range(50)]
        st = pool.stats()
        assert st["submitted"] == 50 and st["completed"] == 50
    finally:
        pool.shutdown()


def test_priority_order_single_worker():
    pool = TaskPool(workers=1, name="p")
    try:
        order = []
        gate = threading.Event()
        pool.submit(gate.wait)             # occupy the only worker
        futs = [pool.submit(order.append, k, priority=pr)
                for k, pr in (("low", 5.0), ("high", -1.0), ("mid", 1.0))]
        gate.set()
        for f in futs:
            f.result(timeout=5)
        assert order == ["high", "mid", "low"]
    finally:
        pool.shutdown()


def test_exception_delivered_via_future():
    pool = TaskPool(workers=2, name="e")
    try:
        f = pool.submit(lambda: 1 / 0)
        with pytest.raises(ZeroDivisionError):
            f.result(timeout=5)
        # Pool survives the failure.
        assert pool.submit(lambda: 7).result(timeout=5) == 7
    finally:
        pool.shutdown()


def test_group_barrier():
    pool = TaskPool(workers=4, name="g")
    try:
        done = []
        for i in range(16):
            pool.submit(lambda k: (time.sleep(0.005), done.append(k)),
                        i, group="batch")
        assert pool.wait_group("batch", timeout=10)
        assert sorted(done) == list(range(16))
        # Waiting on an unknown/finished group returns immediately.
        assert pool.wait_group("batch", timeout=0.1)
    finally:
        pool.shutdown()


def test_shared_pool_singleton():
    assert shared_pool() is shared_pool()


def test_parallel_strip_pyramid_matches_serial():
    """TextureRegistry layer builds fan out on the pool; content must be
    bit-identical to the serial path."""
    from basicrenderer_tpu.models.textures import TextureRegistry

    rng = np.random.default_rng(3)
    reg = TextureRegistry(resolution=64)
    for k in range(6):                      # >= 4 layers engages the pool
        img = (rng.random((64, 64, 4)) * 255).astype(np.uint8)
        reg.add(img, srgb=(k % 2 == 0),
                alpha_cutoff=0.5 if k == 1 else -1.0)
    par_s, par_f = reg.strip_pyramid()
    par_p, _ = reg.pyramid()
    serial = TextureRegistry.__dict__["_map_layers"].__func__
    try:
        TextureRegistry._map_layers = staticmethod(
            lambda fn, layers: [fn(i) for i in layers])
        ser_s, ser_f = reg.strip_pyramid()
        ser_p, _ = reg.pyramid()
    finally:
        TextureRegistry._map_layers = staticmethod(serial)
    np.testing.assert_array_equal(par_s, ser_s)
    np.testing.assert_array_equal(par_f, ser_f)
    np.testing.assert_array_equal(par_p, ser_p)


def test_cancelled_future_still_releases_group():
    """A queued task cancelled before it runs must still decrement its
    group's outstanding count, or wait_group blocks forever."""
    import threading
    from basicrenderer_tpu.utils.taskpool import TaskPool
    pool = TaskPool(workers=1, name="t-cancel")
    try:
        gate = threading.Event()
        pool.submit(gate.wait, group="g")          # occupies the worker
        fut = pool.submit(lambda: 1, group="g")    # queued
        assert fut.cancel()
        gate.set()
        assert pool.wait_group("g", timeout=10.0)
    finally:
        pool.shutdown()

"""Per-pass device profiling: trace a jitted function and attribute device
time to framework source lines.

Reference analogue: the per-pass GPU timestamp queries + frame task-graph
telemetry (reference: the ~60 CLod counters + pass timings in the Menu's
telemetry view). XLA fuses the hand-authored passes, so the device-true
breakdown comes from the profiler: `jax.profiler` works through the axon
tunnel, and the compiled module's metadata maps every fusion back to the
Python line that created it.

    from basicrenderer_tpu.utils.profiling import profile_fn
    rows = profile_fn(frame_fn, buffers, view, params)   # [(src, ms), ...]

Used by the round-2 optimization sweep (CLAUDE.md): this is how the
strided-slice gathers, K=4 matmul padding, and scatter histograms were
found.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import tempfile
from typing import Any, Callable, List, Tuple

import numpy as np

_META = re.compile(
    r"%(\S+?) = .*?metadata=\{[^}]*?source_file=\"([^\"]+)\"[^}]*?"
    r"source_line=(\d+)")


def _source_map(compiled_text: str) -> dict:
    out = {}
    for line in compiled_text.splitlines():
        m = _META.search(line)
        if m:
            out[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"
    return out


def profile_fn(fn: Callable, *args, iters: int = 5, trace_dir: str = None,
               **kwargs) -> List[Tuple[str, float]]:
    """Run `fn(*args)` under the device profiler and return
    [(source_file:line, ms_per_call), ...] sorted by cost.

    `fn` may be a jitted callable; it is lowered once more to recover the
    fusion -> source map. Works on the axon remote-TPU backend.
    """
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    srcmap = _source_map(compiled.as_text())

    out = jitted(*args, **kwargs)
    np.asarray(jax.tree_util.tree_leaves(out)[0])   # warm + sync

    tdir = trace_dir or tempfile.mkdtemp(prefix="brtpu_prof_")
    jax.profiler.start_trace(tdir)
    for _ in range(iters):
        out = jitted(*args, **kwargs)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    dur = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") == "X" and "dur" in e and not name.startswith(
                ("$", "jit_", "np.asarray", "PjitFunction")):
            src = srcmap.get(name) or srcmap.get(name + ".clone") \
                or f"<{name.split('.')[0]}>"
            dur[src] += e["dur"]
    return [(src, d / (1000.0 * iters)) for src, d in dur.most_common()]


def print_profile(rows: List[Tuple[str, float]], top: int = 25) -> None:
    total = sum(ms for _, ms in rows)
    print(f"device total ~{total:.2f} ms/call")
    for src, ms in rows[:top]:
        print(f"  {ms:8.3f} ms  {src}")

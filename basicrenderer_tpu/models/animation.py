"""Skeletons + keyframe animation.

Reference analogues: SkeletonManager (reference:
BasicRenderer/include/Managers/SkeletonManager.h:16-77 — inverse-bind,
bone transforms, skinning matrix slots) and the Animation module
(BasicRenderer/include/Animation/*.h — keyframed pos/rot/scale channels with
linear/step interpolation, controllers, Skeleton joint hierarchy).

Host-side: clips are sampled into joint-local TRS per frame (numpy),
composed down the hierarchy, multiplied by inverse-bind to produce the
skinning palette that ops/skinning.py consumes on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..utils import math3d


@dataclasses.dataclass
class Skeleton:
    """Joint hierarchy (parents[i] < i; -1 = root) + inverse bind matrices."""
    parents: np.ndarray                  # (J,) i32
    inverse_bind: np.ndarray             # (J, 4, 4) f32
    rest_pos: np.ndarray                 # (J, 3)
    rest_rot: np.ndarray                 # (J, 4) xyzw
    rest_scale: np.ndarray               # (J, 3)
    names: Optional[List[str]] = None

    @property
    def num_joints(self) -> int:
        return len(self.parents)


@dataclasses.dataclass
class Channel:
    """One animated property of one joint."""
    joint: int
    path: str                            # "translation" | "rotation" | "scale"
    times: np.ndarray                    # (N,) f32 seconds
    values: np.ndarray                   # (N, 3|4)
    interpolation: str = "LINEAR"        # LINEAR | STEP


@dataclasses.dataclass
class AnimationClip:
    name: str
    channels: List[Channel]

    @property
    def duration(self) -> float:
        return max((float(c.times[-1]) for c in self.channels if len(c.times)),
                   default=0.0)

    def sample(self, skeleton: Skeleton, t: float, loop: bool = True
               ) -> np.ndarray:
        """Sample local TRS at time t -> (J, 4, 4) local matrices."""
        J = skeleton.num_joints
        pos = skeleton.rest_pos.copy()
        rot = skeleton.rest_rot.copy()
        scl = skeleton.rest_scale.copy()
        dur = self.duration
        if loop and dur > 0:
            t = t % dur
        for ch in self.channels:
            v = _sample_channel(ch, t)
            if ch.path == "translation":
                pos[ch.joint] = v
            elif ch.path == "rotation":
                rot[ch.joint] = v
            elif ch.path == "scale":
                scl[ch.joint] = v
        return _compose_trs_batch(pos, rot, scl)

    def skinning_palette(self, skeleton: Skeleton, t: float,
                         loop: bool = True) -> np.ndarray:
        """(J, 4, 4) object-space skinning matrices = world(joint) @ invbind."""
        local = self.sample(skeleton, t, loop)
        world = np.zeros_like(local)
        for j in range(skeleton.num_joints):
            p = skeleton.parents[j]
            world[j] = local[j] if p < 0 else world[p] @ local[j]
        return (world @ skeleton.inverse_bind).astype(np.float32)


def rest_palette(skeleton: Skeleton) -> np.ndarray:
    """Identity skinning palette (bind pose)."""
    local = _compose_trs_batch(skeleton.rest_pos, skeleton.rest_rot,
                               skeleton.rest_scale)
    world = np.zeros_like(local)
    for j in range(skeleton.num_joints):
        p = skeleton.parents[j]
        world[j] = local[j] if p < 0 else world[p] @ local[j]
    return (world @ skeleton.inverse_bind).astype(np.float32)


def _sample_channel(ch: Channel, t: float) -> np.ndarray:
    times = ch.times
    if len(times) == 0:
        raise ValueError("empty channel")
    if t <= times[0]:
        return ch.values[0]
    if t >= times[-1]:
        return ch.values[-1]
    i = int(np.searchsorted(times, t) - 1)
    if ch.interpolation == "STEP":
        return ch.values[i]
    f = (t - times[i]) / max(times[i + 1] - times[i], 1e-9)
    a, b = ch.values[i], ch.values[i + 1]
    if ch.path == "rotation":
        return np.asarray(math3d.quat_slerp(a, b, float(f)))
    return a * (1 - f) + f * b


def _compose_trs_batch(pos, rot, scl) -> np.ndarray:
    J = len(pos)
    out = np.zeros((J, 4, 4), np.float32)
    for j in range(J):
        out[j] = np.asarray(math3d.compose_trs(pos[j], rot[j], scl[j]))
    return out


class SkeletonRegistry:
    """Host registry of skeletons + playing clips (SkeletonManager analogue)."""

    def __init__(self):
        self.skeletons: List[Skeleton] = []
        self.clips: Dict[int, List[AnimationClip]] = {}
        self._playing: Dict[int, tuple] = {}   # skeleton_id -> (clip_idx, t0)

    def add(self, skeleton: Skeleton) -> int:
        self.skeletons.append(skeleton)
        return len(self.skeletons) - 1

    def add_clip(self, skeleton_id: int, clip: AnimationClip) -> int:
        self.clips.setdefault(skeleton_id, []).append(clip)
        return len(self.clips[skeleton_id]) - 1

    def play(self, skeleton_id: int, clip_idx: int = 0) -> None:
        self._playing[skeleton_id] = (clip_idx, 0.0)

    def palette(self, skeleton_id: int, t: float) -> np.ndarray:
        sk = self.skeletons[skeleton_id]
        playing = self._playing.get(skeleton_id)
        if playing is None or skeleton_id not in self.clips:
            return rest_palette(sk)
        clip_idx, t0 = playing
        return self.clips[skeleton_id][clip_idx].skinning_palette(sk, t - t0)

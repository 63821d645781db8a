"""Compile-time tree schedules for level-vectorized propagation.

The kinematic tree is partitioned into depth levels; bodies within a level
are further grouped by joint signature (the tuple of joint types attached to
the body). Each (level, signature) group is processed as one vectorized
operation, so the number of XLA ops scales with tree DEPTH x distinct
signatures instead of body count — e.g. a 13-body quadruped becomes 4 level
groups of 1/4/4/4 bodies.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ambersim_tpu.core.types import JointType

_CACHE: dict = {}


class TreeSchedule:
    def __init__(self, s):
        nbody = s.nbody
        depth = np.zeros(nbody, dtype=np.int32)
        for b in range(1, nbody):
            depth[b] = depth[s.body_parentid[b]] + 1
        maxdepth = int(depth.max()) if nbody > 1 else 0

        # levels[k]: list of (signature, body_ids, parent_ids, jnt_ids_per_slot)
        self.levels: List[List[Tuple[Tuple[int, ...], np.ndarray, np.ndarray, List[np.ndarray]]]] = []
        for k in range(1, maxdepth + 1):
            ids = np.nonzero(depth == k)[0].astype(np.int32)
            groups: Dict[Tuple[int, ...], List[int]] = {}
            for b in ids:
                jadr, jnum = int(s.body_jntadr[b]), int(s.body_jntnum[b])
                sig = tuple(int(s.jnt_type[j]) for j in range(jadr, jadr + jnum))
                groups.setdefault(sig, []).append(int(b))
            level = []
            for sig, blist in groups.items():
                barr = np.asarray(blist, dtype=np.int32)
                parents = s.body_parentid[barr]
                jnt_slots = [
                    np.asarray([int(s.body_jntadr[b]) + slot for b in blist], dtype=np.int32)
                    for slot in range(len(sig))
                ]
                level.append((sig, barr, parents, jnt_slots))
            self.levels.append(level)

        # bottom-up accumulation pairs: per level (child ids, parent ids), deepest first
        self.reverse_levels = [
            (np.concatenate([g[1] for g in level]), np.concatenate([g[2] for g in level]))
            for level in reversed(self.levels)
        ]

        # joints grouped by type (order-free computations like cdof)
        self.jnt_by_type: Dict[int, np.ndarray] = {}
        for t in (JointType.FREE, JointType.BALL, JointType.SLIDE, JointType.HINGE):
            jids = np.nonzero(s.jnt_type == int(t))[0].astype(np.int32)
            if len(jids):
                self.jnt_by_type[int(t)] = jids


def tree_schedule(s) -> TreeSchedule:
    # Skeleton is content-hashed (types.py), so it is its own safe cache key
    # (id() keys break when a GC'd skeleton's address is reused).
    if s not in _CACHE:
        _CACHE[s] = TreeSchedule(s)
    return _CACHE[s]

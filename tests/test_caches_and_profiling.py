"""Regression tests for cache identity (review finding: id()-keyed caches
returned stale topologies after GC address reuse) and the profiling utils."""

import gc

import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine.schedule import tree_schedule
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

CHAIN = """<mujoco><compiler angle='radian'/><worldbody>
<body pos='0 0 1'><joint axis='0 1 0'/><geom type='sphere' size='.05'/>
  <body pos='0 0 -.2'><joint axis='0 1 0'/><geom type='sphere' size='.05'/>
    <body pos='0 0 -.2'><joint axis='0 1 0'/><geom type='sphere' size='.05'/></body>
  </body>
</body></worldbody></mujoco>"""

STAR = """<mujoco><compiler angle='radian'/><worldbody>
<body pos='0 0 1'><joint axis='0 1 0'/><geom type='sphere' size='.05'/>
  <body pos='.1 0 0'><joint axis='0 1 0'/><geom type='sphere' size='.05'/></body>
  <body pos='-.1 0 0'><joint axis='0 1 0'/><geom type='sphere' size='.05'/></body>
</body></worldbody></mujoco>"""


def test_schedule_cache_keys_by_content_not_id():
    m1 = compile_spec(parse_mjcf_string(CHAIN))
    sched1 = tree_schedule(m1.skel)
    n1 = len(sched1.levels)
    del m1
    gc.collect()
    # allocate repeatedly to encourage id reuse; topology must still resolve
    for _ in range(16):
        m2 = compile_spec(parse_mjcf_string(STAR))
        sched2 = tree_schedule(m2.skel)
        assert len(sched2.levels) == 2, "star topology got a stale schedule"
        del m2
        gc.collect()
    assert n1 == 3


def test_equal_skeletons_share_cache():
    m1 = compile_spec(parse_mjcf_string(CHAIN))
    m2 = compile_spec(parse_mjcf_string(CHAIN))
    assert m1.skel == m2.skel and hash(m1.skel) == hash(m2.skel)
    assert tree_schedule(m1.skel) is tree_schedule(m2.skel)


def test_phase_timer_and_trace(tmp_path):
    from ambersim_tpu.utils.profiling import PhaseTimer, annotate, trace

    t = PhaseTimer()
    x = jnp.arange(8.0)
    with t.phase("work"):
        y = jnp.sum(x * 2)
        t.sync(y)
    assert t.times["work"] > 0
    assert "work" in t.report()

    with trace(str(tmp_path)):
        with annotate("traced"):
            z = jnp.sum(x**2)
            t.sync(z)
    import glob

    assert glob.glob(str(tmp_path) + "/**/*", recursive=True)

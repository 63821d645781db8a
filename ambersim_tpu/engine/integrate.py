"""Integrators: semi-implicit Euler (with implicit joint damping) and RK4.

Semantics match MuJoCo's mj_Euler: velocity update uses qacc; when joint
damping is present and EULERDAMP is not disabled, the damping contribution is
integrated implicitly by solving (M + h*diag(damping)) dv = h*M*qacc.
Position integration is per-joint-type: quaternion expmap for ball/free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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


def _advance_act(m: Model, d: Data, h) -> Data:
    """Integrate actuator activations (dyntype filter/integrator/muscle):
    Euler on act_dot, exact exponential for FILTEREXACT, actrange clamping
    for act-limited actuators (cf. mj_advance)."""
    from ambersim_tpu.core.types import DynType

    s = m.skel
    if s.na == 0:
        return d
    act = d.act + h * d.act_dot
    dyn_u = np.nonzero(s.actuator_dyntype != int(DynType.NONE))[0]
    if bool((s.actuator_dyntype[dyn_u] == int(DynType.FILTEREXACT)).any()):
        tau = jnp.maximum(m.actuator_dynprm[dyn_u, 0], 1e-8)
        exact = d.act + d.act_dot * tau * (1.0 - jnp.exp(-h / tau))
        act = jnp.where(
            jnp.asarray(s.actuator_dyntype[dyn_u] == int(DynType.FILTEREXACT)), exact, act
        )
    if bool(s.actuator_actlimited[dyn_u].any()):
        lo = m.actuator_actrange[dyn_u, 0]
        hi = m.actuator_actrange[dyn_u, 1]
        act = jnp.where(
            jnp.asarray(s.actuator_actlimited[dyn_u]), jnp.clip(act, lo, hi), act
        )
    return d.replace(act=act)


def _qderiv_vel(m: Model, d: Data) -> jax.Array:
    """(nv, nv) analytic derivative of the velocity-dependent smooth forces,
    D = d(qfrc_passive + qfrc_actuator)/d qvel, for implicit-in-velocity
    integration (mjINT_IMPLICITFAST: the Coriolis derivative is omitted).

    Terms: joint damping (-diag), and actuator force dependence on actuator
    velocity (affine gain prm[2] * input + affine bias prm[2]), mapped through
    the transmission moment: D += moment^T diag(df/dvel) moment.
    """
    import jax.numpy as jnp

    from ambersim_tpu.core.types import BiasType, DisableBit as DB, GainType
    from ambersim_tpu.engine import smooth

    s = m.skel
    dtype = d.qpos.dtype
    # mjDSBL_DAMPER removes both the damping force and its implicit-LHS
    # derivative (oracle-verified: qvel is unchanged with the flag set)
    if m.opt.disableflags & DB.DAMPER:
        D = jnp.zeros((s.nv, s.nv), dtype)
    else:
        D = -jnp.diag(jnp.asarray(m.dof_damping, dtype))
        if s.ntendon:
            tj = d.ten_J.astype(dtype)
            D = D - tj.T @ (jnp.asarray(m.tendon_damping, dtype)[:, None] * tj)
    if s.nu and not (m.opt.disableflags & DB.ACTUATION):
        moment = smooth.actuator_moment(m, d)  # (nu, nv)
        inp = smooth.act_input(m, d)
        gaintype = jnp.asarray(s.actuator_gaintype)
        biastype = jnp.asarray(s.actuator_biastype)
        dgain = jnp.where(gaintype == int(GainType.AFFINE), m.actuator_gainprm[:, 2], 0.0) * inp
        dbias = jnp.where(biastype == int(BiasType.AFFINE), m.actuator_biasprm[:, 2], 0.0)
        dfv = dgain + dbias  # (nu,)
        D = D + moment.T @ (dfv[:, None] * moment)
    return D


def _qderiv_vel_ad(m: Model, d: Data, include_bias: bool):
    """Velocity derivative of the qvel-dependent smooth forces that have no
    cheap analytic form — fluid drag (whenever present) and the RNE bias
    force (full 'implicit' integrator only) — via forward-mode autodiff
    through com_vel. jacfwd pushes nv tangent columns through one vectorized
    evaluation (a batched RNEA), the TPU-idiomatic replacement for MuJoCo's
    hand-written mjd_rne_vel/mjd_passive_vel derivatives. Returns None when
    neither term applies (the common case), keeping the fast path free.
    """
    from ambersim_tpu.engine import smooth

    s = m.skel
    # fluid drag is skipped only when BOTH spring and damper are disabled
    # (mj_passive early-exit semantics)
    has_fluid = bool(getattr(s, "has_fluid", False)) and (
        m.opt.disableflags & int(DisableBit.PASSIVE)
    ) != int(DisableBit.PASSIVE)
    if not (include_bias or has_fluid):
        return None

    def frc(v):
        dd = d.replace(qvel=v)
        dd = smooth.com_vel(m, dd)
        out = jnp.zeros(s.nv, d.qpos.dtype)
        if has_fluid:
            out = out + smooth._fluid_force(m, dd)
        if include_bias:
            out = out - smooth.rne(m, dd).qfrc_bias
        return out

    return jax.jacfwd(frc)(d.qvel)


def implicitfast(m: Model, d: Data) -> Data:
    """Implicit-in-velocity step (mjINT_IMPLICITFAST semantics): solve
    (M - h*D) dv = h * (qfrc_smooth + qfrc_constraint) with D the velocity
    derivative of the smooth forces (damping + actuator velocity terms +
    symmetrized fluid drag; Coriolis omitted — the 'fast' variant). D is
    symmetrized as in MuJoCo so the solve stays Cholesky.
    """
    from ambersim_tpu.engine import linalg

    s = m.skel
    h = m.opt.timestep
    d = _advance_act(m, d, h)
    D = _qderiv_vel(m, d)
    Dad = _qderiv_vel_ad(m, d, include_bias=False)
    if Dad is not None:
        # fluid-drag derivative is asymmetric; implicitfast symmetrizes it
        # (MuJoCo mj_implicitSkip) to keep the factorization Cholesky
        D = D + 0.5 * (Dad + Dad.T)
    A = d.qM - h * D
    # A is symmetric for this D (diag + moment^T diag moment) and positive
    # definite for physical damping/velocity gains; tiny ridge for safety.
    A = A + 1e-10 * jnp.eye(s.nv, dtype=A.dtype)
    # total applied force, MuJoCo's own RHS (engine mj_implicitSkip):
    # qfrc_smooth + qfrc_constraint == qM @ qacc up to the solver's gradient
    # residual, and avoids a batched matvec with trailing tiny dims
    rhs = h * (d.qfrc_smooth + d.qfrc_constraint)
    dv = linalg.solve_pd(A, rhs)
    qvel = d.qvel + dv
    qpos = integrate_pos(m, d.qpos, qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, time=d.time + h)


def implicit(m: Model, d: Data) -> Data:
    """Full implicit-in-velocity step (mjINT_IMPLICIT semantics): like
    implicitfast but D additionally includes the exact Coriolis/centrifugal
    derivative d(-qfrc_bias)/dqvel, making (M - h*D) asymmetric — solved with
    a batched LU, mirroring MuJoCo's mj_implicit LU factorization."""
    h = m.opt.timestep
    d = _advance_act(m, d, h)
    D = _qderiv_vel(m, d) + _qderiv_vel_ad(m, d, include_bias=True)
    A = d.qM - h * D
    rhs = h * (d.qfrc_smooth + d.qfrc_constraint)
    dv = jnp.linalg.solve(A, rhs)
    qvel = d.qvel + dv
    qpos = integrate_pos(m, d.qpos, qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, time=d.time + h)


def euler(m: Model, d: Data) -> Data:
    """Semi-implicit Euler step given d.qacc."""
    s = m.skel
    h = m.opt.timestep
    d = _advance_act(m, d, h)
    use_implicit = (
        bool(s.has_damping)
        and not (m.opt.disableflags & DisableBit.EULERDAMP)
        and not (m.opt.disableflags & DisableBit.DAMPER)
    )
    if use_implicit:
        from ambersim_tpu.engine import linalg

        mh = d.qM + h * jnp.diag(m.dof_damping)
        # MuJoCo's mj_Euler RHS is qfrc_smooth + qfrc_constraint; qM @ qacc is
        # identical up to the solver's gradient residual and measured ~7%
        # faster on the flagship rollout (the fused Newton kernel's
        # qfrc_constraint output stays dead code and XLA fuses the matvec)
        rhs = h * (d.qM @ d.qacc)
        dv = linalg.solve_pd(mh, rhs)
        qvel = d.qvel + dv
    else:
        qvel = d.qvel + h * d.qacc
    qpos = integrate_pos(m, d.qpos, qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, time=d.time + h)


def rk4(m: Model, d: Data, forward_fn) -> Data:
    """Classic 4th-order Runge-Kutta over (qpos, qvel[, act]) (mjINT_RK4).

    `forward_fn(m, d)` recomputes qacc for intermediate stages; d must arrive
    with stage-1 forward dynamics already computed."""
    h = m.opt.timestep
    qpos0, qvel0, act0 = d.qpos, d.qvel, d.act

    def deriv(dd):
        return dd.qvel, dd.qacc, dd.act_dot

    k1 = deriv(d)
    d2 = d.replace(
        qpos=integrate_pos(m, qpos0, k1[0], h / 2), qvel=qvel0 + (h / 2) * k1[1], act=act0 + (h / 2) * k1[2]
    )
    k2 = deriv(forward_fn(m, d2))
    d3 = d.replace(
        qpos=integrate_pos(m, qpos0, k2[0], h / 2), qvel=qvel0 + (h / 2) * k2[1], act=act0 + (h / 2) * k2[2]
    )
    k3 = deriv(forward_fn(m, d3))
    d4 = d.replace(qpos=integrate_pos(m, qpos0, k3[0], h), qvel=qvel0 + h * k3[1], act=act0 + h * k3[2])
    k4 = deriv(forward_fn(m, d4))

    vel_avg = (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]) / 6.0
    acc_avg = (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]) / 6.0
    actdot_avg = (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2]) / 6.0
    return d.replace(
        qpos=integrate_pos(m, qpos0, vel_avg, h),
        qvel=qvel0 + h * acc_avg,
        act=act0 + h * actdot_avg,
        time=d.time + h,
    )

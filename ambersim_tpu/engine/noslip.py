"""Noslip post-pass: modified PGS on friction rows (mjOption.noslip_iterations).

MuJoCo's main solvers regularize every constraint row (soft constraints), so
friction forces saturate slightly below the cone boundary and bodies in
stick conditions drift. The noslip solver is a post-processing pass over the
*dual* problem that updates only friction-related forces — dof/tendon
frictionloss rows and the friction components of contacts — with the
regularization R removed (hard friction) and normal forces frozen
(reference semantics surfaced via the mjOption fields the reference loads,
cf. reference ambersim/utils/io_utils.py solver-option plumbing; behavior
parity pinned against the MuJoCo 3.10 C oracle in tests/test_noslip.py).

Dual formulation: with A = J M^-1 J^T and b = aref - J qacc_smooth, the
constraint forces minimize E(f) = 0.5 f^T A f - f^T b subject to the cone
constraints; res = A f - b is the gradient. Updates are Gauss-Seidel in efc
row order (MuJoCo's processing order):

  * frictionloss row i:   f_i <- clip(f_i - res_i / A_ii, -floss, +floss)
  * pyramidal contact, friction axis pair (i1, i2): freeze the pair sum
    s = f1 + f2 (the pair's normal-force contribution) and Newton-step the
    antisymmetric coordinate x = f1 - f2, clipped to |x| <= s:
        g = (res_1 - res_2)/2,  h = (A11 - 2 A12 + A22)/4
        x <- clip(x - g/h, -s, s);   f1,f2 <- (s±x)/2
  * elliptic contact: block-Newton the friction rows f_t (normal frozen),
    then project onto the cone  ||f_t / mu||_2 <= f_N  by scaling.

TPU notes: PGS is inherently sequential, but noslip is opt-in
(noslip_iterations=0 by default keeps it off the hot path), the number of
friction rows is small, and every update is a dense vector op (rank-1
residual update) that XLA fuses well. The slot walk is unrolled at trace
time (static slot layout); iterations run under lax.scan with a
tolerance-masked stop mirroring the Newton loop convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import ConeType, Data, Model

_EPS = 1e-12


def _pair_update(f, res, A, i1, i2):
    """One pyramidal friction-axis update (frozen pair sum)."""
    s = f[i1] + f[i2]
    x = f[i1] - f[i2]
    g = 0.5 * (res[i1] - res[i2])
    h = 0.25 * (A[i1, i1] - 2.0 * A[i1, i2] + A[i2, i2])
    x_new = jnp.clip(x - g / jnp.maximum(h, _EPS), -s, s)
    df = 0.5 * (x_new - x)
    res = res + (A[:, i1] - A[:, i2]) * df
    f = f.at[i1].add(df).at[i2].add(-df)
    return f, res


def noslip(m: Model, d: Data) -> Data:
    """Run noslip_iterations of the friction post-pass; returns updated Data
    (efc_force, qfrc_constraint, qacc, qacc_warmstart)."""
    s = m.skel
    iters = int(m.opt.noslip_iterations)
    if iters <= 0 or s.nefc == 0:
        return d
    from ambersim_tpu.engine import linalg

    J = d.efc_J
    MinvJ = jax.vmap(lambda r: linalg.cho_solve(d.qLD, r))(J)  # (nefc, nv) = (M^-1 J^T)^T
    A = J @ MinvJ.T
    b = d.efc_aref - J @ d.qacc_smooth
    f0 = d.efc_force
    res0 = A @ f0 - b

    elliptic = m.opt.cone == int(ConeType.ELLIPTIC)
    ne, nf = int(s.ne), int(s.nf)
    fl_rows = list(range(ne, ne + nf))

    # static walk over contact slots: (adr, cdim) per slot
    slots = [(int(s.con_efcadr[i]), int(s.con_dim[i]), i) for i in range(s.ncon)]

    def sweep(carry):
        f, res = carry
        for i in fl_rows:
            floss = d.efc_frictionloss[i]
            x = jnp.clip(f[i] - res[i] / jnp.maximum(A[i, i], _EPS), -floss, floss)
            df = x - f[i]
            res = res + A[:, i] * df
            f = f.at[i].set(x)
        for adr, cdim, slot in slots:
            if cdim <= 1:
                continue
            if not elliptic:
                for k in range(cdim - 1):
                    f, res = _pair_update(f, res, A, adr + 2 * k, adr + 2 * k + 1)
            else:
                rows = np.arange(adr + 1, adr + cdim)
                At = A[np.ix_(rows, rows)] + _EPS * jnp.eye(cdim - 1, dtype=f.dtype)
                ft = f[rows] - jnp.linalg.solve(At, res[rows])
                # cone projection: ||ft/mu|| <= fN (normal frozen)
                mu = jnp.maximum(d.contact.friction[slot, : cdim - 1], _EPS)
                fN = f[adr]
                nrm = jnp.linalg.norm(ft / mu)
                scale = jnp.where(nrm > fN, fN / jnp.maximum(nrm, _EPS), 1.0)
                ft = ft * scale
                df = ft - f[rows]
                res = res + A[:, rows] @ df
                f = f.at[rows].set(ft)
        return f, res

    def cost(f):
        return 0.5 * f @ (A @ f) - f @ b

    # tolerance-masked fixed iteration (mirrors the Newton loop convention:
    # converged states keep their values; batch envs idle out together)
    scale = m.opt.noslip_tolerance * s.nv * jnp.maximum(jnp.sum(m.body_mass), 1.0)

    def body(carry, _):
        f, res, c_prev, active = carry
        f_n, res_n = sweep((f, res))
        c_n = cost(f_n)
        take = active
        f = jax.tree.map(lambda a, b_: jnp.where(take, a, b_), f_n, f)
        res = jnp.where(take, res_n, res)
        active = active & (c_prev - c_n > scale)
        return (f, res, jnp.where(take, c_n, c_prev), active), None

    carry0 = (f0, res0, cost(f0), jnp.asarray(True))
    if iters <= 4:
        carry = carry0
        for _ in range(iters):
            carry, _ = body(carry, None)
    else:
        carry, _ = jax.lax.scan(body, carry0, None, length=iters)
    f = carry[0]

    qacc = d.qacc_smooth + f @ MinvJ
    return d.replace(
        efc_force=f,
        qfrc_constraint=J.T @ f,
        qacc=qacc,
        qacc_warmstart=qacc,
    )

"""Newton constraint solver with exact line search over the piecewise-
quadratic primal cost (the role of MJX's Newton solver in the reference's
hot loop; iterations/ls_iterations semantics as surfaced at reference
ambersim/utils/io_utils.py:143-144, 213-217).

Primal formulation (MuJoCo): minimize over qacc
    0.5*(a - a_smooth)^T M (a - a_smooth) + sum_i s_i(J_i a - aref_i)
with per-row cost s_i:
    equality rows:        0.5*D*x^2                      (always active)
    friction rows:        Huber(x): quadratic until |D*x| = frictionloss,
                          then linear
    limit/contact rows:   0.5*D*x^2 * (x < 0)
Rows gated off by efc_active contribute nothing.

TPU-first: dense J (nefc x nv), Hessian assembled with one einsum and solved
with a dense Cholesky - MXU work under vmap; iteration uses lax.while_loop
(converged envs in a vmapped batch simply idle until the slowest finishes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ambersim_tpu.core.types import Data, DisableBit, Model


class _Ctx(NamedTuple):
    qacc: jax.Array
    jar: jax.Array  # J @ qacc - aref
    cost: jax.Array
    prev_cost: jax.Array
    it: jax.Array


def _row_costs(m: Model, d: Data, jar: jax.Array):
    """Per-row cost, force (negative gradient dcost/djar), and quadratic mask."""
    s = m.skel
    ne, nf, nl = s.ne, s.nf, s.nl
    D = d.efc_D
    fl = d.efc_frictionloss
    active = d.efc_active

    is_eq = jnp.arange(s.nefc) < ne
    is_fric = (jnp.arange(s.nefc) >= ne) & (jnp.arange(s.nefc) < ne + nf)
    # limits + contacts: one-sided
    one_sided = ~(is_eq | is_fric)

    quad_cost = 0.5 * D * jar * jar
    quad_force = -D * jar

    # friction Huber: linear beyond |D*jar| > fl
    lin = jnp.abs(D * jar) > fl
    fric_cost = jnp.where(lin, fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(D, 1e-12), quad_cost)
    fric_force = jnp.where(lin, -jnp.sign(jar) * fl, quad_force)

    gated = jnp.where(one_sided, jar < 0, True)
    cost = jnp.where(is_fric, fric_cost, quad_cost) * gated * active
    force = jnp.where(is_fric, fric_force, quad_force) * gated * active
    # rows contributing to the Hessian (quadratic region only)
    quad = jnp.where(is_fric, ~lin, gated) & active
    return cost, force, quad


def _total_cost(m: Model, d: Data, qacc: jax.Array, jar: jax.Array) -> jax.Array:
    dacc = qacc - d.qacc_smooth
    smooth_cost = 0.5 * dacc @ (d.qM @ dacc)
    cost, _, _ = _row_costs(m, d, jar)
    return smooth_cost + jnp.sum(cost)


def _line_search(m: Model, d: Data, qacc, jar, p, jp):
    """Exact-ish scalar Newton on the piecewise-quadratic phi(t) = cost(a + t p)."""
    mp = d.qM @ p
    ma = d.qM @ (qacc - d.qacc_smooth)
    pmp = p @ mp
    pma = p @ ma

    def phi_grad_hess(t):
        jart = jar + t * jp
        _, force, quad = _row_costs(m, d, jart)
        # dcost/dt = p^T M (a - as) + t p^T M p + sum_i (-force_i) * jp_i
        g = pma + t * pmp - jnp.sum(force * jp)
        h = pmp + jnp.sum(jnp.where(quad, d.efc_D * jp * jp, 0.0))
        return g, h

    # scalar Newton on t: unrolled when short (straight-line code fuses into
    # few kernels), fori_loop when long (bounded compile time)
    ls_iters = max(m.opt.ls_iterations, 1)
    t = jnp.zeros((), qacc.dtype)
    if ls_iters <= 8:
        for _ in range(ls_iters):
            g, h = phi_grad_hess(t)
            t = t - g / jnp.maximum(h, 1e-12)
    else:
        def ls_body(_, t):
            g, h = phi_grad_hess(t)
            return t - g / jnp.maximum(h, 1e-12)

        t = jax.lax.fori_loop(0, ls_iters, ls_body, t)
    return jnp.clip(t, 0.0, 4.0)


def solve(m: Model, d: Data) -> Data:
    """Dispatch on opt.solver: Newton (default) or preconditioned nonlinear CG
    (the reference selects CG for older engines — io_utils.py:161-183)."""
    s = m.skel
    if s.nefc == 0 or s.nv == 0:
        return d.replace(qacc=d.qacc_smooth)
    from ambersim_tpu.core.types import SolverType

    if m.opt.solver == int(SolverType.CG):
        return _solve_cg(m, d)
    return _solve_newton(m, d)


def _solve_newton(m: Model, d: Data) -> Data:
    s = m.skel
    dtype = d.qpos.dtype

    J = d.efc_J
    aref = d.efc_aref

    def make_ctx(qacc):
        jar = J @ qacc - aref
        return _Ctx(qacc=qacc, jar=jar, cost=_total_cost(m, d, qacc, jar), prev_cost=jnp.inf, it=jnp.zeros((), jnp.int32))

    ctx0 = make_ctx(d.qacc_smooth)
    if not (m.opt.disableflags & DisableBit.WARMSTART):
        ctx_ws = make_ctx(d.qacc_warmstart)
        ctx0 = jax.tree.map(lambda a, b: jnp.where(ctx_ws.cost < ctx0.cost, a, b), ctx_ws, ctx0)

    # scale-invariant tolerance (mirrors MuJoCo's scaled improvement test)
    tol = m.opt.tolerance * s.nv * jnp.maximum(jnp.sum(m.body_mass), 1.0)

    from ambersim_tpu.engine import linalg

    def body(ctx: _Ctx):
        _, force, quad = _row_costs(m, d, ctx.jar)
        grad = d.qM @ (ctx.qacc - d.qacc_smooth) - J.T @ force
        h_diag = jnp.where(quad, d.efc_D, 0.0)
        H = d.qM + jnp.einsum("iv,i,iw->vw", J, h_diag, J)
        H = H + 1e-8 * jnp.eye(s.nv, dtype=dtype)
        p = -linalg.solve_pd(H, grad)
        jp = J @ p
        t = _line_search(m, d, ctx.qacc, ctx.jar, p, jp)
        qacc = ctx.qacc + t * p
        jar = ctx.jar + t * jp
        new_cost = _total_cost(m, d, qacc, jar)
        # masked update: keep iterating only while improving beyond tolerance
        improved = new_cost < ctx.cost
        active = ctx.prev_cost - ctx.cost > tol
        take = improved & active
        qacc = jnp.where(take, qacc, ctx.qacc)
        jar = jnp.where(take, jar, ctx.jar)
        return _Ctx(
            qacc=qacc,
            jar=jar,
            cost=jnp.where(take, new_cost, ctx.cost),
            prev_cost=jnp.where(active, ctx.cost, ctx.prev_cost),
            it=ctx.it + 1,
        )

    # Newton iterations with masked convergence — under huge env batches a
    # while_loop would run until the slowest env converges anyway, and
    # straight-line (or scan) code fuses far better on TPU. Unroll only
    # short iteration counts to bound compile time.
    iters = max(m.opt.iterations, 1)
    if iters <= 8:
        ctx = ctx0
        for _ in range(iters):
            ctx = body(ctx)
    else:
        ctx = jax.lax.scan(lambda c, _: (body(c), None), ctx0, None, length=iters)[0]

    _, force, _ = _row_costs(m, d, ctx.jar)
    qfrc_constraint = J.T @ force
    return d.replace(
        qacc=ctx.qacc,
        qfrc_constraint=qfrc_constraint,
        efc_force=force,
        qacc_warmstart=ctx.qacc,
    )


def _solve_cg(m: Model, d: Data) -> Data:
    """Polak-Ribiere nonlinear CG on the primal cost, preconditioned with
    M^{-1} (mirrors MuJoCo's CG solver), exact line search per iteration."""
    from ambersim_tpu.engine import linalg

    s = m.skel
    J = d.efc_J
    aref = d.efc_aref

    def grad_fn(qacc, jar):
        _, force, _ = _row_costs(m, d, jar)
        return d.qM @ (qacc - d.qacc_smooth) - J.T @ force

    def make_ctx(qacc):
        jar = J @ qacc - aref
        return (qacc, jar, _total_cost(m, d, qacc, jar))

    qacc, jar, cost = make_ctx(d.qacc_smooth)
    if not (m.opt.disableflags & DisableBit.WARMSTART):
        qw, jw, cw = make_ctx(d.qacc_warmstart)
        better = cw < cost
        qacc = jnp.where(better, qw, qacc)
        jar = jnp.where(better, jw, jar)
        cost = jnp.where(better, cw, cost)

    tol = m.opt.tolerance * s.nv * jnp.maximum(jnp.sum(m.body_mass), 1.0)
    g = grad_fn(qacc, jar)
    mg = linalg.cho_solve(d.qLD, g)
    p = -mg

    def body(carry):
        qacc, jar, cost, prev_cost, g, mg, p = carry
        jp = J @ p
        t = _line_search(m, d, qacc, jar, p, jp)
        qacc_n = qacc + t * p
        jar_n = jar + t * jp
        cost_n = _total_cost(m, d, qacc_n, jar_n)
        improved = (cost_n < cost) & (prev_cost - cost > tol)
        qacc_n = jnp.where(improved, qacc_n, qacc)
        jar_n = jnp.where(improved, jar_n, jar)
        g_n = grad_fn(qacc_n, jar_n)
        mg_n = linalg.cho_solve(d.qLD, g_n)
        denom = jnp.maximum(g @ mg, 1e-12)
        beta = jnp.maximum(0.0, g_n @ (mg_n - mg) / denom)
        p_n = -mg_n + beta * p
        return (qacc_n, jar_n, jnp.where(improved, cost_n, cost), cost, g_n, mg_n, p_n)

    carry = (qacc, jar, cost, jnp.asarray(jnp.inf, cost.dtype), g, mg, p)
    iters = max(m.opt.iterations, 1)
    if iters <= 8:
        for _ in range(iters):
            carry = body(carry)
    else:
        carry = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=iters)[0]
    qacc, jar = carry[0], carry[1]

    _, force, _ = _row_costs(m, d, jar)
    return d.replace(
        qacc=qacc,
        qfrc_constraint=J.T @ force,
        efc_force=force,
        qacc_warmstart=qacc,
    )

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
import numpy as np

from ambersim_tpu.core.types import ConeType, Data, DisableBit, Model
from ambersim_tpu.engine.constraint import PyramidStructure, _pyramid_structure  # noqa: F401

# PyramidStructure/_pyramid_structure live in engine.constraint (colocated
# with the row walk they mirror) and are re-exported here for the solver's
# consumers and tests.


class _Ctx(NamedTuple):
    qacc: jax.Array
    jar: jax.Array  # J @ qacc - aref
    cost: jax.Array
    prev_cost: jax.Array
    it: jax.Array


_META_CACHE: dict = {}


def _elliptic_meta(s):
    """Static per-condim contact blocks: [(cdim, slots (S,), rows (S, cdim),
    base, full)].

    base is the first row index when the block is the CONTIGUOUS TAIL of the
    efc layout (single condim across contacts — the common case, e.g. the
    quadruped): then every jar[rows]/efc_*[rows] gather and cost.at[rows]
    scatter in the elliptic path collapses to slice+reshape / concatenate.
    Scatters under a big env vmap are catastrophic on TPU (the gather/scatter
    spelling measured 268x slower than pyramidal on the quadruped bench);
    the sliced spelling is what makes elliptic cones usable at batch scale.
    full marks slots == arange(ncon) so per-slot contact arrays need no
    gather either; base is None for mixed-condim models (general path)."""
    key = (s, "elliptic_meta")
    if key not in _META_CACHE:
        # Guard the flip-opt.cone-after-compile footgun: the efc layout is
        # static (built by the compiler for the cone the model was compiled
        # with). A pyramidal layout read as elliptic silently computes wrong
        # physics (2(k-1) rows per contact vs k); detect it by row-count.
        if len(s.con_dim):
            first = int(np.min(s.con_efcadr))
            expected = int(sum(max(int(c), 1) for c in s.con_dim))
            if int(s.nefc) - first != expected:
                raise ValueError(
                    "elliptic solve on a model whose constraint layout is not "
                    "elliptic — recompile with <option cone=\"elliptic\"> (or "
                    "loader cone override) instead of flipping opt.cone on a "
                    "compiled Model"
                )
        meta = []
        cdims = sorted(set(int(x) for x in s.con_dim))
        for cdim in cdims:
            if cdim == 1:
                continue
            slots = np.nonzero(s.con_dim == cdim)[0]
            rows = s.con_efcadr[slots][:, None] + np.arange(cdim)[None, :]
            flat = rows.reshape(-1)
            base = None
            if (
                len(cdims) == 1
                and flat.size
                and np.array_equal(flat, np.arange(flat[0], flat[0] + flat.size))
                and int(flat[-1]) + 1 == int(s.nefc)
            ):
                base = int(flat[0])
            full = np.array_equal(slots, np.arange(int(s.ncon)))
            meta.append((cdim, slots, rows, base, full))
        _META_CACHE[key] = meta
    return _META_CACHE[key]


def _is_elliptic(m: Model) -> bool:
    return m.opt.cone == int(ConeType.ELLIPTIC) and len(_elliptic_meta(m.skel)) > 0


def _elliptic_zone(m: Model, d: Data, jar: jax.Array, slots, rows, base=None, full=False):
    """Second-order-cone projection state for one condim block.

    Coordinates are mu-scaled so the cone is circular (verified against the
    C oracle: cone parameter mu = mu0/sqrt(impratio), friction residuals
    y_i = jar_i * (mu_i/mu0) * sqrt(impratio), all rows weighted by the
    normal row's D). Zones: bottom (mu*N <= -T, full quadratic clamp), top
    (N >= mu*T, no force), middle (projection onto the cone boundary).

    base/full: contiguous-tail fast path (see _elliptic_meta) — slices and
    reshapes instead of row gathers."""
    c = d.contact
    cdim = rows.shape[1]
    if base is not None:
        S = rows.shape[0]
        x = jar[base : base + S * cdim].reshape(S, cdim)
        active = d.efc_active[base : base + S * cdim].reshape(S, cdim)[:, 0]
        D_rows = d.efc_D[base : base + S * cdim].reshape(S, cdim)
        Dn = D_rows[:, 0]
    else:
        x = jar[rows]  # (S, cdim)
        active = d.efc_active[rows[:, 0]]
        D_rows = d.efc_D[rows]
        Dn = d.efc_D[rows[:, 0]]
    fr = c.friction if full else c.friction[slots]
    mu_vec = fr[:, : cdim - 1]
    mu0 = jnp.maximum(fr[:, 0], 1e-12)
    sq = jnp.sqrt(m.opt.impratio)
    mu = mu0 / sq
    scale = mu_vec / mu0[:, None] * sq  # (S, cdim-1)
    y = x[:, 1:] * scale
    N = x[:, 0]
    T2 = jnp.sum(y * y, axis=-1)
    T = jnp.sqrt(jnp.maximum(T2, 1e-24))
    bottom = mu * N <= -T
    top = N >= mu * T
    middle = ~(bottom | top)
    cfac = (mu * T - N) / (1 + mu * mu)  # > 0 in the middle zone
    cost = jnp.where(
        bottom, 0.5 * Dn * (N * N + T2), jnp.where(middle, 0.5 * Dn * cfac * cfac * (1 + mu * mu), 0.0)
    )
    yhat = y / T[:, None]
    fN = jnp.where(bottom, -Dn * N, jnp.where(middle, Dn * cfac, 0.0))
    fY = jnp.where(
        bottom[:, None],
        -Dn[:, None] * y,
        jnp.where(middle[:, None], (-Dn * cfac * mu)[:, None] * yhat, 0.0),
    )
    f_rows = jnp.concatenate([fN[:, None], fY * scale], axis=1) * active[:, None]
    return {
        "active": active, "mu": mu, "scale": scale, "yhat": yhat, "N": N, "T": T,
        "Dn": Dn, "bottom": bottom, "middle": middle, "cfac": cfac,
        "cost": cost * active, "f_rows": f_rows, "D_rows": D_rows,
    }


def _elliptic_W(m: Model, d: Data, jar: jax.Array):
    """Per-block (rows, base, W) Hessian weights: H += J_rows^T W J_rows."""
    out = []
    for cdim, slots, rows, base, full in _elliptic_meta(m.skel):
        z = _elliptic_zone(m, d, jar, slots, rows, base, full)
        S = rows.shape[0]
        dtype = jar.dtype
        mu, scale, yhat = z["mu"], z["scale"], z["yhat"]
        Dn, cfac, T = z["Dn"], z["cfac"], z["T"]
        one = 1.0 + mu * mu
        # middle zone: Dn/(1+mu^2) v v^T with v = (-1, mu*yhat*scale), plus
        # the norm curvature Dn*mu*cfac/T (I - yhat yhat^T) on friction dims
        v = jnp.concatenate([-jnp.ones((S, 1), dtype), mu[:, None] * yhat * scale], axis=1)
        W_mid = (Dn / one)[:, None, None] * v[:, :, None] * v[:, None, :]
        eye_f = jnp.eye(cdim - 1, dtype=dtype)
        curv = (Dn * mu * cfac / jnp.maximum(T, 1e-12))[:, None, None] * (
            eye_f[None] - yhat[:, :, None] * yhat[:, None, :]
        ) * (scale[:, :, None] * scale[:, None, :])
        # add curv into the friction block via zero-padding, NOT .at[].add:
        # a scatter-add on a vmapped operand lowers to serialized
        # dynamic-update-slices on TPU (measured 11 ms/step PER CALL SITE at
        # batch 1024 — 94% of the whole elliptic step before this change)
        curv_pad = jnp.concatenate(
            [
                jnp.zeros((S, 1, cdim), dtype),
                jnp.concatenate([jnp.zeros((S, cdim - 1, 1), dtype), curv], axis=2),
            ],
            axis=1,
        )
        W_mid = W_mid + curv_pad
        # bottom zone: plain diagonal D
        W_bot = jax.vmap(jnp.diag)(z["D_rows"])
        W = jnp.where(
            z["middle"][:, None, None], W_mid, jnp.where(z["bottom"][:, None, None], W_bot, 0.0)
        )
        W = W * z["active"][:, None, None]
        out.append((rows, base, W))
    return out


def _rows_take(x: jax.Array, rows, base):
    """x[rows] over the leading axis — slice+reshape on the contiguous-tail
    fast path (no gather)."""
    if base is None:
        return x[rows]
    S, cdim = rows.shape
    return x[base : base + S * cdim].reshape((S, cdim) + x.shape[1:])


def _row_costs_pure(jar: jax.Array, D, fl, active, ne: int, nf: int):
    """Per-row cost/force/quad-mask for pyramidal-cone rows, on plain arrays
    (shared by the jnp path and the Pallas dispatch fallback)."""
    nefc = jar.shape[-1]
    idx = jnp.arange(nefc)
    is_eq = idx < ne
    is_fric = (idx >= ne) & (idx < ne + nf)
    one_sided = ~(is_eq | is_fric)
    act_b = active if active.dtype == jnp.bool_ else active > 0.5

    quad_cost = 0.5 * D * jar * jar
    quad_force = -D * jar

    # friction Huber: linear beyond |D*jar| > fl
    lin = jnp.abs(D * jar) > fl
    fric_cost = jnp.where(lin, fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(D, 1e-12), quad_cost)
    fric_force = jnp.where(lin, -jnp.sign(jar) * fl, quad_force)

    gated = jnp.where(one_sided, jar < 0, True)
    cost = jnp.where(is_fric, fric_cost, quad_cost) * gated * act_b
    force = jnp.where(is_fric, fric_force, quad_force) * gated * act_b
    # rows contributing to the Hessian (quadratic region only)
    quad = jnp.where(is_fric, ~lin, gated) & act_b
    return cost, force, quad


def _row_costs(m: Model, d: Data, jar: jax.Array):
    """Per-row cost, force (negative gradient dcost/djar), and quadratic mask."""
    s = m.skel
    cost, force, quad = _row_costs_pure(
        jar, d.efc_D, d.efc_frictionloss, d.efc_active, s.ne, s.nf
    )

    if _is_elliptic(m):
        # overwrite contact block rows with the cone-projection cost/force;
        # their Hessian contribution comes from _elliptic_W, not quad rows
        for cdim, slots, rows, base, full in _elliptic_meta(s):
            z = _elliptic_zone(m, d, jar, slots, rows, base, full)
            if base is not None:
                # contiguous tail: rebuild by concatenation (no scatters)
                S = rows.shape[0]
                blk_cost = jnp.concatenate(
                    [z["cost"][:, None], jnp.zeros((S, cdim - 1), cost.dtype)], axis=1
                )
                cost = jnp.concatenate([cost[:base], blk_cost.reshape(-1)])
                force = jnp.concatenate([force[:base], z["f_rows"].reshape(-1)])
                quad = jnp.concatenate(
                    [quad[:base], jnp.zeros(S * cdim, dtype=quad.dtype)]
                )
            else:
                cost = cost.at[rows].set(0.0)
                cost = cost.at[rows[:, 0]].set(z["cost"])
                force = force.at[rows].set(z["f_rows"])
                quad = quad.at[rows].set(False)
    return cost, force, quad


def _total_cost(m: Model, d: Data, qacc: jax.Array, jar: jax.Array) -> jax.Array:
    dacc = qacc - d.qacc_smooth
    smooth_cost = 0.5 * dacc @ (d.qM @ dacc)
    s = m.skel
    meta = _elliptic_meta(s) if _is_elliptic(m) else []
    if len(meta) == 1 and meta[0][3] is not None:
        # contiguous single-cdim tail: cone cost from per-block scalars
        # (cost-only — skips the force/quad tensor builds of _row_costs)
        cdim, slots, rows, base, full = meta[0]
        c = d.contact
        fr = c.friction if full else c.friction[slots]
        mu0 = jnp.maximum(fr[:, 0], 1e-12)
        sq = jnp.sqrt(m.opt.impratio)
        mu = mu0 / sq
        scale = fr[:, : cdim - 1] / mu0[:, None] * sq
        x = _rows_take(jar, rows, base)
        y = x[:, 1:] * scale
        N = x[:, 0]
        T2 = jnp.sum(y * y, -1)
        T = jnp.sqrt(jnp.maximum(T2, 1e-24))
        act = _rows_take(d.efc_active, rows, base)[:, 0]
        Dn = _rows_take(d.efc_D, rows, base)[:, 0]
        one = 1.0 + mu * mu
        bottom = mu * N <= -T
        mid = ~(bottom | (N >= mu * T))
        cfac = (mu * T - N) / one
        blk = jnp.where(bottom, 0.5 * Dn * (N * N + T2), jnp.where(mid, 0.5 * Dn * cfac * cfac * one, 0.0))
        head_cost, _, _ = _row_costs_pure(
            jar[:base], d.efc_D[:base], d.efc_frictionloss[:base], d.efc_active[:base], s.ne, s.nf
        )
        return smooth_cost + jnp.sum(head_cost) + jnp.sum(blk * act)
    cost, _, _ = _row_costs(m, d, jar)
    return smooth_cost + jnp.sum(cost)


def _line_search(m: Model, d: Data, qacc, jar, p, jp):
    """Exact-ish scalar Newton on the piecewise-quadratic phi(t) = cost(a + t p)."""
    mp = d.qM @ p
    ma = d.qM @ (qacc - d.qacc_smooth)
    pmp = p @ mp
    pma = p @ ma

    elliptic = _is_elliptic(m)
    s = m.skel
    meta = _elliptic_meta(s) if elliptic else []
    scalar_path = elliptic and len(meta) == 1 and meta[0][3] is not None

    if scalar_path:
        # Closed-form cone terms: along the search ray jar + t*jp, each
        # cone block's zone state is a function of per-block SCALARS
        # (N(t) = N0 + t dN linear; T(t)^2 = a + 2bt + ct^2 quadratic), so
        # every line-search iteration is pure (S,)-scalar math — no
        # (S, cdim[,nv]) tensor rebuilds. The tensor spelling re-instantiated
        # ~2 small einsums per ls iteration and was ~half the remaining
        # elliptic step time (benchmarks/hlo_stats.py).
        cdim, slots, rows, base, full = meta[0]
        c = d.contact
        fr = c.friction if full else c.friction[slots]
        mu0 = jnp.maximum(fr[:, 0], 1e-12)
        sq = jnp.sqrt(m.opt.impratio)
        mu = mu0 / sq
        scale = fr[:, : cdim - 1] / mu0[:, None] * sq
        x0 = _rows_take(jar, rows, base)
        dx = _rows_take(jp, rows, base)
        y0 = x0[:, 1:] * scale
        dy = dx[:, 1:] * scale
        N0, dN = x0[:, 0], dx[:, 0]
        aq = jnp.sum(y0 * y0, -1)
        bq = jnp.sum(y0 * dy, -1)
        cq = jnp.sum(dy * dy, -1)
        act = _rows_take(d.efc_active, rows, base)[:, 0]
        D_rows = _rows_take(d.efc_D, rows, base)
        Dn = D_rows[:, 0]
        h_bot = jnp.sum(D_rows * dx * dx, -1)  # t-independent
        one = 1.0 + mu * mu
        jar_h, jp_h = jar[:base], jp[:base]
        D_h, fl_h = d.efc_D[:base], d.efc_frictionloss[:base]
        act_h = d.efc_active[:base]

        def phi_grad_hess(t):
            # head rows (equality/friction/limits): tiny dense arrays
            _, force_h, quad_h = _row_costs_pure(
                jar_h + t * jp_h, D_h, fl_h, act_h, s.ne, s.nf
            )
            g = pma + t * pmp - jnp.sum(force_h * jp_h)
            h = pmp + jnp.sum(jnp.where(quad_h, D_h * jp_h * jp_h, 0.0))
            # cone blocks (mirrors _elliptic_zone/_elliptic_W algebra)
            T2 = jnp.maximum(aq + 2.0 * bq * t + cq * t * t, 1e-24)
            T = jnp.sqrt(T2)
            Tp = (bq + cq * t) / T
            N = N0 + t * dN
            bottom = mu * N <= -T
            top = N >= mu * T
            mid = ~(bottom | top)
            cfac = (mu * T - N) / one
            g_b = Dn * (N * dN + (bq + cq * t))
            g_m = -Dn * cfac * (dN - mu * Tp)
            h_m = Dn / one * (mu * Tp - dN) ** 2 + Dn * mu * cfac / T * jnp.maximum(
                cq - Tp * Tp, 0.0
            )
            gb = jnp.where(bottom, g_b, jnp.where(mid, g_m, 0.0)) * act
            hb = jnp.where(bottom, h_bot, jnp.where(mid, h_m, 0.0)) * act
            return g + jnp.sum(gb), h + jnp.sum(hb)

    else:

        def phi_grad_hess(t):
            jart = jar + t * jp
            _, force, quad = _row_costs(m, d, jart)
            # dcost/dt = p^T M (a - as) + t p^T M p + sum_i (-force_i) * jp_i
            g = pma + t * pmp - jnp.sum(force * jp)
            h = pmp + jnp.sum(jnp.where(quad, d.efc_D * jp * jp, 0.0))
            if elliptic:
                for rows, base, W in _elliptic_W(m, d, jart):
                    jpb = _rows_take(jp, rows, base)  # (S, cdim)
                    h = h + jnp.einsum("sc,scd,sd->", jpb, W, jpb)
            return g, h

    # Guarded scalar Newton on t with a [lo, hi] bisection bracket: phi is
    # convex along the ray but only piecewise-smooth (cone zone crossings),
    # and a raw Newton-on-t can 2-cycle across a zone boundary (measured on
    # condim-4 elliptic spin states: the cycle returns a non-improving t, the
    # masked update rejects it, and the whole solve stalls at the first
    # iterate). phi' is monotone, so sign(g) maintains a valid bracket and
    # the bisection fallback guarantees progress. Unrolled when short,
    # fori_loop when long (bounded compile time).
    ls_iters = max(m.opt.ls_iterations, 1)
    dtype = qacc.dtype

    def ls_step(carry):
        t, lo, hi = carry
        g, h = phi_grad_hess(t)
        lo = jnp.where(g < 0, jnp.maximum(lo, t), lo)
        hi = jnp.where(g < 0, hi, jnp.minimum(hi, t))
        tn = t - g / jnp.maximum(h, 1e-12)
        ok = (tn > lo) & (tn < hi) & jnp.isfinite(tn)
        return jnp.where(ok, tn, 0.5 * (lo + hi)), lo, hi

    carry = (jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.asarray(4.0, dtype))
    if ls_iters <= 8:
        for _ in range(ls_iters):
            carry = ls_step(carry)
    else:
        carry = jax.lax.fori_loop(0, ls_iters, lambda _, c: ls_step(c), carry)
    return jnp.clip(carry[0], 0.0, 4.0)


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


def _newton_arrays_jnp(
    J, bJ, dsc, qM, aref, D, fl, act, a_s, ws, tol, *, ne, nf, iterations, ls_iterations, use_ws,
    hess_bf16=False,
):
    """Unbatched Newton on plain arrays (pyramidal cones only) — the primal
    of the custom_vmap dispatch and the non-TPU fallback. Mirrors the Pallas
    kernel (ops/newton_pallas.py) op for op. `bJ`/`dsc` (the factored
    operands, Data.efc_bJ/efc_dsc) are unused here: the dense rows carry the
    same information, so gradients routed through this primal
    (differentiable_dispatch) flow through J's assembly and cover the
    structured forward exactly."""
    del bJ, dsc
    from ambersim_tpu.engine import linalg

    nv = a_s.shape[-1]
    dtype = a_s.dtype

    def total_cost(qacc, jar):
        dacc = qacc - a_s
        cost, _, _ = _row_costs_pure(jar, D, fl, act, ne, nf)
        return 0.5 * dacc @ (qM @ dacc) + jnp.sum(cost)

    jar_s = J @ a_s - aref
    cost_s = total_cost(a_s, jar_s)
    qacc, jar, cost = a_s, jar_s, cost_s
    if use_ws:
        jar_w = J @ ws - aref
        cost_w = total_cost(ws, jar_w)
        better = cost_w < cost_s
        qacc = jnp.where(better, ws, a_s)
        jar = jnp.where(better, jar_w, jar_s)
        cost = jnp.where(better, cost_w, cost_s)

    def body(carry):
        qacc, jar, cost, prev_cost = carry
        _, force, quad = _row_costs_pure(jar, D, fl, act, ne, nf)
        Mdacc = qM @ (qacc - a_s)
        grad = Mdacc - J.T @ force
        h_diag = jnp.where(quad, D, 0.0)
        # explicit two-operand dot (not a 3-operand einsum): under vmap this
        # lowers to one batched MXU matmul; the weighted 3-operand form
        # measured ~0.1 TF/s at clutter shapes (B=256, nefc=2240, nv=192)
        Jw = J * h_diag[:, None]
        if hess_bf16:
            # opt-in (Option.hessian_bf16): the J^T diag(h) J product with
            # bf16 operands / f32 accumulation — ~2x HBM traffic + MXU rate
            # at clutter shapes. H only steers the Newton direction; grad,
            # cost, and line search stay f32, and the masked improvement
            # test rejects any step a perturbed direction fails to improve.
            JtHJ = jnp.matmul(
                Jw.T.astype(jnp.bfloat16),
                J.astype(jnp.bfloat16),
                preferred_element_type=dtype,
            )
        else:
            JtHJ = Jw.T @ J
        H = qM + JtHJ + 1e-8 * jnp.eye(nv, dtype=dtype)
        p = -linalg.solve_pd(H, grad)
        jp = J @ p

        mp = qM @ p
        pmp = p @ mp
        pma = p @ Mdacc

        def ls_body(_, t):
            jart = jar + t * jp
            _, force_t, quad_t = _row_costs_pure(jart, D, fl, act, ne, nf)
            g = pma + t * pmp - jnp.sum(force_t * jp)
            hh = pmp + jnp.sum(jnp.where(quad_t, D * jp * jp, 0.0))
            return t - g / jnp.maximum(hh, 1e-12)

        nls = max(ls_iterations, 1)
        t = jnp.zeros((), dtype)
        if nls <= 8:
            for _ls in range(nls):
                t = ls_body(0, t)
        else:
            t = jax.lax.fori_loop(0, nls, ls_body, t)
        t = jnp.clip(t, 0.0, 4.0)

        qacc_n = qacc + t * p
        jar_n = jar + t * jp
        cost_n = total_cost(qacc_n, jar_n)
        improved = cost_n < cost
        active_it = prev_cost - cost > tol
        take = improved & active_it
        qacc = jnp.where(take, qacc_n, qacc)
        jar = jnp.where(take, jar_n, jar)
        prev_cost = jnp.where(active_it, cost, prev_cost)
        cost = jnp.where(take, cost_n, cost)
        return qacc, jar, cost, prev_cost

    # unroll short iteration counts (straight-line code fuses best); scan the
    # long tail so trace/lowering stays bounded (MuJoCo defaults are 100/50)
    carry = (qacc, jar, cost, jnp.asarray(jnp.inf, dtype))
    if iterations <= 8:
        for _ in range(iterations):
            carry = body(carry)
    else:
        carry = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=iterations)[0]
    qacc, jar = carry[0], carry[1]

    _, force, _ = _row_costs_pure(jar, D, fl, act, ne, nf)
    return qacc, force, J.T @ force


_DISPATCH_CACHE: dict = {}


def _newton_dispatch(
    ne: int, nf: int, iterations: int, ls_iterations: int, use_ws: bool, skel=None,
    hess_bf16: bool = False,
):
    """custom_vmap entry: per-env calls run the jnp path; vmapped calls on TPU
    collapse the whole Newton solve into one Pallas kernel per 128-env tile
    (the structured-layout kernel when the skeleton's rows factor — see
    PyramidStructure — else the dense one)."""
    key = (ne, nf, iterations, ls_iterations, use_ws, skel, hess_bf16)
    if key in _DISPATCH_CACHE:
        return _DISPATCH_CACHE[key]

    import functools

    statics = dict(
        ne=ne, nf=nf, iterations=iterations, ls_iterations=ls_iterations, use_ws=use_ws,
        hess_bf16=hess_bf16,
    )
    # jit the primal: custom_vmap + custom_vjp re-trace it on every bind
    # (4x per step graph, 3 step-class graphs in PPO), and the unrolled
    # Newton-iteration x line-search body is the most expensive Python trace
    # in the engine (~half the step-graph trace time). As a pjit, the trace
    # happens once and every later bind is an aval-keyed cache hit; XLA
    # inlines the nested call, so compiled code is unchanged.
    primal = jax.jit(functools.partial(_newton_arrays_jnp, **statics))

    @jax.custom_batching.custom_vmap
    def fn(J, bJ, dsc, qM, aref, D, fl, act, a_s, ws, tol):
        return primal(J, bJ, dsc, qM, aref, D, fl, act, a_s, ws, tol)

    @fn.def_vmap
    def _rule(axis_size, in_batched, J, bJ, dsc, qM, aref, D, fl, act, a_s, ws, tol):
        args = [J, bJ, dsc, qM, aref, D, fl, act, a_s, ws]
        args = [
            x if bd else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, bd in zip(args, in_batched[:10])
        ]
        J, bJ, dsc, qM, aref, D, fl, act, a_s, ws = args
        if in_batched[10]:
            # single SMEM scalar in the kernel; collapse conservatively (min)
            # so DR-randomized body_mass never converges an env early on env
            # 0's tolerance
            tol = jnp.min(tol)
        if jax.devices()[0].platform == "tpu" and J.ndim == 3:
            import os

            from ambersim_tpu.ops.newton_pallas import dense_fits_vmem, structured_fits_vmem

            # escape hatch / A-B knob: AMBERSIM_NEWTON_DENSE=1 forces the
            # dense-layout kernel (read at trace time)
            dense_only = os.environ.get("AMBERSIM_NEWTON_DENSE") == "1"
            st = _pyramid_structure(skel) if (skel is not None and not dense_only) else None
            n = J.shape[2]
            # VMEM ladder: structured -> dense -> jnp. Big models (the
            # humanoid: nv=25, nefc=169) overflow the structured kernel's
            # scoped-vmem at the minimum tile; the dense kernel's smaller
            # working set still fits. Beyond that, the per-env jnp path.
            if st is not None and not structured_fits_vmem(st, n):
                st = None
            if st is not None:
                from ambersim_tpu.ops.newton_pallas import newton_solve_structured

                out = newton_solve_structured(
                    J, qM, aref, D, fl, act, a_s, ws, tol,
                    st=st, bJ=bJ, dsc=dsc, iterations=iterations,
                    ls_iterations=ls_iterations, use_ws=use_ws,
                )
            elif dense_fits_vmem(J.shape[1], n):
                from ambersim_tpu.ops.newton_pallas import newton_solve_batched

                kernel_statics = {k: v for k, v in statics.items() if k != "hess_bf16"}
                out = newton_solve_batched(J, qM, aref, D, fl, act, a_s, ws, tol, **kernel_statics)
            else:
                out = jax.vmap(primal, in_axes=(0,) * 10 + (None,))(
                    J, bJ, dsc, qM, aref, D, fl, act, a_s, ws, tol
                )
        else:
            out = jax.vmap(primal, in_axes=(0,) * 10 + (None,))(
                J, bJ, dsc, qM, aref, D, fl, act, a_s, ws, tol
            )
        return out, (True, True, True)

    from ambersim_tpu.engine.linalg import differentiable_dispatch

    # reverse-mode autodiff (differentiable simulation) flows through the
    # pure jnp Newton; the Pallas kernel stays on the forward hot path
    fn_diff = differentiable_dispatch(fn, primal)
    _DISPATCH_CACHE[key] = fn_diff
    return fn_diff


def _newton_arrays_elliptic_jnp(
    J, qM, aref, D, fl, act, a_s, ws, tol, fr, impratio,
    *, ne, nf, base, ncon, cdim, iterations, ls_iterations, use_ws,
):
    """Unbatched elliptic Newton on plain arrays (single-condim contiguous
    contact tail) — the primal of the elliptic custom_vmap dispatch and the
    non-TPU fallback. Mirrors the Pallas elliptic kernel
    (ops/newton_pallas.py _elliptic_kernel) op for op, which itself mirrors
    _elliptic_zone/_elliptic_W and the scalar line-search path."""
    from ambersim_tpu.engine import linalg

    nv = a_s.shape[-1]
    dtype = a_s.dtype
    S, nfr, nh = ncon, cdim - 1, base

    mu0 = jnp.maximum(fr[:, 0], 1e-12)
    sq = jnp.sqrt(impratio.astype(dtype))
    mu = mu0 / sq
    scale = fr[:, :nfr] / mu0[:, None] * sq  # (S, nfr)
    one_mu2 = 1.0 + mu * mu

    def split(x):  # head rows, contact block rows (S, cdim)
        return x[:nh], x[nh:].reshape(S, cdim)

    D_h, D_c = split(D)
    fl_h = fl[:nh]
    act_h, act_c = split(act)
    actN = act_c[:, 0]
    Dn = D_c[:, 0]

    def head_costs(jart_h):
        return _row_costs_pure(jart_h, D_h, fl_h, act_h, ne, nf)

    def cone_state(jar):
        x = jar[nh:].reshape(S, cdim)
        N = x[:, 0]
        y = x[:, 1:] * scale
        T2 = jnp.sum(y * y, -1)
        T = jnp.sqrt(jnp.maximum(T2, 1e-24))
        bottom = mu * N <= -T
        top = N >= mu * T
        middle = ~(bottom | top)
        cfac = (mu * T - N) / one_mu2
        return N, y, T2, T, bottom, middle, cfac

    def cone_cost(jar):
        N, y, T2, T, bottom, middle, cfac = cone_state(jar)
        return (
            jnp.where(bottom, 0.5 * Dn * (N * N + T2), 0.0)
            + jnp.where(middle, 0.5 * Dn * cfac * cfac * one_mu2, 0.0)
        ) * actN

    def total_cost(qacc, jar):
        dacc = qacc - a_s
        hc, _, _ = head_costs(jar[:nh])
        return 0.5 * dacc @ (qM @ dacc) + jnp.sum(hc) + jnp.sum(cone_cost(jar))

    def cone_force(jar):
        N, y, T2, T, bottom, middle, cfac = cone_state(jar)
        fN = jnp.where(bottom, -Dn * N, jnp.where(middle, Dn * cfac, 0.0))
        fY = jnp.where(
            bottom[:, None], -Dn[:, None] * y,
            jnp.where(middle[:, None], (-Dn * cfac * mu / T)[:, None] * y, 0.0),
        )
        return jnp.concatenate([fN[:, None], fY * scale], axis=1) * actN[:, None]

    jar_s = J @ a_s - aref
    cost_s = total_cost(a_s, jar_s)
    qacc, jar, cost = a_s, jar_s, cost_s
    if use_ws:
        jar_w = J @ ws - aref
        cost_w = total_cost(ws, jar_w)
        better = cost_w < cost_s
        qacc = jnp.where(better, ws, a_s)
        jar = jnp.where(better, jar_w, jar_s)
        cost = jnp.where(better, cost_w, cost_s)

    Rc = J[nh:].reshape(S, cdim, nv)

    def body(carry):
        qacc, jar, cost, prev_cost = carry
        _, force_h, quad_h = head_costs(jar[:nh])
        force = jnp.concatenate([force_h, cone_force(jar).reshape(-1)])
        Mdacc = qM @ (qacc - a_s)
        grad = Mdacc - J.T @ force

        # Hessian: head quad rows + per-block W quadratic form
        N, y, T2, T, bottom, middle, cfac = cone_state(jar)
        h_h = jnp.where(quad_h, D_h, 0.0)
        g_mid = Dn / one_mu2 * middle * actN
        curv = Dn * mu * cfac / T * middle * actN
        yh = y / T[:, None]
        bot_a = bottom * actN
        # W (S, cdim, cdim) assembled blockwise (row space)
        v = jnp.concatenate([-jnp.ones((S, 1), dtype), mu[:, None] * yh * scale], axis=1)
        W = g_mid[:, None, None] * v[:, :, None] * v[:, None, :]
        eye_f = jnp.eye(nfr, dtype=dtype)
        curv_blk = curv[:, None, None] * (eye_f[None] - yh[:, :, None] * yh[:, None, :]) * (
            scale[:, :, None] * scale[:, None, :]
        )
        W = W + jnp.concatenate(
            [
                jnp.zeros((S, 1, cdim), dtype),
                jnp.concatenate([jnp.zeros((S, nfr, 1), dtype), curv_blk], axis=2),
            ],
            axis=1,
        )
        W = W + bot_a[:, None, None] * jax.vmap(jnp.diag)(D_c)
        H = qM + (J[:nh] * h_h[:, None]).T @ J[:nh]
        H = H + jnp.einsum("scv,scd,sdw->vw", Rc, W, Rc)
        H = H + 1e-8 * jnp.eye(nv, dtype=dtype)
        p = -linalg.solve_pd(H, grad)
        jp = J @ p

        mp = qM @ p
        pmp = p @ mp
        pma = p @ Mdacc

        # closed-form scalar line search
        dxc = jp[nh:].reshape(S, cdim)
        dN = dxc[:, 0]
        dy = dxc[:, 1:] * scale
        aq, bq, cq = T2, jnp.sum(y * dy, -1), jnp.sum(dy * dy, -1)
        N0 = N
        h_bot = jnp.sum(D_c * dxc * dxc, -1)
        jar_h, jp_h = jar[:nh], jp[:nh]

        # guarded bracketed Newton on t (see _line_search note: raw
        # Newton-on-t 2-cycles across cone zone boundaries and stalls the
        # solve; phi' is monotone so sign(g) maintains a valid bracket)
        def ls_body(carry):
            t, lo, hi = carry
            _, force_t, quad_t = head_costs(jar_h + t * jp_h)
            g = pma + t * pmp - jnp.sum(force_t * jp_h)
            hh = pmp + jnp.sum(jnp.where(quad_t, D_h * jp_h * jp_h, 0.0))
            T2t = jnp.maximum(aq + 2.0 * bq * t + cq * t * t, 1e-24)
            Tt = jnp.sqrt(T2t)
            Tp = (bq + cq * t) / Tt
            Nt = N0 + t * dN
            bot_t = mu * Nt <= -Tt
            mid_t = ~(bot_t | (Nt >= mu * Tt))
            cfac_t = (mu * Tt - Nt) / one_mu2
            g_b = Dn * (Nt * dN + bq + cq * t)
            g_m = -Dn * cfac_t * (dN - mu * Tp)
            h_m = Dn / one_mu2 * (mu * Tp - dN) ** 2 + Dn * mu * cfac_t / Tt * jnp.maximum(
                cq - Tp * Tp, 0.0
            )
            gb = jnp.where(bot_t, g_b, jnp.where(mid_t, g_m, 0.0)) * actN
            hb = jnp.where(bot_t, h_bot, jnp.where(mid_t, h_m, 0.0)) * actN
            gt = g + jnp.sum(gb)
            lo = jnp.where(gt < 0, jnp.maximum(lo, t), lo)
            hi = jnp.where(gt < 0, hi, jnp.minimum(hi, t))
            tn = t - gt / jnp.maximum(hh + jnp.sum(hb), 1e-12)
            ok = (tn > lo) & (tn < hi) & jnp.isfinite(tn)
            return jnp.where(ok, tn, 0.5 * (lo + hi)), lo, hi

        nls = max(ls_iterations, 1)
        ls_carry = (jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.asarray(4.0, dtype))
        if nls <= 8:
            for _ls in range(nls):
                ls_carry = ls_body(ls_carry)
        else:
            ls_carry = jax.lax.fori_loop(0, nls, lambda _, c: ls_body(c), ls_carry)
        t = jnp.clip(ls_carry[0], 0.0, 4.0)

        qacc_n = qacc + t * p
        jar_n = jar + t * jp
        cost_n = total_cost(qacc_n, jar_n)
        improved = cost_n < cost
        active_it = prev_cost - cost > tol
        take = improved & active_it
        qacc = jnp.where(take, qacc_n, qacc)
        jar = jnp.where(take, jar_n, jar)
        prev_cost = jnp.where(active_it, cost, prev_cost)
        cost = jnp.where(take, cost_n, cost)
        return qacc, jar, cost, prev_cost

    carry = (qacc, jar, cost, jnp.asarray(jnp.inf, dtype))
    if iterations <= 8:
        for _ in range(iterations):
            carry = body(carry)
    else:
        carry = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=iterations)[0]
    qacc, jar = carry[0], carry[1]

    _, force_h, _ = head_costs(jar[:nh])
    force = jnp.concatenate([force_h, cone_force(jar).reshape(-1)])
    return qacc, force, J.T @ force


def _newton_dispatch_elliptic(
    ne: int, nf: int, base: int, ncon: int, cdim: int,
    iterations: int, ls_iterations: int, use_ws: bool,
):
    """custom_vmap entry for the elliptic solve: per-env calls run the jnp
    path; vmapped calls on TPU collapse into the fused elliptic Pallas
    kernel per 128-env tile (contiguous single-condim tail only)."""
    key = ("elliptic", ne, nf, base, ncon, cdim, iterations, ls_iterations, use_ws)
    if key in _DISPATCH_CACHE:
        return _DISPATCH_CACHE[key]

    import functools

    statics = dict(
        ne=ne, nf=nf, base=base, ncon=ncon, cdim=cdim,
        iterations=iterations, ls_iterations=ls_iterations, use_ws=use_ws,
    )
    # jit for trace caching across binds/graphs (see _newton_dispatch note)
    primal = jax.jit(functools.partial(_newton_arrays_elliptic_jnp, **statics))

    @jax.custom_batching.custom_vmap
    def fn(J, qM, aref, D, fl, act, a_s, ws, tol, fr, impratio):
        return primal(J, qM, aref, D, fl, act, a_s, ws, tol, fr, impratio)

    @fn.def_vmap
    def _rule(axis_size, in_batched, J, qM, aref, D, fl, act, a_s, ws, tol, fr, impratio):
        args = [J, qM, aref, D, fl, act, a_s, ws]
        args = [
            x if bd else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, bd in zip(args, in_batched[:8])
        ]
        J, qM, aref, D, fl, act, a_s, ws = args
        if in_batched[8]:
            # tol is a single SMEM scalar in the kernel; if it rides the batch
            # (randomized body_mass under DR), collapse conservatively — min
            # keeps every env iterating at least as long as its own tolerance
            # would, never converging a randomized env early on env 0's value.
            tol = jnp.min(tol)
        if not in_batched[9]:
            fr = jnp.broadcast_to(fr, (axis_size,) + fr.shape)
        imp_batched = bool(in_batched[10])
        nefc = J.shape[1]
        nv = J.shape[2]
        from ambersim_tpu.ops.newton_pallas import elliptic_fits_vmem

        if (
            jax.devices()[0].platform == "tpu"
            and J.ndim == 3
            and elliptic_fits_vmem(nefc, nv)
        ):
            from ambersim_tpu.ops.newton_pallas import newton_solve_elliptic

            # newton_solve_elliptic folds scalar OR per-env impratio into the
            # batched mu/scale planes — no collapse to env 0's value
            out = newton_solve_elliptic(J, qM, aref, D, fl, act, a_s, ws, tol, fr, impratio, **statics)
        else:
            out = jax.vmap(primal, in_axes=(0,) * 8 + (None, 0, 0 if imp_batched else None))(
                J, qM, aref, D, fl, act, a_s, ws, tol, fr, impratio
            )
        return out, (True, True, True)

    from ambersim_tpu.engine.linalg import differentiable_dispatch

    fn_diff = differentiable_dispatch(fn, primal)
    _DISPATCH_CACHE[key] = fn_diff
    return fn_diff


def _solve_newton(m: Model, d: Data) -> Data:
    s = m.skel
    if not _is_elliptic(m):
        # pyramidal path: fused dispatch (one Pallas kernel per tile on TPU)
        iters = int(max(m.opt.iterations, 1))
        ls = int(max(m.opt.ls_iterations, 1))
        use_ws = not (m.opt.disableflags & DisableBit.WARMSTART)
        tol = m.opt.tolerance * s.nv * jnp.maximum(jnp.sum(m.body_mass), 1.0)
        fn = _newton_dispatch(
            int(s.ne), int(s.nf), iters, ls, bool(use_ws), skel=s,
            hess_bf16=bool(m.opt.hessian_bf16),
        )
        qacc, force, qfrc = fn(
            d.efc_J,
            d.efc_bJ,
            d.efc_dsc,
            d.qM,
            d.efc_aref,
            d.efc_D,
            d.efc_frictionloss,
            d.efc_active.astype(d.qpos.dtype),
            d.qacc_smooth,
            d.qacc_warmstart,
            tol,
        )
        return d.replace(
            qacc=qacc,
            qfrc_constraint=qfrc,
            efc_force=force,
            qacc_warmstart=qacc,
        )
    meta = _elliptic_meta(s)
    if len(meta) == 1 and meta[0][3] is not None:
        # contiguous single-condim tail: fused dispatch (one Pallas kernel
        # per tile on TPU, jnp scalar path elsewhere)
        cdim, slots, rows, base, full = meta[0]
        iters = int(max(m.opt.iterations, 1))
        ls = int(max(m.opt.ls_iterations, 1))
        use_ws = not (m.opt.disableflags & DisableBit.WARMSTART)
        tol = m.opt.tolerance * s.nv * jnp.maximum(jnp.sum(m.body_mass), 1.0)
        fr = d.contact.friction if full else d.contact.friction[slots]
        fn = _newton_dispatch_elliptic(
            int(s.ne), int(s.nf), int(base), int(len(slots)), int(cdim),
            iters, ls, bool(use_ws),
        )
        qacc, force, qfrc = fn(
            d.efc_J,
            d.qM,
            d.efc_aref,
            d.efc_D,
            d.efc_frictionloss,
            d.efc_active.astype(d.qpos.dtype),
            d.qacc_smooth,
            d.qacc_warmstart,
            tol,
            fr,
            jnp.asarray(m.opt.impratio),
        )
        return d.replace(
            qacc=qacc,
            qfrc_constraint=qfrc,
            efc_force=force,
            qacc_warmstart=qacc,
        )
    return _solve_newton_elliptic(m, d)


def _solve_newton_elliptic(m: Model, d: Data) -> Data:
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
        # two-operand dot -> one batched MXU matmul under vmap (see
        # _newton_arrays_jnp note)
        H = d.qM + (J * h_diag[:, None]).T @ J
        if _is_elliptic(m):
            for rows, base, W in _elliptic_W(m, d, ctx.jar):
                Jb = _rows_take(J, rows, base)  # (S, cdim, nv)
                H = H + jnp.einsum("scv,scd,sdw->vw", Jb, W, Jb)
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

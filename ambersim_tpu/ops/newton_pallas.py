"""Fused batched Newton contact solver as a single Pallas TPU kernel.

The constraint solve is ~48% of the fused step's device self time on the
quadruped benchmark (542 of 1121 us/step at batch 4096 — bench.py's
hlo_stats in-graph attribution, the per-op profile that measures the real
fused rollout rather than per-phase dispatch). Expressed per-env under vmap, the
batch axis is major, so every (nv x nv) / (nefc x nv) operand puts tiny
dimensions (nv ~ 18) on the 128-wide lane axis — ~14% lane utilization and
dozens of small kernels per Newton iteration. This kernel transposes the
problem: the env batch rides the LANE dimension (operands are (nefc, nv, B)
/ (nv, nv, B) tiles in VMEM) and ALL Newton iterations — row costs, gradient,
Hessian assembly, Cholesky solve, exact line search, masked convergence
update — run in ONE Mosaic kernel per 128-env tile, with J resident in VMEM
throughout.

Scope: pyramidal cones (equality/friction/limit/contact rows via static
ne/nf row masks) via `newton_solve_batched`/`newton_solve_structured`, and
elliptic cones via `newton_solve_elliptic` (single-condim contiguous-tail
layouts — the common case; mixed-condim models keep the jnp path,
engine/solver.py dispatches). Semantics mirror engine/solver.py exactly:
same Huber friction rows, same warmstart selection, same scale-invariant
tolerance gating, same t clip [0, 4].

Roofline (benchmarks/newton_micro.py, v5e, quadruped nefc=136/nv=18,
batch 4096): ~158 us per Newton iteration, line-search steps ~7 us each,
in-call DMA + warmstart evaluation ~200 us. The per-iteration cost is the
Hessian assembly J^T diag(h) J — nefc*nv*nv FMAs per env, 360 MFLOP per
batch-iteration — running at ~2.3-2.6 TFLOP/s fp32, i.e. ~60-67% of the
v5e VPU peak (~3.9 TFLOP/s). The MXU cannot help: the env batch rides the
lane dimension, so each env's 18x18 Gram update is VPU-shaped; packing envs
into block-diagonal MXU tiles would reintroduce the relayout copies the
kernel exists to avoid (and at 18/128 occupancy the MXU is slower anyway).
Remaining levers are sub-linear: tile 512 needs >16 MiB VMEM (measured
ceiling; tile 256 already disables double-buffering at 16.0 MiB scoped).

Measured dead end — runtime active-row compaction (do not retry): efc_active
is fixed during the solve, so gathering the ~32 active of 136 rows into a
static K=56 layout and solving the compacted system is exact, with a
lax.cond fallback on overflow. On-chip (v5e, batch 4096, quadruped shapes)
it LOSES badly: the kernel is latency-bound on the Cholesky-column /
line-search serial chains, not row-bound — 136 -> 56 rows only cuts the
kernel 1.34 -> 1.01 ms/iter — while jnp.take_along_axis on (4096, 136, 18)
J costs 2.15 ms, the force scatter 1.61 ms, stable argsort 0.73 ms, and the
lax.cond wrapper adds several ms of operand copies (21 ms total vs 1.34 ms
for the full solve). Row-count reduction must happen statically at
constraint-assembly time, not via per-step gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ambersim_tpu.ops.linalg_pallas import _chol_columns, _solve_from_l

TILE = 128

# Guard below Mosaic's 16 MiB scoped-vmem ceiling (physical VMEM ~16 MB/core).
_VMEM_BUDGET = 15.5 * 2**20


def structured_fits_vmem(st, n: int) -> bool:
    """Whether the structured kernel's minimum tile (128) fits scoped VMEM.

    Mirrors the tile-selection estimate in newton_solve_structured (3.5x
    Mosaic calibration). Models that fail this (e.g. the humanoid: nv=25,
    nefc=169 -> 18 MiB measured at tile 128) must fall back to the dense
    kernel or the jnp path — Mosaic refuses the launch outright.
    """
    ndp, ngp, ncp = st.nd, st.ndiag, st.ncon3
    nefc_k = ndp + ngp + 4 * ncp
    nb = 3 * ncp
    n_pad = -(-n // 8) * 8
    per_env = 4 * (2 * (nb + ndp) * n_pad + 3 * n * n + 10 * nefc_k + 12 * n + 2 * ngp)
    return 3.5 * per_env * TILE < _VMEM_BUDGET


def dense_fits_vmem(nefc: int, n: int) -> bool:
    """Whether the dense kernel's minimum tile (128) fits scoped VMEM.

    Calibration: measured scoped vmem is ~1.8x this working-set estimate
    (quadruped nefc=136/nv=18 at tile 256: 16.0 MiB measured vs 9.1 MiB
    estimated)."""
    n_pad = -(-n // 8) * 8
    per_env = 4 * (2 * nefc * n_pad + 3 * n * n + 10 * nefc + 12 * n)
    return 1.8 * per_env * TILE < _VMEM_BUDGET


def _row_masks(nefc: int, ne: int, nf: int, dtype):
    """Float row-type masks (Mosaic rejects bool-valued selects: i1 vectors)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (nefc, 1), 0)
    is_eq = (row < ne).astype(dtype)
    is_fric = ((row >= ne) & (row < ne + nf)).astype(dtype)
    one_sided = 1.0 - is_eq - is_fric
    return is_fric, one_sided


def _newton_kernel(
    J_ref, M_ref, aref_ref, D_ref, fl_ref, act_ref, as_ref, ws_ref, tol_ref,
    qacc_ref, force_ref, qfrc_ref,
    *, ne: int, nf: int, iterations: int, ls_iterations: int, use_ws: bool,
):
    nefc, n, B = J_ref.shape
    dtype = J_ref.dtype
    J = J_ref[...]  # (nefc, n, B) — VMEM-resident for the whole solve
    M = M_ref[...]  # (n, n, B)
    aref_v = aref_ref[...]  # (nefc, B)
    D = D_ref[...]
    fl = fl_ref[...]
    act = act_ref[...]  # float mask (nefc, B)
    a_s = as_ref[...]  # (n, B)
    tol = tol_ref[0, 0]

    is_fric, one_sided = _row_masks(nefc, ne, nf, dtype)
    not_fric = 1.0 - is_fric

    def jmul(x):  # J @ x: (n, B) -> (nefc, B)
        return (J * x[None, :, :]).sum(axis=1)

    def jtmul(f):  # J^T @ f: (nefc, B) -> (n, B)
        return (J * f[:, None, :]).sum(axis=0)

    def mmul(x):  # qM @ x: (n, B) -> (n, B)
        return (M * x[None, :, :]).sum(axis=1)

    # all row gating is arithmetic (float masks): Mosaic has no i1 vectors
    def force_quadD(jart):
        """Per-row force and Hessian diagonal (D on quadratic rows, else 0)."""
        neg = (jart < 0).astype(dtype)
        gated = (one_sided * neg + (1.0 - one_sided)) * act
        Dj = D * jart
        lin = (jnp.abs(Dj) > fl).astype(dtype)
        fric_force = lin * (-jnp.sign(jart) * fl) + (1.0 - lin) * (-Dj)
        force = (is_fric * fric_force + not_fric * (-Dj)) * gated
        quadD = D * (is_fric * (1.0 - lin) + not_fric) * gated
        return force, quadD

    def row_cost(jart):
        neg = (jart < 0).astype(dtype)
        gated = (one_sided * neg + (1.0 - one_sided)) * act
        Dj = D * jart
        quad_cost = 0.5 * Dj * jart
        lin = (jnp.abs(Dj) > fl).astype(dtype)
        fric_cost = lin * (fl * jnp.abs(jart) - 0.5 * fl * fl / jnp.maximum(D, 1e-12)) + (
            1.0 - lin
        ) * quad_cost
        return (is_fric * fric_cost + not_fric * quad_cost) * gated

    def total_cost(qacc, jar):
        dacc = qacc - a_s
        smooth = 0.5 * (dacc * mmul(dacc)).sum(axis=0)
        return smooth + row_cost(jar).sum(axis=0)

    # ---- initial point: qacc_smooth, optionally improved by warmstart ----
    # (B,)-wise branch decisions are float blends: Mosaic has no i1 vectors
    jar_s = jmul(a_s) - aref_v
    cost_s = total_cost(a_s, jar_s)
    qacc, jar, cost = a_s, jar_s, cost_s
    if use_ws:
        ws = ws_ref[...]
        jar_w = jmul(ws) - aref_v
        cost_w = total_cost(ws, jar_w)
        bet = (cost_w < cost_s).astype(dtype)  # (B,)
        qacc = bet[None, :] * ws + (1.0 - bet[None, :]) * a_s
        jar = bet[None, :] * jar_w + (1.0 - bet[None, :]) * jar_s
        cost = bet * cost_w + (1.0 - bet) * cost_s

    prev_cost = jnp.full((B,), 1e30, dtype)  # finite "inf": keeps blends NaN-free
    eye_reg = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1),
        jnp.asarray(1e-8, dtype),
        jnp.asarray(0.0, dtype),
    )

    def newton_body(carry):
        qacc, jar, cost, prev_cost = carry
        force, h = force_quadD(jar)
        Mdacc = mmul(qacc - a_s)
        grad = Mdacc - jtmul(force)  # (n, B)
        Jh = J * h[:, None, :]  # (nefc, n, B)
        # H[v, w] = M[v, w] + sum_i Jh[i, v] * J[i, w] — lane-parallel over envs.
        # Note: _chol_columns only reads the lower triangle, but assembling
        # just w <= v per row (sliced J + pad) measured SLOWER on chip
        # (5.43 vs 5.24 ms/step on the quadruped bench) — the ragged
        # pads/concats cost more than the skipped sublane tiles at nv = 18.
        H = M + eye_reg
        rows = [(Jh[:, v : v + 1, :] * J).sum(axis=0) for v in range(n)]
        H = H + jnp.stack(rows, axis=0)  # (n, n, B)
        L = _chol_columns(H, n)
        p = -_solve_from_l(L, grad, n)  # (n, B)
        jp = jmul(p)

        # exact line search: scalar Newton on phi(t), t per-env (B,)
        mp = mmul(p)
        pmp = (p * mp).sum(axis=0)
        pma = (p * Mdacc).sum(axis=0)

        def ls_body(_, t):
            jart = jar + t[None, :] * jp
            force_t, h_t = force_quadD(jart)
            g = pma + t * pmp - (force_t * jp).sum(axis=0)
            hh = pmp + (h_t * jp * jp).sum(axis=0)
            return t - g / jnp.maximum(hh, 1e-12)

        nls = max(ls_iterations, 1)
        t = jnp.zeros((B,), dtype)
        if nls <= 8:
            for _ls in range(nls):
                t = ls_body(0, t)
        else:
            t = jax.lax.fori_loop(0, nls, ls_body, t)
        t = jnp.clip(t, 0.0, 4.0)

        qacc_n = qacc + t[None, :] * p
        jar_n = jar + t[None, :] * jp
        cost_n = total_cost(qacc_n, jar_n)
        act_f = (prev_cost - cost > tol).astype(dtype)
        take = (cost_n < cost).astype(dtype) * act_f
        keep = 1.0 - take
        qacc = take[None, :] * qacc_n + keep[None, :] * qacc
        jar = take[None, :] * jar_n + keep[None, :] * jar
        prev_cost = act_f * cost + (1.0 - act_f) * prev_cost
        cost = take * cost_n + keep * cost
        return qacc, jar, cost, prev_cost

    # unroll the short hot case; loop the long tail (MuJoCo defaults 100/50)
    # so the Mosaic module stays small
    carry = (qacc, jar, cost, prev_cost)
    if iterations <= 8:
        for _ in range(iterations):
            carry = newton_body(carry)
    else:
        carry = jax.lax.fori_loop(0, iterations, lambda _, c: newton_body(c), carry)
    qacc, jar = carry[0], carry[1]

    force, _ = force_quadD(jar)
    qacc_ref[...] = qacc
    force_ref[...] = force
    qfrc_ref[...] = jtmul(force)  # qfrc_constraint = J^T f, while J is in VMEM


def newton_solve_batched(
    J: jax.Array,  # (Bt, nefc, nv)
    qM: jax.Array,  # (Bt, nv, nv)
    aref: jax.Array,  # (Bt, nefc)
    D: jax.Array,
    fl: jax.Array,
    active: jax.Array,  # bool (Bt, nefc)
    qacc_smooth: jax.Array,  # (Bt, nv)
    warmstart: jax.Array,
    tol: jax.Array,  # scalar
    *,
    ne: int,
    nf: int,
    iterations: int,
    ls_iterations: int,
    use_ws: bool,
    interpret: bool = False,
    tile: int | None = None,
):
    """Returns (qacc (Bt, nv), force (Bt, nefc), qfrc_constraint (Bt, nv)).
    Pads the batch to the tile."""
    b, nefc, n = J.shape
    dtype = J.dtype
    if tile is None:
        # the kernel is latency-bound on short serial chains of tiny vector
        # ops (Cholesky columns, line-search scalars): a wider env tile
        # amortizes them. Pick the widest tile whose working set fits VMEM.
        n_pad = -(-n // 8) * 8
        per_env = 4 * (2 * nefc * n_pad + 3 * n * n + 10 * nefc + 12 * n)
        tile = next((t for t in (512, 256, 128) if per_env * t < 10 * 2**20), 128)
    bp = -(-b // tile) * tile

    def bpad(x, fill=0.0):
        xt = jnp.moveaxis(x, 0, -1)  # batch-last
        pad = [(0, 0)] * (xt.ndim - 1) + [(0, bp - b)]
        return jnp.pad(xt, pad, constant_values=fill)

    J_t = bpad(J)  # (nefc, n, Bp)
    M_t = bpad(qM)  # (n, n, Bp)
    if bp > b:  # keep padded systems well-posed: M_pad = I, rows inactive
        eye = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1),
            jnp.ones((), dtype),
            jnp.zeros((), dtype),
        )
        pad_mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bp), 2) >= b
        M_t = jnp.where(pad_mask, eye, M_t)

    args = [
        J_t,
        M_t,
        bpad(aref),
        bpad(D),
        bpad(fl),
        bpad(active.astype(dtype)),
        bpad(qacc_smooth),
        bpad(warmstart),
        jnp.reshape(tol.astype(dtype), (1, 1)),
    ]
    in_specs = [
        pl.BlockSpec((nefc, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(
        _newton_kernel,
        ne=ne,
        nf=nf,
        iterations=iterations,
        ls_iterations=ls_iterations,
        use_ws=use_ws,
    )
    qacc_t, force_t, qfrc_t = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((nefc, bp), dtype),
            jax.ShapeDtypeStruct((n, bp), dtype),
        ),
        interpret=interpret,
    )(*args)
    return (
        jnp.moveaxis(qacc_t[:, :b], -1, 0),
        jnp.moveaxis(force_t[:, :b], -1, 0),
        jnp.moveaxis(qfrc_t[:, :b], -1, 0),
    )


# ---------------------------------------------------------------------------
# Structured-layout variant: factored pyramid contacts + one-hot rows
# ---------------------------------------------------------------------------
#
# When the skeleton's rows factor (engine/solver.py PyramidStructure), the
# kernel never materializes the dense (nefc, nv, B) J or the J*h product:
#
#   * condim-3 contacts enter as the basis [N, U1, U2] (U_k = mu_k T_k); the
#     per-iteration Gram J^T diag(h) J becomes B^T S B with 5 scalar
#     coefficients per contact — 3 basis rows instead of 4 dense rows, and
#     the scaled buffer S@B replaces the full J*h (272 -> 168 row-buffers of
#     live VMEM per iteration on the quadruped: smaller working set AND
#     ~40% less VPU work in the dominant term).
#   * one-hot rows (dof friction, scalar joint limits) cost a diagonal
#     Hessian update and a tiny (ndiag, n) one-hot matmul in J/J^T products.
#
# The math is IDENTICAL to the dense kernel — the basis is recovered from
# the assembled rows by half sums/differences (N = (r0+r1)/2, U1 = (r0-r1)/2,
# U2 = (r2-r3)/2), so results differ only by fp reassociation. Row-type
# gating uses static masks baked in kernel row order
# [dense | one-hot | N+U1* | N-U1* | N+U2* | N-U2*] (contact rows grouped by
# pyramid direction for contiguous slicing); per-row operands are permuted
# outside the kernel and efc_force is inverse-permuted on return.


def _structured_kernel(
    *refs,
    nd: int,
    ndiag: int,
    ncon: int,
    nd_eq: int,
    nd_ft: int,
    nfd: int,
    iterations: int,
    ls_iterations: int,
    use_ws: bool,
):
    if nd:
        Jd_ref = refs[0]
        refs = refs[1:]
    if ndiag:
        dsc_ref, Oc_ref = refs[:2]
        refs = refs[2:]
    (Bs_ref, M_ref, aref_ref, D_ref, fl_ref, act_ref, as_ref, ws_ref,
     tol_ref, qacc_ref, force_ref, qfrc_ref) = refs

    n, B = as_ref.shape
    dtype = as_ref.dtype
    nb = 3 * ncon
    nefc = aref_ref.shape[0]
    Jd = Jd_ref[...] if nd else None  # (nd, n, B)
    dsc = dsc_ref[...] if ndiag else None  # (ndiag, B) signed one-hot values
    Oc = Oc_ref[...] if ndiag else None  # (ndiag, n) static one-hot table
    Bs = Bs_ref[...]  # (nb, n, B) basis rows [N*, U1*, U2*]
    M = M_ref[...]
    aref_v = aref_ref[...]
    D = D_ref[...]
    fl = fl_ref[...]
    act = act_ref[...]
    a_s = as_ref[...]
    tol = tol_ref[0, 0]

    # row-type masks from the static family-segment boundaries (kernel order
    # is [eq | tendon-fric | dense one-sided | dof-fric | limits | contacts])
    row = jax.lax.broadcasted_iota(jnp.int32, (nefc, 1), 0)
    in_diag_fric = (row >= nd) & (row < nd + nfd)
    is_fric = (((row >= nd_eq) & (row < nd_eq + nd_ft)) | in_diag_fric).astype(dtype)
    one_sided = ((row >= nd_eq + nd_ft) & ~in_diag_fric).astype(dtype)
    not_fric = 1.0 - is_fric

    def jmul(x):  # (n, B) -> (nefc, B) in kernel row order
        parts = []
        if nd:
            parts.append((Jd * x[None, :, :]).sum(axis=1))
        if ndiag:
            parts.append(dsc * (Oc[:, :, None] * x[None, :, :]).sum(axis=1))
        jb = (Bs * x[None, :, :]).sum(axis=1)  # (nb, B)
        jN, jU1, jU2 = jb[:ncon], jb[ncon : 2 * ncon], jb[2 * ncon :]
        parts += [jN + jU1, jN - jU1, jN + jU2, jN - jU2]
        return jnp.concatenate(parts, axis=0)

    def jtmul(f):  # (nefc, B) -> (n, B)
        fc = f[nd + ndiag :]
        f0, f1 = fc[:ncon], fc[ncon : 2 * ncon]
        f2, f3 = fc[2 * ncon : 3 * ncon], fc[3 * ncon :]
        coef = jnp.concatenate([f0 + f1 + f2 + f3, f0 - f1, f2 - f3], axis=0)
        out = (Bs * coef[:, None, :]).sum(axis=0)
        if ndiag:
            fg = f[nd : nd + ndiag]
            out = out + (Oc[:, :, None] * (dsc * fg)[:, None, :]).sum(axis=0)
        if nd:
            out = out + (Jd * f[:nd][:, None, :]).sum(axis=0)
        return out

    def mmul(x):
        return (M * x[None, :, :]).sum(axis=1)

    def force_quadD(jart):
        neg = (jart < 0).astype(dtype)
        gated = (one_sided * neg + (1.0 - one_sided)) * act
        Dj = D * jart
        lin = (jnp.abs(Dj) > fl).astype(dtype)
        fric_force = lin * (-jnp.sign(jart) * fl) + (1.0 - lin) * (-Dj)
        force = (is_fric * fric_force + not_fric * (-Dj)) * gated
        quadD = D * (is_fric * (1.0 - lin) + not_fric) * gated
        return force, quadD

    def row_cost(jart):
        neg = (jart < 0).astype(dtype)
        gated = (one_sided * neg + (1.0 - one_sided)) * act
        Dj = D * jart
        quad_cost = 0.5 * Dj * jart
        lin = (jnp.abs(Dj) > fl).astype(dtype)
        fric_cost = lin * (fl * jnp.abs(jart) - 0.5 * fl * fl / jnp.maximum(D, 1e-12)) + (
            1.0 - lin
        ) * quad_cost
        return (is_fric * fric_cost + not_fric * quad_cost) * gated

    def total_cost(qacc, jar):
        dacc = qacc - a_s
        smooth = 0.5 * (dacc * mmul(dacc)).sum(axis=0)
        return smooth + row_cost(jar).sum(axis=0)

    jar_s = jmul(a_s) - aref_v
    cost_s = total_cost(a_s, jar_s)
    qacc, jar, cost = a_s, jar_s, cost_s
    if use_ws:
        ws = ws_ref[...]
        jar_w = jmul(ws) - aref_v
        cost_w = total_cost(ws, jar_w)
        bet = (cost_w < cost_s).astype(dtype)
        qacc = bet[None, :] * ws + (1.0 - bet[None, :]) * a_s
        jar = bet[None, :] * jar_w + (1.0 - bet[None, :]) * jar_s
        cost = bet * cost_w + (1.0 - bet) * cost_s

    prev_cost = jnp.full((B,), 1e30, dtype)
    eye_mask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1),
        jnp.asarray(1.0, dtype),
        jnp.asarray(0.0, dtype),
    )

    def hessian(h):
        """M + J^T diag(h) J via the factored layout."""
        hc = h[nd + ndiag :]
        h0, h1 = hc[:ncon], hc[ncon : 2 * ncon]
        h2, h3 = hc[2 * ncon : 3 * ncon], hc[3 * ncon :]
        sNN = h0 + h1 + h2 + h3
        sU1, sU2 = h0 + h1, h2 + h3
        sNU1, sNU2 = h0 - h1, h2 - h3
        N = Bs[:ncon]
        U1 = Bs[ncon : 2 * ncon]
        U2 = Bs[2 * ncon :]
        SB = jnp.concatenate(
            [
                sNN[:, None, :] * N + sNU1[:, None, :] * U1 + sNU2[:, None, :] * U2,
                sNU1[:, None, :] * N + sU1[:, None, :] * U1,
                sNU2[:, None, :] * N + sU2[:, None, :] * U2,
            ],
            axis=0,
        )  # (nb, n, B)
        H = M + 1e-8 * eye_mask
        if ndiag:
            # diagonal of the one-hot rows: s^2 == 1 for every one-hot row,
            # but keep the general form (costs one multiply)
            hg = h[nd : nd + ndiag]
            hd = (Oc[:, :, None] * (hg * dsc * dsc)[:, None, :]).sum(axis=0)  # (n, B)
            H = H + eye_mask * hd[:, None, :]
        rows = [(Bs[:, v : v + 1, :] * SB).sum(axis=0) for v in range(n)]
        H = H + jnp.stack(rows, axis=0)
        if nd:
            Jhd = Jd * h[:nd][:, None, :]
            rows_d = [(Jd[:, v : v + 1, :] * Jhd).sum(axis=0) for v in range(n)]
            H = H + jnp.stack(rows_d, axis=0)
        return H

    def newton_body(carry):
        qacc, jar, cost, prev_cost = carry
        force, h = force_quadD(jar)
        Mdacc = mmul(qacc - a_s)
        grad = Mdacc - jtmul(force)
        H = hessian(h)
        L = _chol_columns(H, n)
        p = -_solve_from_l(L, grad, n)
        jp = jmul(p)

        mp = mmul(p)
        pmp = (p * mp).sum(axis=0)
        pma = (p * Mdacc).sum(axis=0)

        def ls_body(_, t):
            jart = jar + t[None, :] * jp
            force_t, h_t = force_quadD(jart)
            g = pma + t * pmp - (force_t * jp).sum(axis=0)
            hh = pmp + (h_t * jp * jp).sum(axis=0)
            return t - g / jnp.maximum(hh, 1e-12)

        nls = max(ls_iterations, 1)
        t = jnp.zeros((B,), dtype)
        if nls <= 8:
            for _ls in range(nls):
                t = ls_body(0, t)
        else:
            t = jax.lax.fori_loop(0, nls, ls_body, t)
        t = jnp.clip(t, 0.0, 4.0)

        qacc_n = qacc + t[None, :] * p
        jar_n = jar + t[None, :] * jp
        cost_n = total_cost(qacc_n, jar_n)
        act_f = (prev_cost - cost > tol).astype(dtype)
        take = (cost_n < cost).astype(dtype) * act_f
        keep = 1.0 - take
        qacc = take[None, :] * qacc_n + keep[None, :] * qacc
        jar = take[None, :] * jar_n + keep[None, :] * jar
        prev_cost = act_f * cost + (1.0 - act_f) * prev_cost
        cost = take * cost_n + keep * cost
        return qacc, jar, cost, prev_cost

    carry = (qacc, jar, cost, prev_cost)
    if iterations <= 8:
        for _ in range(iterations):
            carry = newton_body(carry)
    else:
        carry = jax.lax.fori_loop(0, iterations, lambda _, c: newton_body(c), carry)
    qacc, jar = carry[0], carry[1]

    force, _ = force_quadD(jar)
    qacc_ref[...] = qacc
    force_ref[...] = force  # kernel row order; caller inverse-permutes
    qfrc_ref[...] = jtmul(force)


def newton_solve_structured(
    J: jax.Array,  # (Bt, nefc, nv) — MuJoCo row order
    qM: jax.Array,
    aref: jax.Array,
    D: jax.Array,
    fl: jax.Array,
    active: jax.Array,
    qacc_smooth: jax.Array,
    warmstart: jax.Array,
    tol: jax.Array,
    *,
    st,  # engine.constraint.PyramidStructure
    bJ: jax.Array | None = None,  # (Bt, 3*ncon3, nv) assembly-emitted basis
    dsc: jax.Array | None = None,  # (Bt, ndiag) assembly-emitted one-hot values
    iterations: int,
    ls_iterations: int,
    use_ws: bool,
    interpret: bool = False,
    tile: int | None = None,
):
    """Structured-layout Newton solve. Same contract as newton_solve_batched;
    outputs are in MuJoCo row order. When `bJ` (Data.efc_bJ) is given, the
    contact basis comes straight from constraint assembly — the dense contact
    rows of J are then unread, so XLA drops their materialization inside
    rollout scans; otherwise the basis is recovered from J by static
    half-sum/difference slices (exact either way)."""
    import numpy as np

    b, nefc, n = J.shape
    dtype = J.dtype
    nd, ndiag, ncon = st.nd, st.ndiag, st.ncon3

    # Measured dead end (do not retry): padding each row section to a sublane
    # multiple (8) to keep the kernel's section slices tile-aligned LOSES —
    # the +14% Gram rows (ncon 28 -> 32 on the quadruped) cost more than the
    # misaligned-slice copies they avoid (padded min 1.93 ms vs 1.80 ms
    # unpadded, and +2.9 MiB scoped vmem). Sections stay unpadded; the
    # pad/valid machinery below degenerates to the plain permutation.
    pad8 = lambda k: k  # noqa: E731
    ndp, ngp, ncp = pad8(nd), pad8(ndiag), pad8(ncon)
    nefc_k = ndp + ngp + 4 * ncp
    nb = 3 * ncp

    # ---- static extraction of the factored operands from the dense rows ----
    def rpad(x, rows):  # pad the row axis (axis 1) with zeros to `rows`
        return jnp.pad(x, ((0, 0), (0, rows - x.shape[1])) + ((0, 0),) * (x.ndim - 2))

    Jd = rpad(J[:, st.dense_rows], ndp) if nd else None  # (b, ndp, nv)
    if ndiag:
        if dsc is None or dsc.shape[1] != ndiag:
            dsc = J[:, st.diag_rows, st.diag_dofs]  # fall back to row gather
        dsc = rpad(dsc, ngp)  # (b, ngp)
    else:
        dsc = None
    if bJ is not None and bJ.shape[1] == 3 * ncon:
        N = rpad(bJ[:, :ncon], ncp)
        U1 = rpad(bJ[:, ncon : 2 * ncon], ncp)
        U2 = rpad(bJ[:, 2 * ncon :], ncp)
    else:
        R = J[:, st.adr3[:, None] + np.arange(4)[None]]  # (b, ncon, 4, nv)
        N = rpad(0.5 * (R[:, :, 0] + R[:, :, 1]), ncp)
        U1 = rpad(0.5 * (R[:, :, 0] - R[:, :, 1]), ncp)
        U2 = rpad(0.5 * (R[:, :, 2] - R[:, :, 3]), ncp)
    Bs = jnp.concatenate([N, U1, U2], axis=1)  # (b, nb, nv)

    # kernel-order row map with zeroed padding rows (gather then mask)
    perm_pad = np.zeros(nefc_k, np.int64)
    valid = np.zeros(nefc_k, np.float32)
    sections = [
        (0, st.dense_rows),
        (ndp, st.diag_rows),
        (ndp + ngp, st.adr3 + 0),
        (ndp + ngp + ncp, st.adr3 + 1),
        (ndp + ngp + 2 * ncp, st.adr3 + 2),
        (ndp + ngp + 3 * ncp, st.adr3 + 3),
    ]
    kinv = np.zeros(nefc, np.int64)  # MuJoCo row -> kernel row
    for base, rows in sections:
        idx = np.arange(len(rows))
        perm_pad[base + idx] = rows
        valid[base + idx] = 1.0
        kinv[rows] = base + idx
    vmask = jnp.asarray(valid, dtype)[None]
    aref_k, D_k, fl_k = (x[:, perm_pad] * vmask for x in (aref, D, fl))
    act_k = active[:, perm_pad].astype(dtype) * vmask

    onehot = np.zeros((ngp, n), np.float32)
    if ndiag:
        onehot[np.arange(ndiag), st.diag_dofs] = 1.0

    if tile is None:
        # basis + S@B are the per-iteration row buffers; M, H, L and the
        # per-row vectors round out the working set. The 3.5x factor is
        # calibrated against Mosaic's measured scoped-vmem (quadruped shapes:
        # 22.6 MiB at tile 256 vs the 26.5 KiB/env buffer estimate).
        n_pad = -(-n // 8) * 8
        per_env = 4 * (2 * (nb + ndp) * n_pad + 3 * n * n + 10 * nefc_k + 12 * n + 2 * ngp)
        tile = next((t for t in (512, 256, 128) if 3.5 * per_env * t < 15.5 * 2**20), 128)
    bp = -(-b // tile) * tile

    def bpad(x, fill=0.0):
        xt = jnp.moveaxis(x, 0, -1)
        pad = [(0, 0)] * (xt.ndim - 1) + [(0, bp - b)]
        return jnp.pad(xt, pad, constant_values=fill)

    M_t = bpad(qM)
    if bp > b:
        eye = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1),
            jnp.ones((), dtype),
            jnp.zeros((), dtype),
        )
        pad_mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bp), 2) >= b
        M_t = jnp.where(pad_mask, eye, M_t)

    args = []
    in_specs = []
    if nd:
        args.append(bpad(Jd))
        in_specs.append(
            pl.BlockSpec((ndp, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        )
    if ndiag:
        args += [bpad(dsc), jnp.asarray(onehot, dtype)]
        in_specs += [
            pl.BlockSpec((ngp, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ngp, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    args += [bpad(Bs), M_t]
    in_specs += [
        pl.BlockSpec((nb, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
    ]
    args += [
        bpad(aref_k),
        bpad(D_k),
        bpad(fl_k),
        bpad(act_k),
        bpad(qacc_smooth),
        bpad(warmstart),
        jnp.reshape(tol.astype(dtype), (1, 1)),
    ]
    in_specs += [
        pl.BlockSpec((nefc_k, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc_k, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc_k, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc_k, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(
        _structured_kernel,
        nd=ndp,
        ndiag=ngp,
        ncon=ncp,
        nd_eq=st.nd_eq,
        nd_ft=st.nd_ft,
        nfd=st.nfd,
        iterations=iterations,
        ls_iterations=ls_iterations,
        use_ws=use_ws,
    )
    qacc_t, force_t, qfrc_t = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nefc_k, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((nefc_k, bp), dtype),
            jax.ShapeDtypeStruct((n, bp), dtype),
        ),
        interpret=interpret,
    )(*args)
    force = jnp.moveaxis(force_t[:, :b], -1, 0)[:, kinv]
    return (
        jnp.moveaxis(qacc_t[:, :b], -1, 0),
        force,
        jnp.moveaxis(qfrc_t[:, :b], -1, 0),
    )


# ---------------------------------------------------------------------------
# Elliptic-cone variant: head rows + second-order-cone contact blocks
# ---------------------------------------------------------------------------
#
# Elliptic layouts put cdim rows per contact ([normal, friction...]) after
# the head rows (equality / dof friction / limits). The kernel reorders rows
# to [head | N(S) | T_1(S) | ... | T_{cdim-1}(S)] so every per-block quantity
# is a contiguous (S, B) slice, then runs the same batch-on-lanes Newton as
# the pyramidal kernels with three changes, all mirroring the jnp elliptic
# path (engine/solver.py _elliptic_zone/_elliptic_W/_line_search scalar
# path) exactly:
#   * row cost/force on contact rows comes from the cone projection
#     (bottom / middle / top zones of the mu-scaled circular cone);
#   * the Hessian contact contribution is B^T W B with a per-block
#     symmetric (cdim x cdim) W of zone-blended scalar coefficients — the
#     same factored S@B pattern as the structured pyramidal kernel;
#   * the exact line search uses the closed-form per-block scalars
#     (N(t) linear, T(t)^2 quadratic in t), so each ls iteration is pure
#     (S, B) arithmetic with no row-space rebuilds.


def elliptic_fits_vmem(nefc: int, n: int) -> bool:
    """Whether the elliptic kernel's minimum tile (128) fits scoped VMEM.
    Working set matches the dense kernel (J + the scaled-row buffer dominate)
    plus the per-block scalar planes. Calibration: measured scoped vmem is
    ~3.5x this estimate (quadruped elliptic nefc=108/nv=18: 28.08 MiB at
    tile 256 vs 8.0 MiB estimated — the zone/W coefficient planes stay live
    across the Hessian assembly)."""
    n_pad = -(-n // 8) * 8
    per_env = 4 * (2 * nefc * n_pad + 3 * n * n + 14 * nefc + 12 * n)
    return 3.5 * per_env * TILE < _VMEM_BUDGET


def _elliptic_kernel(
    J_ref, M_ref, aref_ref, D_ref, fl_ref, act_ref, as_ref, ws_ref, mu_ref,
    scale_ref, tol_ref, qacc_ref, force_ref, qfrc_ref,
    *, ne: int, nf: int, nh: int, S: int, cdim: int,
    iterations: int, ls_iterations: int, use_ws: bool,
):
    nefc, n, B = J_ref.shape
    dtype = J_ref.dtype
    nfr = cdim - 1
    J = J_ref[...]          # (nefc, n, B): [head | N | T_1 | ... | T_nfr]
    M = M_ref[...]          # (n, n, B)
    aref_v = aref_ref[...]  # (nefc, B)
    D = D_ref[...]
    fl = fl_ref[...]        # head rows only meaningful
    act = act_ref[...]      # float; cone blocks gated by their normal row
    a_s = as_ref[...]
    mu = mu_ref[...]        # (S, B) cone parameter mu0/sqrt(impratio)
    scale = scale_ref[...]  # (nfr*S, B) row->y scaling, stacked per dim
    tol = tol_ref[0, 0]

    one_mu2 = 1.0 + mu * mu
    actN = act[nh : nh + S]          # (S, B) normal-row activity
    Dn = D[nh : nh + S]              # (S, B)
    Dfr = D[nh + S :]                # (nfr*S, B) friction-row D
    sc2 = scale * scale

    # head-row masks (same families as the pyramidal kernel). nh == 0 models
    # (no equality/dof-friction/limit rows, e.g. a free sphere on a plane)
    # skip every head-row term statically — Mosaic rejects zero-size vector
    # types, so the guards must be Python-level, not masked arithmetic.
    if nh:
        row = jax.lax.broadcasted_iota(jnp.int32, (nh, 1), 0)
        is_eq = (row < ne).astype(dtype)
        is_fric = ((row >= ne) & (row < ne + nf)).astype(dtype)
        one_sided = 1.0 - is_eq - is_fric
        not_fric = 1.0 - is_fric
        D_h, fl_h, act_h = D[:nh], fl[:nh], act[:nh]

    def jmul(x):
        return (J * x[None, :, :]).sum(axis=1)

    def jtmul(f):
        return (J * f[:, None, :]).sum(axis=0)

    def mmul(x):
        return (M * x[None, :, :]).sum(axis=1)

    def head_force_quadD(jart_h):
        neg = (jart_h < 0).astype(dtype)
        gated = (one_sided * neg + (1.0 - one_sided)) * act_h
        Dj = D_h * jart_h
        lin = (jnp.abs(Dj) > fl_h).astype(dtype)
        fric_force = lin * (-jnp.sign(jart_h) * fl_h) + (1.0 - lin) * (-Dj)
        force = (is_fric * fric_force + not_fric * (-Dj)) * gated
        quadD = D_h * (is_fric * (1.0 - lin) + not_fric) * gated
        return force, quadD

    def head_cost(jart_h):
        neg = (jart_h < 0).astype(dtype)
        gated = (one_sided * neg + (1.0 - one_sided)) * act_h
        Dj = D_h * jart_h
        quad_cost = 0.5 * Dj * jart_h
        lin = (jnp.abs(Dj) > fl_h).astype(dtype)
        fric_cost = lin * (fl_h * jnp.abs(jart_h) - 0.5 * fl_h * fl_h / jnp.maximum(D_h, 1e-12)) + (
            1.0 - lin
        ) * quad_cost
        return (is_fric * fric_cost + not_fric * quad_cost) * gated

    def cone_state(jar):
        """Zone state from the contact rows of jar: all (S, B) scalars."""
        N = jar[nh : nh + S]
        y = jar[nh + S :] * scale  # (nfr*S, B) mu-scaled friction residuals
        T2 = y[:S] * y[:S]
        for k in range(1, nfr):
            T2 = T2 + y[k * S : (k + 1) * S] * y[k * S : (k + 1) * S]
        T = jnp.sqrt(jnp.maximum(T2, 1e-24))
        muT = mu * T
        bot = (mu * N <= -T).astype(dtype)
        top = (N >= muT).astype(dtype)
        mid = (1.0 - bot) * (1.0 - top)
        cfac = (muT - N) / one_mu2
        return N, y, T2, T, bot, mid, cfac

    def cone_cost(jar):
        N, y, T2, T, bot, mid, cfac = cone_state(jar)
        return (bot * (0.5 * Dn * (N * N + T2)) + mid * (0.5 * Dn * cfac * cfac * one_mu2)) * actN

    def total_cost(qacc, jar):
        dacc = qacc - a_s
        smooth = 0.5 * (dacc * mmul(dacc)).sum(axis=0)
        out = smooth + cone_cost(jar).sum(axis=0)
        if nh:
            out = out + head_cost(jar[:nh]).sum(axis=0)
        return out

    def cone_force(jar):
        """Force on contact rows in kernel order: (S + nfr*S, B)."""
        N, y, T2, T, bot, mid, cfac = cone_state(jar)
        fN = (bot * (-Dn * N) + mid * (Dn * cfac)) * actN
        coef_b = -Dn * actN * bot          # (S, B)
        coef_m = (-Dn * cfac * mu / T) * actN * mid
        parts = [fN]
        for k in range(nfr):
            yk = y[k * S : (k + 1) * S]
            sk = scale[k * S : (k + 1) * S]
            # bottom: -Dn*y_k; middle: -Dn*cfac*mu*yhat_k; both *scale back to rows
            parts.append((coef_b * yk + coef_m * yk) * sk)
        return jnp.concatenate(parts, axis=0)

    # ---- initial point ----
    jar_s = jmul(a_s) - aref_v
    cost_s = total_cost(a_s, jar_s)
    qacc, jar, cost = a_s, jar_s, cost_s
    if use_ws:
        ws = ws_ref[...]
        jar_w = jmul(ws) - aref_v
        cost_w = total_cost(ws, jar_w)
        bet = (cost_w < cost_s).astype(dtype)
        qacc = bet[None, :] * ws + (1.0 - bet[None, :]) * a_s
        jar = bet[None, :] * jar_w + (1.0 - bet[None, :]) * jar_s
        cost = bet * cost_w + (1.0 - bet) * cost_s

    prev_cost = jnp.full((B,), 1e30, dtype)
    eye_reg = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1),
        jnp.asarray(1e-8, dtype),
        jnp.asarray(0.0, dtype),
    )

    def newton_body(carry):
        qacc, jar, cost, prev_cost = carry
        if nh:
            force_h, h_h = head_force_quadD(jar[:nh])
            force = jnp.concatenate([force_h, cone_force(jar)], axis=0)
        else:
            force = cone_force(jar)
        Mdacc = mmul(qacc - a_s)
        grad = Mdacc - jtmul(force)

        # scaled-row buffer JW: head rows diag(h)*J_h; contact rows SB = W@R
        # per block, W the zone-blended symmetric (cdim, cdim) coefficients
        # (engine/solver.py _elliptic_W, row space: v = (-1, mu*yhat_k*s_k))
        N, y, T2, T, bot, mid, cfac = cone_state(jar)
        g_mid = Dn / one_mu2 * mid * actN
        curv = Dn * mu * cfac / T * mid * actN   # (I - yhat yhat^T) factor
        yh = [y[k * S : (k + 1) * S] / T for k in range(nfr)]  # yhat_k
        sk = [scale[k * S : (k + 1) * S] for k in range(nfr)]
        bot_a = bot * actN
        # W entries as (S, B) planes
        W00 = g_mid + bot_a * Dn
        W0k = [-g_mid * mu * yh[k] * sk[k] for k in range(nfr)]
        Wkk = {}
        for kk in range(nfr):
            for jj in range(kk, nfr):
                delta = 1.0 if kk == jj else 0.0
                w = (
                    g_mid * mu * mu * yh[kk] * yh[jj]
                    + curv * (delta - yh[kk] * yh[jj])
                ) * sk[kk] * sk[jj]
                if kk == jj:
                    w = w + bot_a * Dfr[kk * S : (kk + 1) * S]
                Wkk[(kk, jj)] = w
        RN = J[nh : nh + S]  # (S, n, B)
        RT = [J[nh + (k + 1) * S : nh + (k + 2) * S] for k in range(nfr)]
        SB_N = W00[:, None, :] * RN
        for k in range(nfr):
            SB_N = SB_N + W0k[k][:, None, :] * RT[k]
        SBs = [SB_N]
        for kk in range(nfr):
            sb = W0k[kk][:, None, :] * RN
            for jj in range(nfr):
                w = Wkk[(min(kk, jj), max(kk, jj))]
                sb = sb + w[:, None, :] * RT[jj]
            SBs.append(sb)
        JW = jnp.concatenate(([J[:nh] * h_h[:, None, :]] if nh else []) + SBs, axis=0)
        H = M + eye_reg
        rows = [(J[:, v : v + 1, :] * JW).sum(axis=0) for v in range(n)]
        H = H + jnp.stack(rows, axis=0)
        L = _chol_columns(H, n)
        p = -_solve_from_l(L, grad, n)
        jp = jmul(p)

        # ---- closed-form line search (engine/solver.py scalar path) ----
        mp = mmul(p)
        pmp = (p * mp).sum(axis=0)
        pma = (p * Mdacc).sum(axis=0)
        N0 = jar[nh : nh + S]
        dN = jp[nh : nh + S]
        dy = jp[nh + S :] * scale
        aq = T2  # T(0)^2 from the current jar
        bq = y[:S] * dy[:S]
        cq = dy[:S] * dy[:S]
        for k in range(1, nfr):
            bq = bq + y[k * S : (k + 1) * S] * dy[k * S : (k + 1) * S]
            cq = cq + dy[k * S : (k + 1) * S] * dy[k * S : (k + 1) * S]
        # t-independent bottom-zone curvature: sum over block rows of D*dx^2
        jp_fr = jp[nh + S :]
        h_bot = Dn * dN * dN
        for k in range(nfr):
            jk = jp_fr[k * S : (k + 1) * S]
            h_bot = h_bot + Dfr[k * S : (k + 1) * S] * jk * jk
        if nh:
            jar_h, jp_h = jar[:nh], jp[:nh]

        # guarded bracketed Newton on t (engine/solver.py _line_search note:
        # raw Newton-on-t 2-cycles across cone zone boundaries and stalls
        # the solve; phi' is monotone so sign(g) maintains a valid bracket)
        def ls_body(carry):
            t, lo, hi = carry
            if nh:
                force_t, h_t = head_force_quadD(jar_h + t[None, :] * jp_h)
                g = pma + t * pmp - (force_t * jp_h).sum(axis=0)
                hh = pmp + (h_t * jp_h * jp_h).sum(axis=0)
            else:
                g = pma + t * pmp
                hh = pmp
            T2t = jnp.maximum(aq + 2.0 * bq * t[None, :] + cq * t[None, :] * t[None, :], 1e-24)
            Tt = jnp.sqrt(T2t)
            Tp = (bq + cq * t[None, :]) / Tt
            Nt = N0 + t[None, :] * dN
            muT = mu * Tt
            bot_t = (mu * Nt <= -Tt).astype(dtype)
            top_t = (Nt >= muT).astype(dtype)
            mid_t = (1.0 - bot_t) * (1.0 - top_t)
            cfac_t = (muT - Nt) / one_mu2
            g_b = Dn * (Nt * dN + bq + cq * t[None, :])
            g_m = -Dn * cfac_t * (dN - mu * Tp)
            h_m = Dn / one_mu2 * (mu * Tp - dN) ** 2 + Dn * mu * cfac_t / Tt * jnp.maximum(
                cq - Tp * Tp, 0.0
            )
            gb = (bot_t * g_b + mid_t * g_m) * actN
            hb = (bot_t * h_bot + mid_t * h_m) * actN
            gt = g + gb.sum(axis=0)
            neg = (gt < 0).astype(dtype)
            lo = neg * jnp.maximum(lo, t) + (1.0 - neg) * lo
            hi = neg * hi + (1.0 - neg) * jnp.minimum(hi, t)
            tn = t - gt / jnp.maximum(hh + hb.sum(axis=0), 1e-12)
            ok = ((tn > lo) & (tn < hi)).astype(dtype)
            return ok * tn + (1.0 - ok) * 0.5 * (lo + hi), lo, hi

        nls = max(ls_iterations, 1)
        ls_carry = (jnp.zeros((B,), dtype), jnp.zeros((B,), dtype), jnp.full((B,), 4.0, dtype))
        if nls <= 8:
            for _ls in range(nls):
                ls_carry = ls_body(ls_carry)
        else:
            ls_carry = jax.lax.fori_loop(0, nls, lambda _, c: ls_body(c), ls_carry)
        t = jnp.clip(ls_carry[0], 0.0, 4.0)

        qacc_n = qacc + t[None, :] * p
        jar_n = jar + t[None, :] * jp
        cost_n = total_cost(qacc_n, jar_n)
        act_f = (prev_cost - cost > tol).astype(dtype)
        take = (cost_n < cost).astype(dtype) * act_f
        keep = 1.0 - take
        qacc = take[None, :] * qacc_n + keep[None, :] * qacc
        jar = take[None, :] * jar_n + keep[None, :] * jar
        prev_cost = act_f * cost + (1.0 - act_f) * prev_cost
        cost = take * cost_n + keep * cost
        return qacc, jar, cost, prev_cost

    carry = (qacc, jar, cost, prev_cost)
    if iterations <= 8:
        for _ in range(iterations):
            carry = newton_body(carry)
    else:
        carry = jax.lax.fori_loop(0, iterations, lambda _, c: newton_body(c), carry)
    qacc, jar = carry[0], carry[1]

    if nh:
        force_h, _ = head_force_quadD(jar[:nh])
        force = jnp.concatenate([force_h, cone_force(jar)], axis=0)
    else:
        force = cone_force(jar)
    qacc_ref[...] = qacc
    force_ref[...] = force  # kernel row order; caller inverse-permutes
    qfrc_ref[...] = jtmul(force)


def newton_solve_elliptic(
    J: jax.Array,       # (Bt, nefc, nv) — MuJoCo row order
    qM: jax.Array,
    aref: jax.Array,
    D: jax.Array,
    fl: jax.Array,
    active: jax.Array,
    qacc_smooth: jax.Array,
    warmstart: jax.Array,
    tol: jax.Array,     # scalar
    friction: jax.Array,  # (Bt, S, >= cdim-1) contact friction coefficients
    impratio: jax.Array,  # scalar
    *,
    ne: int,
    nf: int,
    base: int,          # first contact row (head rows = [0, base))
    ncon: int,          # S cone blocks
    cdim: int,
    iterations: int,
    ls_iterations: int,
    use_ws: bool,
    interpret: bool = False,
    tile: int | None = None,
):
    """Fused elliptic-cone Newton solve for single-condim contiguous-tail
    layouts. Same contract as newton_solve_batched; outputs in MuJoCo row
    order."""
    import numpy as np

    b, nefc, n = J.shape
    dtype = J.dtype
    S, nfr, nh = ncon, cdim - 1, base
    assert nh + S * cdim == nefc

    # kernel row order: [head | N(S) | T_1(S) | ... | T_nfr(S)]
    perm = np.concatenate(
        [np.arange(nh)] + [nh + np.arange(S) * cdim + k for k in range(cdim)]
    )
    kinv = np.argsort(perm)

    # mu-scaled cone parameters (engine/solver.py _elliptic_zone algebra).
    # impratio may be scalar or per-env (Bt,) under domain randomization —
    # it folds into the mu/scale planes, which ride the batch anyway.
    mu0 = jnp.maximum(friction[..., 0], 1e-12)  # (Bt, S)
    sq = jnp.sqrt(jnp.broadcast_to(impratio, (b,)).astype(dtype))[:, None]  # (Bt, 1)
    mu = mu0 / sq
    scale = friction[..., :nfr] / mu0[..., None] * sq[..., None]  # (Bt, S, nfr)
    scale_k = jnp.moveaxis(scale, -1, 1).reshape(b, nfr * S)  # dim-major stack

    if tile is None:
        # 3.5x Mosaic calibration (see elliptic_fits_vmem)
        n_pad = -(-n // 8) * 8
        per_env = 4 * (2 * nefc * n_pad + 3 * n * n + 14 * nefc + 12 * n)
        tile = next((t for t in (512, 256, 128) if 3.5 * per_env * t < _VMEM_BUDGET), 128)
    bp = -(-b // tile) * tile

    def bpad(x, fill=0.0):
        xt = jnp.moveaxis(x, 0, -1)
        pad = [(0, 0)] * (xt.ndim - 1) + [(0, bp - b)]
        return jnp.pad(xt, pad, constant_values=fill)

    M_t = bpad(qM)
    if bp > b:
        eye = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1),
            jnp.ones((), dtype),
            jnp.zeros((), dtype),
        )
        pad_mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bp), 2) >= b
        M_t = jnp.where(pad_mask, eye, M_t)

    args = [
        bpad(J[:, perm]),
        M_t,
        bpad(aref[:, perm]),
        bpad(D[:, perm]),
        bpad(fl[:, perm]),
        bpad(active[:, perm].astype(dtype)),
        bpad(qacc_smooth),
        bpad(warmstart),
        bpad(mu, fill=1.0),       # padded envs: benign nonzero mu
        bpad(scale_k, fill=1.0),
        jnp.reshape(tol.astype(dtype), (1, 1)),
    ]
    in_specs = [
        pl.BlockSpec((nefc, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((S, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nfr * S, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(
        _elliptic_kernel,
        ne=ne,
        nf=nf,
        nh=nh,
        S=S,
        cdim=cdim,
        iterations=iterations,
        ls_iterations=ls_iterations,
        use_ws=use_ws,
    )
    qacc_t, force_t, qfrc_t = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nefc, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, bp), dtype),
            jax.ShapeDtypeStruct((nefc, bp), dtype),
            jax.ShapeDtypeStruct((n, bp), dtype),
        ),
        interpret=interpret,
    )(*args)
    force = jnp.moveaxis(force_t[:, :b], -1, 0)[:, kinv]
    return (
        jnp.moveaxis(qacc_t[:, :b], -1, 0),
        force,
        jnp.moveaxis(qfrc_t[:, :b], -1, 0),
    )

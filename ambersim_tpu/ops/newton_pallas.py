"""Fused batched Newton contact solver as a single Pallas TPU kernel.

The constraint solve is ~70% of the fused step time on the quadruped
benchmark (benchmarks/profile_phases.py). Expressed per-env under vmap, the
batch axis is major, so every (nv x nv) / (nefc x nv) operand puts tiny
dimensions (nv ~ 18) on the 128-wide lane axis — ~14% lane utilization and
dozens of small kernels per Newton iteration. This kernel transposes the
problem: the env batch rides the LANE dimension (operands are (nefc, nv, B)
/ (nv, nv, B) tiles in VMEM) and ALL Newton iterations — row costs, gradient,
Hessian assembly, Cholesky solve, exact line search, masked convergence
update — run in ONE Mosaic kernel per 128-env tile, with J resident in VMEM
throughout.

Scope: pyramidal cones (equality/friction/limit/contact rows via static
ne/nf row masks). Elliptic-cone models keep the jnp path
(engine/solver.py dispatches). Semantics mirror engine/solver.py exactly:
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

"""Pallas TPU kernels: fused batched Cholesky factorization and solves.

The engine solves thousands of tiny SPD systems per step (mass matrix,
implicit damping, Newton Hessian). Expressed in plain jnp, an unrolled n-step
factorization emits ~3n XLA ops per solve, which both bloats the step graph
(XLA scheduling goes superlinear past ~10k ops) and launches thousands of
tiny kernels. These kernels fuse the whole factor+substitution into ONE
Mosaic kernel per batch tile, with the env batch riding the lane dimension
(arrays are (n, n, TILE) in VMEM).

Integration: engine/linalg.py wraps these with jax.custom_batching.custom_vmap
so per-env code (`vmap(step)`) transparently dispatches to the batched kernel
on TPU and to the unrolled jnp path elsewhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _chol_columns(a, n):
    """Shared in-kernel Cholesky: a is (n, n, TB); returns L as (n, n, TB).

    Divisions are the latency bottleneck of the column sweep (the rest is
    mults/adds): one reciprocal per column on the (TB,) diagonal replaces the
    (n, TB)-wide divide."""
    cols = []
    row_ge = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for j in range(n):
        dinv = jax.lax.rsqrt(jnp.maximum(a[j, j], 1e-12))  # (TB,)
        col = a[:, j] * dinv[None, :]  # (n, TB)
        col = jnp.where(row_ge >= j, col, 0.0)
        cols.append(col)
        # col is zero in rows < j, so col x col^T is nonzero only in the
        # trailing (rows >= j, cols >= j) block; restrict the update to the
        # sublane-aligned block containing it to skip all-zero tiles.
        # (Mosaic notes: slice the 2D col BEFORE expanding dims — a fused
        # expand+offset-slice on the sublane dim of a 3D value lowers to an
        # unsupported gather; .at[].add / dynamic_update_slice are likewise
        # unsupported, hence the concatenate reassembly.)
        j0 = (j // 8) * 8
        if j0 > 0:
            cs = col[j0:]  # (n - j0, TB)
            upd = cs[:, None, :] * cs[None, :, :]
            bot = jnp.concatenate([a[j0:, :j0], a[j0:, j0:] - upd], axis=1)
            a = jnp.concatenate([a[:j0], bot], axis=0)
        else:
            a = a - col[:, None, :] * col[None, :, :]
    return jnp.stack(cols, axis=1)  # (n, n, TB), column j at [:, j]


def _solve_from_l(l, b, n):
    """Forward+backward substitution; l (n, n, TB), b (n, TB) -> x (n, TB).

    Column-sweep form: each of the 2n steps is one full-width vector op
    (instead of O(n^2) scalar updates), keeping the Mosaic graph small.
    Diagonal reciprocals are hoisted so both sweeps are multiply-only."""
    dinv = [1.0 / l[j, j] for j in range(n)]  # (TB,) each
    y = b
    ys = []
    for j in range(n):
        yj = y[j] * dinv[j]  # (TB,)
        ys.append(yj)
        y = y - l[:, j] * yj[None, :]
    x = jnp.stack(ys, axis=0)
    xs = [None] * n
    for j in range(n - 1, -1, -1):
        xj = x[j] * dinv[j]
        xs[j] = xj
        x = x - l[j, :] * xj[None, :]  # row j of L = column j of L^T
    return jnp.stack(xs, axis=0)


_PANEL = 64


def _chol_columns_panel(a, n, P=_PANEL):
    """Right-looking panel-blocked Cholesky for large n (clutter: n=192).

    The plain column sweep does n dependent rank-1 updates over the FULL
    trailing block — at n=192 that is 192 serial steps each touching up to
    (192, 192, TB). Here each panel of P columns restricts its serial
    column steps to the panel's own columns (length <= P), and the panel's
    contribution to the trailing block lands as P INDEPENDENT accumulate
    products at the end — same flops, but the long serial chain only
    touches narrow slabs and the O(n^3) bulk sits in big latency-tolerant
    ops. Same math as _chol_columns (fp reassociation only)."""
    cols = []
    row_ge = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for p0 in range(0, n, P):
        p1 = min(p0 + P, n)
        pcols = []
        for j in range(p0, p1):
            dinv = jax.lax.rsqrt(jnp.maximum(a[j, j], 1e-12))  # (TB,)
            col = a[:, j] * dinv[None, :]
            col = jnp.where(row_ge >= j, col, 0.0)
            pcols.append(col)
            cols.append(col)
            if j + 1 < p1:
                # panel-internal update: columns j+1..p1 only, rows j0..
                # (zero-size slices are special-cased: Mosaic rejects 0-dim
                # vector types)
                j0 = (j // 8) * 8
                cs = col[j0:]  # (n - j0, TB)
                seg = a[j0:, j + 1 : p1] - cs[:, None, :] * col[j + 1 : p1][None, :, :]
                parts1 = [a[j0:, : j + 1], seg]
                if p1 < n:
                    parts1.append(a[j0:, p1:])
                bot = jnp.concatenate(parts1, axis=1)
                a = jnp.concatenate([a[:j0], bot], axis=0) if j0 > 0 else bot
        if p1 < n:
            # trailing update: A[p1:, p1:] -= sum_j c_j[p1:] x c_j[p1:]
            acc = None
            for c in pcols:
                ct = c[p1:]  # (n - p1, TB)
                upd = ct[:, None, :] * ct[None, :, :]
                acc = upd if acc is None else acc + upd
            bot = jnp.concatenate([a[p1:, :p1], a[p1:, p1:] - acc], axis=1)
            a = jnp.concatenate([a[:p1], bot], axis=0)
    return jnp.stack(cols, axis=1)


def _solve_from_l_panel(l, b, n, P=_PANEL):
    """Blocked forward/backward substitution: P serial steps per panel on
    (P, TB) slabs, then one batched update of the remaining rows per panel
    (P independent accumulations) — the 2n-step dependent chain of
    _solve_from_l touches only panel-width slabs."""
    dinv = [1.0 / l[j, j] for j in range(n)]
    y = b
    ys = [None] * n
    for p0 in range(0, n, P):
        p1 = min(p0 + P, n)
        for j in range(p0, p1):
            yj = y[j] * dinv[j]
            ys[j] = yj
            if j + 1 < p1:
                parts = [y[: j + 1], y[j + 1 : p1] - l[j + 1 : p1, j] * yj[None, :]]
                if p1 < n:
                    parts.append(y[p1:])
                y = jnp.concatenate(parts, axis=0)
        if p1 < n:
            acc = None
            for j in range(p0, p1):
                upd = l[p1:, j] * ys[j][None, :]
                acc = upd if acc is None else acc + upd
            y = jnp.concatenate([y[:p1], y[p1:] - acc], axis=0)
    x = jnp.stack(ys, axis=0)
    xs = [None] * n
    for p1 in range(n, 0, -P):
        p0 = max(p1 - P, 0)
        for j in range(p1 - 1, p0 - 1, -1):
            xj = x[j] * dinv[j]
            xs[j] = xj
            if j > p0:
                # l[j, p0:j] is row j of L over the panel's columns: (j-p0, TB)
                parts = [x[p0:j] - l[j, p0:j] * xj[None, :], x[j:]]
                if p0 > 0:
                    parts.insert(0, x[:p0])
                x = jnp.concatenate(parts, axis=0)
        if p0 > 0:
            acc = None
            for j in range(p0, p1):
                upd = l[j, :p0] * xs[j][None, :]
                acc = upd if acc is None else acc + upd
            x = jnp.concatenate([x[:p0] - acc, x[p0:]], axis=0)
    return jnp.stack(xs, axis=0)


def _solve_pd_kernel(a_ref, b_ref, out_ref):
    n = a_ref.shape[0]
    if n > _PANEL:
        l = _chol_columns_panel(a_ref[...], n)
        out_ref[...] = _solve_from_l_panel(l, b_ref[...], n)
    else:
        l = _chol_columns(a_ref[...], n)
        out_ref[...] = _solve_from_l(l, b_ref[...], n)


def _chol_kernel(a_ref, out_ref):
    n = a_ref.shape[0]
    fac = _chol_columns_panel if n > _PANEL else _chol_columns
    out_ref[...] = fac(a_ref[...], n)


def _cho_solve_kernel(l_ref, b_ref, out_ref):
    n = l_ref.shape[0]
    sol = _solve_from_l_panel if n > _PANEL else _solve_from_l
    out_ref[...] = sol(l_ref[...], b_ref[...], n)


def _batched_call(kernel, mats, vecs, out_is_mat):
    """Run `kernel` over batch tiles. mats (B, n, n), vecs (B, n) or None.

    The column sweeps are serial-latency-bound (2n-4n dependent steps of
    tiny vector ops), so the env tile is made as wide as VMEM allows: fewer
    grid steps = proportionally less total serial latency. Working set per
    env is only ~3*n^2 floats, so small n (nv <= ~24) runs at tile 1024."""
    b = mats.shape[0]
    n = mats.shape[-1]
    per_env = 4 * (3 * n * n + 6 * n)  # in+out (double-buffered) + vectors
    tile = next((t for t in (1024, 512, 256) if per_env * 2 * t < 12 * 2**20), TILE)
    if n > 128:
        # big-nv scenes (clutter32: nv=192): the kernels' live values spill
        # ~n^2*tile to the kernel stack vs the default 16 MB scoped-vmem
        # limit, so shrink the lane tile AND raise the scoped limit (see
        # _batched_call's compiler_params). Serial sweeps multiply across
        # the extra chunks but stay far ahead of XLA's native batched
        # cholesky at these shapes (VERDICT r2 #5). The panel-blocked
        # factor/solve (n > _PANEL) keeps fewer live rank-1 intermediates
        # than the plain column sweep, so its tile can ride higher;
        # AMBERSIM_LINALG_TILE overrides for experiments.
        env_tile = os.environ.get("AMBERSIM_LINALG_TILE")
        if env_tile:
            tile = int(env_tile)
        else:
            tile = 64 if n <= 192 else 32
    bp = -(-b // tile) * tile
    a_t = jnp.moveaxis(mats, 0, -1)  # (n, n, B)
    a_t = jnp.pad(a_t, ((0, 0), (0, 0), (0, bp - b)), constant_values=0.0)
    if bp > b:  # keep padded systems well-posed: A_pad = I
        eye = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1),
            jnp.ones((), mats.dtype),
            jnp.zeros((), mats.dtype),
        )
        pad_mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bp), 2) >= b
        a_t = jnp.where(pad_mask, eye, a_t)

    inputs = [a_t]
    if vecs is not None:
        v_t = jnp.moveaxis(vecs, 0, -1)  # (n, B)
        v_t = jnp.pad(v_t, ((0, 0), (0, bp - b)))
        inputs.append(v_t)

    if tile < TILE:
        # Mosaic requires lane blocks of 128 (or the full array): for the
        # narrow tiles big-nv shapes need, chunk the batch OUTSIDE the
        # kernel (lax.map over bp/tile chunks whose lane dim == tile) so
        # each pallas_call sees a full-array block with grid=(1,).
        def call_one(chunk):
            a_c = chunk[0]
            ins = [a_c] + ([chunk[1]] if vecs is not None else [])
            specs = [
                pl.BlockSpec(x.shape, (lambda nd: lambda i: (0,) * nd)(x.ndim), memory_space=pltpu.VMEM)
                for x in ins
            ]
            oshape = (
                jax.ShapeDtypeStruct((n, n, tile), mats.dtype)
                if out_is_mat
                else jax.ShapeDtypeStruct((n, tile), mats.dtype)
            )
            ospec = pl.BlockSpec(oshape.shape, lambda i: (0,) * len(oshape.shape), memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                grid=(1,),
                in_specs=specs,
                out_specs=ospec,
                out_shape=oshape,
                compiler_params=pltpu.CompilerParams(
                    # n=192/tile 32 measures 102.6M scoped; 112M fits it
                    # inside the ~128M physical VMEM with headroom
                    vmem_limit_bytes=int(112 * 2**20)
                ),
            )(*ins)

        # static python loop over chunks (not lax.map): a while-loop wrapper
        # re-triggers XLA's 16M scoped-vmem accounting around the custom
        # call even with the kernel's own limit raised
        g = bp // tile
        outs = []
        for i in range(g):
            sl = slice(i * tile, (i + 1) * tile)
            chunk = (a_t[..., sl],) + ((v_t[..., sl],) if vecs is not None else ())
            outs.append(call_one(chunk))
        out = jnp.concatenate(outs, axis=-1)
        out = out[..., :b]
        return jnp.moveaxis(out, -1, 0)

    in_specs = [pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)]
    if vecs is not None:
        in_specs.append(pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM))

    out_shape = (
        jax.ShapeDtypeStruct((n, n, bp), mats.dtype)
        if out_is_mat
        else jax.ShapeDtypeStruct((n, bp), mats.dtype)
    )
    out_spec = (
        pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        if out_is_mat
        else pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
    )(*inputs)
    out = out[..., :b]
    return jnp.moveaxis(out, -1, 0)


def solve_pd_batched(a: jax.Array, b: jax.Array) -> jax.Array:
    """Fused Cholesky solve of (B, n, n) SPD systems with rhs (B, n)."""
    return _batched_call(_solve_pd_kernel, a, b, out_is_mat=False)


def cholesky_batched(a: jax.Array) -> jax.Array:
    """Lower Cholesky of (B, n, n) SPD matrices."""
    return _batched_call(_chol_kernel, a, None, out_is_mat=True)


def cho_solve_batched(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve with precomputed lower factors (B, n, n), rhs (B, n)."""
    return _batched_call(_cho_solve_kernel, l, b, out_is_mat=False)

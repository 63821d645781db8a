"""Batch-friendly small dense linear algebra.

XLA's generic cholesky/triangular_solve lowers to sequential loops that run
poorly for huge batches of tiny matrices (the simulation regime: nv ~ 10-40,
batch ~ 4096). Two paths:

  * unrolled jnp versions (nv straight-line vectorized steps) — used
    unbatched and on non-TPU backends;
  * fused Pallas TPU kernels (ops/linalg_pallas.py) — dispatched via
    jax.custom_batching.custom_vmap, so per-env engine code under vmap(step)
    transparently collapses each factor/solve into ONE kernel per batch tile
    instead of ~3*nv XLA ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Pallas kernel VMEM gate: windows are (n, n, TILE) fp32, double-buffered
# for input and output, plus register spill scratch that grows ~n^2.
# Measured: n=192 at lane tile 128 needs 138M of the 128M VMEM (36M in +
# 36M out + 66M spills); n<=128 leaves >2x margin at tile 128. Past 128 the
# kernel shrinks the lane tile (64 at n<=192, 32 beyond — see
# ops/linalg_pallas._batched_call), which admits the clutter-class nv=192
# scenes (VERDICT r2 #5). 192 is the largest n with a measured scoped-VMEM
# fit (102.6 MB at tile 32 vs the 112 MB limit); spill grows ~n^2, so larger
# n falls back to XLA's native blocked path until measured.
_PALLAS_MAX_N = 192
# Unrolled straight-line factor/solve is serial-latency-optimal for the
# simulation regime (nv ~ 10-40) but its op count — and XLA compile time —
# grows with n (a 192-dof scene takes ~4 min to compile the unrolled factor
# on CPU). Beyond this, XLA's native blocked cholesky/triangular_solve
# (O(1) compile, MXU-friendly matmul blocks) wins on every axis.
_UNROLL_MAX_N = 64


def _use_pallas(a: jax.Array) -> bool:
    # a is the batched operand inside a custom_vmap rule: (B, n, n)
    return (
        jax.devices()[0].platform == "tpu"
        and a.ndim == 3
        and a.shape[-1] <= _PALLAS_MAX_N
    )


def _cholesky_native(a: jax.Array) -> jax.Array:
    return jnp.linalg.cholesky(a)


def _cho_solve_native(l: jax.Array, b: jax.Array) -> jax.Array:
    y = jax.lax.linalg.triangular_solve(l, b[..., None], left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(
        l, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0]


def _solve_lower_mat(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L Y = B with L (..., n, n) lower-triangular, B (..., n, m),
    unrolled over n (n <= _UNROLL_MAX_N panels only)."""
    n = l.shape[-1]
    y = jnp.zeros_like(b)
    for j in range(n):
        acc = jnp.einsum("...k,...km->...m", l[..., j, :j], y[..., :j, :]) if j else 0.0
        y = y.at[..., j, :].set((b[..., j, :] - acc) / l[..., j, j][..., None])
    return y


def cholesky_blocked(a: jax.Array, nb: int | None = None) -> jax.Array:
    """Blocked right-looking Cholesky for n > _UNROLL_MAX_N (VERDICT r2 #5).

    XLA's native batched cholesky at (B, 192, 192) measures ~2 s/call on
    v5e (loop-heavy lowering); this factors in nb-wide panels where the
    trailing updates and panel solves are MXU matmuls and only the nb x nb
    diagonal blocks run the unrolled straight-line factor. Pads n up to a
    multiple of nb with an identity diagonal (decoupled, exact)."""
    n = a.shape[-1]
    nb = nb or _UNROLL_MAX_N
    nblk = -(-n // nb)
    npad = nblk * nb - n
    if npad:
        eye_pad = jnp.zeros(a.shape[:-2] + (npad, npad), a.dtype) + jnp.eye(npad, dtype=a.dtype)
        top = jnp.concatenate([a, jnp.zeros(a.shape[:-2] + (n, npad), a.dtype)], axis=-1)
        bot = jnp.concatenate([jnp.zeros(a.shape[:-2] + (npad, n), a.dtype), eye_pad], axis=-1)
        a = jnp.concatenate([top, bot], axis=-2)
    # panel grid of blocks; L accumulated as a (nblk x nblk) grid then stitched
    blocks = [[None] * nblk for _ in range(nblk)]
    inv_diag = [None] * nblk
    eye_nb = jnp.eye(nb, dtype=a.dtype)
    for k in range(nblk):
        akk = a[..., k * nb : (k + 1) * nb, k * nb : (k + 1) * nb]
        for j in range(k):
            akk = akk - blocks[k][j] @ jnp.swapaxes(blocks[k][j], -1, -2)
        lkk = cholesky_unrolled(akk)
        blocks[k][k] = lkk
        inv_diag[k] = _solve_lower_mat(lkk, jnp.broadcast_to(eye_nb, akk.shape))
        inv_t = jnp.swapaxes(inv_diag[k], -1, -2)
        for i in range(k + 1, nblk):
            aik = a[..., i * nb : (i + 1) * nb, k * nb : (k + 1) * nb]
            for j in range(k):
                aik = aik - blocks[i][j] @ jnp.swapaxes(blocks[k][j], -1, -2)
            blocks[i][k] = aik @ inv_t
    zero = jnp.zeros(a.shape[:-2] + (nb, nb), a.dtype)
    rows = [
        jnp.concatenate([blocks[i][j] if j <= i else zero for j in range(nblk)], axis=-1)
        for i in range(nblk)
    ]
    l = jnp.concatenate(rows, axis=-2)
    return l[..., :n, :n] if npad else l


def cho_solve_blocked(l: jax.Array, b: jax.Array, nb: int | None = None) -> jax.Array:
    """Solve A x = b from the blocked/lower Cholesky factor, nb-panel
    forward/backward substitution (diagonal panels unrolled, off-diagonal
    work as matvecs)."""
    n = l.shape[-1]
    nb = nb or _UNROLL_MAX_N
    nblk = -(-n // nb)
    npad = nblk * nb - n
    if npad:
        eye_pad = jnp.zeros(l.shape[:-2] + (npad, npad), l.dtype) + jnp.eye(npad, dtype=l.dtype)
        top = jnp.concatenate([l, jnp.zeros(l.shape[:-2] + (n, npad), l.dtype)], axis=-1)
        bot = jnp.concatenate([jnp.zeros(l.shape[:-2] + (npad, n), l.dtype), eye_pad], axis=-1)
        l = jnp.concatenate([top, bot], axis=-2)
        b = jnp.concatenate([b, jnp.zeros(b.shape[:-1] + (npad,), b.dtype)], axis=-1)
    ys = []
    for k in range(nblk):
        rhs = b[..., k * nb : (k + 1) * nb]
        for j in range(k):
            Lkj = l[..., k * nb : (k + 1) * nb, j * nb : (j + 1) * nb]
            rhs = rhs - jnp.einsum("...ij,...j->...i", Lkj, ys[j])
        ys.append(solve_lower(l[..., k * nb : (k + 1) * nb, k * nb : (k + 1) * nb], rhs))
    xs: list = [None] * nblk
    for k in range(nblk - 1, -1, -1):
        rhs = ys[k]
        for i in range(k + 1, nblk):
            Lik = l[..., i * nb : (i + 1) * nb, k * nb : (k + 1) * nb]
            rhs = rhs - jnp.einsum("...ij,...i->...j", Lik, xs[i])
        xs[k] = solve_upper_t(l[..., k * nb : (k + 1) * nb, k * nb : (k + 1) * nb], rhs)
    x = jnp.concatenate(xs, axis=-1)
    return x[..., :n] if npad else x


def cholesky_unrolled(a: jax.Array) -> jax.Array:
    """Lower Cholesky of (..., n, n) SPD matrices, unrolled over n.

    Past _UNROLL_MAX_N this falls back to XLA's native blocked cholesky:
    measured IN-GRAPH on the clutter32 rung (B=256, nv=192) it beats the
    jnp 64-panel `cholesky_blocked` below (42 vs 15 ms smooth phase, 291 vs
    128 ms solver phase) — the panel path's ~400 sequential small ops per
    factor are latency-bound on TPU. (Isolated microbenchmarks of native
    cholesky over the axon tunnel are misleading: per-call dispatch/readback
    overhead dominates.)"""
    n = a.shape[-1]
    if n > _UNROLL_MAX_N:
        return _cholesky_native(a)
    dtype = a.dtype
    l = jnp.zeros_like(a)
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(a[..., j, j], 1e-12))
        col = a[..., :, j] / d[..., None]  # (..., n)
        # zero the strictly-upper part of this column
        keep = jnp.arange(n) >= j
        col = jnp.where(keep, col, 0.0).astype(dtype)
        l = l.at[..., :, j].set(col)
        # rank-1 downdate of the trailing submatrix
        a = a - col[..., :, None] * col[..., None, :]
    return l


def solve_lower(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b with L (..., n, n) lower-triangular, b (..., n)."""
    n = l.shape[-1]
    y = jnp.zeros_like(b)
    for j in range(n):
        acc = jnp.einsum("...k,...k->...", l[..., j, :], y)
        y = y.at[..., j].set((b[..., j] - acc) / l[..., j, j])
    return y


def solve_upper_t(l: jax.Array, y: jax.Array) -> jax.Array:
    """Solve L^T x = y (backward substitution on the transpose)."""
    n = l.shape[-1]
    x = jnp.zeros_like(y)
    for j in range(n - 1, -1, -1):
        acc = jnp.einsum("...k,...k->...", l[..., :, j], x)
        x = x.at[..., j].set((y[..., j] - acc) / l[..., j, j])
    return x


def cho_solve_unrolled(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given the lower Cholesky factor of A."""
    if l.shape[-1] > _UNROLL_MAX_N:
        return _cho_solve_native(l, b)
    return solve_upper_t(l, solve_lower(l, b))


# ---------------------------------------------------------------------------
# Public entry points: custom_vmap dispatch to fused Pallas kernels on TPU,
# wrapped in custom_vjp so reverse-mode autodiff flows through `step`
# (differentiable simulation). The backward pass re-derives gradients via
# jax.vjp of the unrolled jnp implementation — exact for the same algorithm;
# the Pallas kernels stay on the forward hot path.
# ---------------------------------------------------------------------------


# jit-wrapped unrolled bodies: custom_vmap re-traces its primal on EVERY
# call (jax traces `fun` to a jaxpr in __call__ with no cache), and the
# unrolled factor/solve is n straight-line steps of Python tracing. Binding
# a jitted inner function instead makes the per-call trace a single pjit
# bind whose jaxpr is cached by avals — across calls AND across the
# reset/epoch/eval outer graphs (the time-to-first-update lever,
# VERDICT r4 #1). XLA inlines nested jits, so compiled code is unchanged.
_cholesky_unrolled_jit = jax.jit(cholesky_unrolled)
_cho_solve_unrolled_jit = jax.jit(cho_solve_unrolled)
_solve_pd_unrolled_jit = jax.jit(lambda a, b: cho_solve_unrolled(cholesky_unrolled(a), b))


@jax.custom_batching.custom_vmap
def _cholesky_cv(a: jax.Array) -> jax.Array:
    return _cholesky_unrolled_jit(a)


@_cholesky_cv.def_vmap
def _cholesky_vmap(axis_size, in_batched, a):
    if not in_batched[0]:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if _use_pallas(a):
        from ambersim_tpu.ops.linalg_pallas import cholesky_batched

        return cholesky_batched(a), True
    return _cholesky_unrolled_jit(a), True


@jax.custom_batching.custom_vmap
def _cho_solve_cv(l: jax.Array, b: jax.Array) -> jax.Array:
    return _cho_solve_unrolled_jit(l, b)


@_cho_solve_cv.def_vmap
def _cho_solve_vmap(axis_size, in_batched, l, b):
    if not in_batched[0]:
        l = jnp.broadcast_to(l, (axis_size,) + l.shape)
    if not in_batched[1]:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    if _use_pallas(l):
        from ambersim_tpu.ops.linalg_pallas import cho_solve_batched

        return cho_solve_batched(l, b), True
    return _cho_solve_unrolled_jit(l, b), True


@jax.custom_batching.custom_vmap
def _solve_pd_cv(a: jax.Array, b: jax.Array) -> jax.Array:
    return _solve_pd_unrolled_jit(a, b)


@_solve_pd_cv.def_vmap
def _solve_pd_vmap(axis_size, in_batched, a, b):
    if not in_batched[0]:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not in_batched[1]:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    if _use_pallas(a):
        from ambersim_tpu.ops.linalg_pallas import solve_pd_batched

        return solve_pd_batched(a, b), True
    return _solve_pd_unrolled_jit(a, b), True


def differentiable_dispatch(cv_fn, ref_fn):
    """custom_vjp wrapper over a custom_vmap dispatch: forward takes the fast
    path (Pallas under vmap on TPU), backward re-runs jax.vjp of the pure jnp
    reference implementation `ref_fn` (vmap-compatible, differentiable)."""

    @jax.custom_vjp
    def fn(*args):
        return cv_fn(*args)

    def fwd(*args):
        return cv_fn(*args), args

    def bwd(args, g):
        _, vjp_fn = jax.vjp(ref_fn, *args)
        return vjp_fn(g)

    fn.defvjp(fwd, bwd)
    return fn


cholesky = differentiable_dispatch(_cholesky_cv, cholesky_unrolled)
cholesky.__doc__ = "Lower Cholesky of an SPD matrix; batched calls fuse on TPU."
cho_solve = differentiable_dispatch(_cho_solve_cv, cho_solve_unrolled)
cho_solve.__doc__ = "Solve A x = b given the lower Cholesky factor; batched calls fuse on TPU."
solve_pd = differentiable_dispatch(
    _solve_pd_cv, lambda a, b: cho_solve_unrolled(cholesky_unrolled(a), b)
)
solve_pd.__doc__ = "Solve SPD system A x = b; batched calls fuse into one TPU kernel."

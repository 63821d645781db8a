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


# Pallas kernel VMEM gate: windows are (n, n, 128) fp32, double-buffered for
# input and output, plus register spill scratch that grows ~n^2. Measured:
# n=192 at tile 128 needs 138M of the 128M VMEM (36M in + 36M out + 66M
# spills); n<=128 leaves >2x margin.
_PALLAS_MAX_N = 128
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


def cholesky_unrolled(a: jax.Array) -> jax.Array:
    """Lower Cholesky of (..., n, n) SPD matrices, unrolled over n."""
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


@jax.custom_batching.custom_vmap
def _cholesky_cv(a: jax.Array) -> jax.Array:
    return cholesky_unrolled(a)


@_cholesky_cv.def_vmap
def _cholesky_vmap(axis_size, in_batched, a):
    if not in_batched[0]:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if _use_pallas(a):
        from ambersim_tpu.ops.linalg_pallas import cholesky_batched

        return cholesky_batched(a), True
    return cholesky_unrolled(a), True


@jax.custom_batching.custom_vmap
def _cho_solve_cv(l: jax.Array, b: jax.Array) -> jax.Array:
    return cho_solve_unrolled(l, b)


@_cho_solve_cv.def_vmap
def _cho_solve_vmap(axis_size, in_batched, l, b):
    if not in_batched[0]:
        l = jnp.broadcast_to(l, (axis_size,) + l.shape)
    if not in_batched[1]:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    if _use_pallas(l):
        from ambersim_tpu.ops.linalg_pallas import cho_solve_batched

        return cho_solve_batched(l, b), True
    return cho_solve_unrolled(l, b), True


@jax.custom_batching.custom_vmap
def _solve_pd_cv(a: jax.Array, b: jax.Array) -> jax.Array:
    return cho_solve_unrolled(cholesky_unrolled(a), b)


@_solve_pd_cv.def_vmap
def _solve_pd_vmap(axis_size, in_batched, a, b):
    if not in_batched[0]:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not in_batched[1]:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    if _use_pallas(a):
        from ambersim_tpu.ops.linalg_pallas import solve_pd_batched

        return solve_pd_batched(a, b), True
    return cho_solve_unrolled(cholesky_unrolled(a), b), True


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

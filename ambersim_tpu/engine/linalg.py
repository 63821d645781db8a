"""Batch-friendly small dense linear algebra.

XLA's generic cholesky/triangular_solve lowers to sequential loops that run
poorly for huge batches of tiny matrices (the simulation regime: nv ~ 10-40,
batch ~ 4096). These unrolled versions turn the factorization into nv
straight-line vectorized steps — each a full-batch VPU op — and are the
engine-wide replacements for jax.scipy.linalg.cholesky/cho_solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky(a: jax.Array) -> jax.Array:
    """Lower Cholesky of (..., n, n) SPD matrices, unrolled over n."""
    n = a.shape[-1]
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


def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given the lower Cholesky factor of A."""
    return solve_upper_t(l, solve_lower(l, b))


def solve_pd(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve SPD system A x = b."""
    return cho_solve(cholesky(a), b)

"""Unit tests for the in-kernel linalg helpers (ops/linalg_pallas.py).

_chol_columns/_solve_from_l are plain jnp column sweeps (the Mosaic kernels
call them on VMEM-resident arrays), so their math is testable directly on
CPU at sizes large enough to exercise the sublane-aligned block-restricted
rank-1 updates (n > 8) and the lower-triangle-only input contract the fused
Newton kernel relies on.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.ops.linalg_pallas import _chol_columns, _solve_from_l

N = 18  # > 2 sublane tiles: exercises the j0 = 8 and j0 = 16 update blocks
B = 4


def _random_spd(key, n, b):
    a = jax.random.normal(key, (b, n, n))
    spd = a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n)
    return jnp.moveaxis(spd, 0, -1)  # (n, n, B) batch-last kernel layout


def test_chol_columns_matches_numpy():
    a = _random_spd(jax.random.PRNGKey(0), N, B)
    l = _chol_columns(a, N)
    ref = np.linalg.cholesky(np.moveaxis(np.asarray(a), -1, 0))
    np.testing.assert_allclose(np.moveaxis(np.asarray(l), -1, 0), ref, rtol=1e-5, atol=1e-5)


def test_chol_columns_ignores_upper_triangle():
    """The fused Newton kernel assembles only the lower triangle of H; the
    sweep must never read above the diagonal."""
    a = _random_spd(jax.random.PRNGKey(1), N, B)
    tril = jnp.tril(jnp.ones((N, N)))[:, :, None]
    garbage = 1e6 * jax.random.normal(jax.random.PRNGKey(2), a.shape)
    a_low = a * tril + garbage * (1.0 - tril)
    l_full = _chol_columns(a, N)
    l_low = _chol_columns(a_low, N)
    np.testing.assert_allclose(np.asarray(l_low), np.asarray(l_full), rtol=1e-6, atol=1e-6)


def test_solve_from_l_matches_numpy():
    a = _random_spd(jax.random.PRNGKey(3), N, B)
    b = jax.random.normal(jax.random.PRNGKey(4), (N, B))
    l = _chol_columns(a, N)
    x = _solve_from_l(l, b, N)
    a_np = np.moveaxis(np.asarray(a), -1, 0)
    b_np = np.moveaxis(np.asarray(b), -1, 0)
    ref = np.stack([np.linalg.solve(a_np[i], b_np[i]) for i in range(B)])
    np.testing.assert_allclose(np.moveaxis(np.asarray(x), -1, 0), ref, rtol=1e-4, atol=1e-5)


def test_large_n_routes_to_native_blocked_path():
    """n > 64 dofs (e.g. 32 free bodies: nv=192) must route to XLA's native
    blocked cholesky/triangular_solve: the unrolled straight-line form takes
    minutes to compile at that size, and the Pallas kernel's (n, n, 128)
    VMEM windows overflow at n=192 (regression: clutter32 ladder rung)."""
    from ambersim_tpu.engine import linalg

    n, batch = 192, 4
    key = jax.random.PRNGKey(5)
    g = jax.random.normal(key, (batch, n, n))
    a = g @ jnp.swapaxes(g, -1, -2) + n * jnp.eye(n)
    b = jax.random.normal(jax.random.PRNGKey(6), (batch, n))

    l = jax.jit(jax.vmap(linalg.cholesky))(a)
    np.testing.assert_allclose(np.asarray(l), np.linalg.cholesky(np.asarray(a)), rtol=2e-4, atol=2e-4)
    x = jax.jit(jax.vmap(linalg.solve_pd))(a, b)
    ref = np.stack([np.linalg.solve(np.asarray(a)[i], np.asarray(b)[i]) for i in range(batch)])
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-4, atol=2e-4)
    # unbatched call (the set_constants path) takes the same native route
    x1 = jax.jit(linalg.solve_pd)(a[0], b[0])
    np.testing.assert_allclose(np.asarray(x1), ref[0], rtol=2e-4, atol=2e-4)


def test_bign_dispatch_matches_numpy():
    """n=192 (clutter-class nv) routes through the chunked lane-tile path on
    TPU and the native fallback elsewhere; either way the engine-facing
    entry points must stay exact (VERDICT r2 #5)."""
    from ambersim_tpu.engine import linalg

    rng = np.random.default_rng(3)
    n, b = 192, 9  # odd batch: exercises chunk padding
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    a = a @ np.swapaxes(a, -1, -2) + n * np.eye(n, dtype=np.float32)
    rhs = rng.normal(size=(b, n)).astype(np.float32)

    x = jax.jit(jax.vmap(linalg.solve_pd))(jnp.asarray(a), jnp.asarray(rhs))
    ref = np.linalg.solve(a.astype(np.float64), rhs[..., None].astype(np.float64))[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-4, atol=2e-4)

    l = jax.jit(jax.vmap(linalg.cholesky))(jnp.asarray(a))
    np.testing.assert_allclose(
        np.asarray(l), np.linalg.cholesky(a), rtol=2e-4, atol=2e-3
    )
    x2 = jax.jit(jax.vmap(linalg.cho_solve))(l, jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x2), ref, rtol=2e-4, atol=2e-4)

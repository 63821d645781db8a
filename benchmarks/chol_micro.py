"""In-graph microbenchmark of the batched Cholesky/solve kernels at
clutter-class shapes (nv=192, batch 256) — the large-nv lever (VERDICT r3
#2). Chained scan keeps the measurement in-graph (per-call dispatch over the
tunneled TPU inflates isolated timings 10-100x).

Usage: python benchmarks/chol_micro.py [N=192] [B=256] [REPS=20]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 192))
B = int(os.environ.get("B", 256))
REPS = int(os.environ.get("REPS", 20))


def _sync(x):
    return float(jnp.ravel(x)[0])


def main():
    from ambersim_tpu.ops import linalg_pallas as lp

    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (B, N, N))
    a = g @ jnp.swapaxes(g, -1, -2) + N * jnp.eye(N)
    b = jax.random.normal(jax.random.PRNGKey(1), (B, N))

    def chain(fn):
        @jax.jit
        def run(a, b):
            def body(carry, _):
                x = fn(a + 1e-6 * carry[:, :, None] * jnp.eye(N), b + 1e-6 * carry)
                return x, None

            out, _ = jax.lax.scan(body, b, None, length=REPS)
            return out

        return run

    variants = {
        "solve_pd_batched": lambda A, rhs: lp.solve_pd_batched(A, rhs),
        "cholesky_only": lambda A, rhs: lp.cholesky_batched(A)[:, :, 0] + rhs * 0,
        "chol+2subst": lambda A, rhs: lp.cho_solve_batched(lp.cholesky_batched(A), rhs),
    }
    if hasattr(lp, "solve_pd_batched_panel"):
        variants["solve_pd_panel"] = lambda A, rhs: lp.solve_pd_batched_panel(A, rhs)
    for name, fn in variants.items():
        try:
            run = chain(fn)
            out = run(a, b)
            _sync(out)
            t0 = time.perf_counter()
            out = run(a, b)
            _sync(out)
            dt = (time.perf_counter() - t0) / REPS
            print(f"{name:24s} {1e3 * dt:8.2f} ms/call  (B={B}, n={N})", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)

    # XLA-native reference
    def xla_solve(A, rhs):
        L = jnp.linalg.cholesky(A)
        y = jax.lax.linalg.triangular_solve(L, rhs[..., None], left_side=True, lower=True)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True)
        return x[..., 0]

    run = chain(xla_solve)
    out = run(a, b)
    _sync(out)
    t0 = time.perf_counter()
    out = run(a, b)
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'xla_native':24s} {1e3 * dt:8.2f} ms/call  (B={B}, n={N})", flush=True)


if __name__ == "__main__":
    main()

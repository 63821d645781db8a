"""Microbenchmark of the fused Newton Pallas kernel on quadruped shapes.

Times the kernel alone (real constraint arrays captured from one bench step)
across an (iterations, ls_iterations) grid and fits
    time = fixed + iters * (per_iter + ls * per_ls)
to attribute the serial-latency budget: `fixed` is I/O + warmstart cost
evaluation, `per_iter` is Hessian assembly + Cholesky + triangular solves,
`per_ls` is one exact-line-search step. Run on the real chip; sync is by
value readback (block_until_ready is unreliable over the axon tunnel).

Usage: python benchmarks/newton_micro.py [BENCH_NUM_ENVS=4096]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
REPS = int(os.environ.get("REPS", 20))


def _sync(x) -> float:
    return float(jnp.ravel(x)[0])


def capture_arrays():
    """One forward pass on the quadruped batch -> the Newton kernel operands."""
    import importlib

    # engine/__init__ rebinds the `forward` attribute to the function
    fwd_mod = importlib.import_module("ambersim_tpu.engine.forward")
    from ambersim_tpu.engine import make_data, smooth
    from ambersim_tpu.utils.io_utils import load_model_from_file

    m = load_model_from_file("models/quadruped/quadruped.xml")
    d0 = make_data(m)
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_ENVS)
    batch = jax.vmap(
        lambda k: d0.replace(qpos=d0.qpos.at[7:].add(0.05 * jax.random.normal(k, (m.nu,))))
    )(keys)

    @jax.jit
    def upto_solver(b):
        def one(dd):
            dd = fwd_mod.fwd_position(m, dd)
            dd = smooth.fwd_velocity(m, dd)
            dd = smooth.fwd_actuation(m, dd)
            return smooth.fwd_acceleration(m, dd)

        return jax.vmap(one)(b)

    b = upto_solver(batch)
    _sync(b.qpos)
    return m, b


def main():
    from ambersim_tpu.ops.newton_pallas import newton_solve_batched

    m, b = capture_arrays()
    s = m.skel
    ne, nf = int(s.ne), int(s.nf)
    tol = jnp.asarray(m.opt.tolerance * s.nv * max(float(np.sum(m.body_mass)), 1.0), b.qpos.dtype)

    J, qM = b.efc_J, b.qM
    aref, D = b.efc_aref, b.efc_D
    fl = b.efc_frictionloss
    act = b.efc_active.astype(b.qpos.dtype)
    a_s = b.qacc_smooth
    ws = b.qacc_warmstart

    print(f"shapes: J {J.shape}, qM {qM.shape}, batch {NUM_ENVS}")

    def make_fn(iters, ls):
        fn = jax.jit(
            lambda J, qM, aref, D, fl, act, a_s, ws: newton_solve_batched(
                J, qM, aref, D, fl, act, a_s, ws, tol,
                ne=ne, nf=nf, iterations=iters, ls_iterations=ls, use_ws=True,
            )[0]
        )
        _sync(fn(J, qM, aref, D, fl, act, a_s, ws))  # compile + warm
        return fn

    # DMA-only control: same operands/blocks, compute is one reduction of J.
    # Separates the pipeline's DMA floor from the Newton compute.
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dma_only(Jb, qMb, arefb, Db, flb, actb, a_sb, wsb):
        b_, nefc_, n_ = Jb.shape
        dtype = Jb.dtype
        tile = 256
        bp = -(-b_ // tile) * tile

        def bpad(x):
            xt = jnp.moveaxis(x, 0, -1)
            pad = [(0, 0)] * (xt.ndim - 1) + [(0, bp - b_)]
            return jnp.pad(xt, pad)

        def kern(J_ref, M_ref, aref_ref, D_ref, fl_ref, act_ref, as_ref, ws_ref, out_ref):
            out_ref[...] = (
                (J_ref[...]).sum(axis=0)
                + (M_ref[...]).sum(axis=0)
                + aref_ref[...].sum(axis=0)[None, :]
                + D_ref[...].sum(axis=0)[None, :]
                + fl_ref[...].sum(axis=0)[None, :]
                + act_ref[...].sum(axis=0)[None, :]
                + as_ref[...]
                + ws_ref[...]
            )

        args = [bpad(Jb), bpad(qMb), bpad(arefb), bpad(Db), bpad(flb), bpad(actb), bpad(a_sb), bpad(wsb)]
        specs = [
            pl.BlockSpec((nefc_, n_, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_, n_, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nefc_, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nefc_, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nefc_, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nefc_, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        out = pl.pallas_call(
            kern,
            grid=(bp // tile,),
            in_specs=specs,
            out_specs=pl.BlockSpec((n_, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_, bp), dtype),
        )(*args)
        return jnp.moveaxis(out[:, :b_], -1, 0)

    grid = [(3, 6), (3, 1), (1, 6), (1, 1), (6, 6)]
    fns = {k: make_fn(*k) for k in grid}
    dma_fn = jax.jit(dma_only)
    _sync(dma_fn(J, qM, aref, D, fl, act, a_s, ws))
    fns["dma"] = lambda J, qM, aref, D, fl, act, a_s, ws: dma_fn(J, qM, aref, D, fl, act, a_s, ws)
    grid = grid + ["dma"]
    times = {k: [] for k in grid}
    # interleaved rounds, min-of-rounds: tunnel noise is additive and bursty
    for rnd in range(5):
        for k in grid:
            fn = fns[k]
            t0 = time.perf_counter()
            for r in range(REPS):
                out = fn(J, qM, aref + 1e-9 * (r + REPS * rnd), D, fl, act, a_s, ws)
            _sync(out)
            times[k].append((time.perf_counter() - t0) / REPS)
    times = {k: min(v) for k, v in times.items()}
    for k in grid:
        name = f"iters={k[0]} ls={k[1]}" if isinstance(k, tuple) else k
        print(f"{name:16s}: {times[k]*1e3:8.3f} ms")

    fit_keys = [k for k in grid if isinstance(k, tuple)]
    # least squares fit: t = fixed + iters*per_iter + iters*ls*per_ls
    A = np.array([[1.0, it, it * ls] for it, ls in fit_keys])
    y = np.array([times[k] for k in fit_keys])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    fixed, per_iter, per_ls = coef
    print(f"\nfit (ms): fixed={fixed*1e3:.3f}  per_newton_iter={per_iter*1e3:.3f}  "
          f"per_ls_step={per_ls*1e3:.3f}")
    print(f"model at (3, 6): {(fixed + 3*per_iter + 18*per_ls)*1e3:.3f} ms  "
          f"measured {times[(3, 6)]*1e3:.3f} ms   dma floor {times['dma']*1e3:.3f} ms")


if __name__ == "__main__":
    main()

"""Predictive-sampling grasp synthesis on the mesh-collision hand.

End-to-end demo of the convex pipeline + trajopt stack: the Barrett-class
hand with CoACD-decomposed collision meshes closes around a free convex
object, with the control sequence chosen by vmapped predictive sampling
(sample-0-is-guess, ctrlrange clipping — the reference's
trajopt/shooting.py semantics) under a cost that drives the fingers closed
while keeping the object in the palm channel.

Run: PYTHONPATH=. python examples/trajopt/ex_hand_grasp.py
"""


# Allow running from a source checkout without pip install.
import os as _os, sys as _sys

_d = _os.path.dirname(_os.path.abspath(__file__))
while _d != "/" and not _os.path.isdir(_os.path.join(_d, "ambersim_tpu")):
    _d = _os.path.dirname(_d)
_sys.path.insert(0, _d)
import time

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu import ROOT
from ambersim_tpu.engine import make_data
from ambersim_tpu.trajopt import (
    StaticGoalQuadraticCost,
    VanillaPredictiveSampler,
    VanillaPredictiveSamplerParams,
)
from ambersim_tpu.utils.io_utils import load_model_from_file

if __name__ == "__main__":
    model = load_model_from_file(f"{ROOT}/models/hand/grasp_scene.xml", iterations=2, ls_iterations=6)
    nx = model.nq + model.nv

    # goal: proximal finger joints closed (~1.2 rad), object resting in the
    # palm channel at z ~ 0.11, everything at rest
    names = list(model.skel.jnt_names)
    xg = np.zeros(nx)
    for j, q0 in zip(("f1_prox", "f2_prox", "f3_prox"), (1.2, 1.2, 1.2)):
        xg[model.skel.jnt_qposadr[names.index(j)]] = q0
    obj_z = model.skel.jnt_qposadr[names.index("object")] + 2
    xg[obj_z] = 0.11
    Q = np.eye(nx) * 0.05
    Q[obj_z, obj_z] = 20.0  # keep the object in the palm while closing
    cost = StaticGoalQuadraticCost(
        Q=jnp.asarray(Q), Qf=jnp.asarray(10.0 * Q), R=0.0005 * jnp.eye(model.nu),
        xg=jnp.asarray(xg),
    )
    ps = VanillaPredictiveSampler(model=model, cost_function=cost, nsamples=64, stdev=0.25)

    d0 = make_data(model)
    x0 = jnp.concatenate([d0.qpos, d0.qvel])
    params = VanillaPredictiveSamplerParams(
        x0=x0, us_guess=jnp.tile(jnp.array([0.0, 0.8, 0.8, 0.8]), (12, 1)), rng=jax.random.PRNGKey(0)
    )
    opt = jax.jit(ps.optimize)
    t0 = time.time()
    xs, us = opt(params)
    xs.block_until_ready()
    print(f"jit+solve: {time.time() - t0:.1f}s")
    for _ in range(3):  # receding-horizon refinement
        params = params.replace(us_guess=us, rng=jax.random.split(params.rng)[0])
        xs, us = opt(params)
    t1 = time.time()
    print(f"3 warm solves: {t1 - t0:.2f}s")

    q = np.asarray(xs[-1, : model.nq])
    print("final proximal joints:", [round(float(q[model.skel.jnt_qposadr[names.index(j)]]), 3)
                                     for j in ("f1_prox", "f2_prox", "f3_prox")])
    print("object height:", round(float(q[obj_z]), 3), "(target 0.11 — held in the palm)")

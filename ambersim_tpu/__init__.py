"""ambersim_tpu: a TPU-native rigid-body simulation + RL/trajopt framework.

A from-scratch reimplementation of the capabilities of Caltech-AMBER/ambersim
(reference: /root/reference) designed TPU-first: the physics pipeline
(FK, CRBA, RNEA, collision, constraint solve, integration) is pure JAX with
Pallas kernels on the hot paths; scaling is expressed via jax.sharding meshes.

The reference package exposes a ``ROOT`` constant used for repo-relative model
paths (reference: ambersim/__init__.py:8); we do the same.
"""

from pathlib import Path

ROOT = str(Path(__file__).resolve().parent)

__version__ = "0.1.0"

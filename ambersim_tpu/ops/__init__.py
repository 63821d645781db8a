"""Pallas TPU kernels for physics hot paths.

Kernels land here once the pure-jnp pipeline establishes correctness
(SURVEY.md §7 step 5: batched narrowphase + Newton solver first).
"""

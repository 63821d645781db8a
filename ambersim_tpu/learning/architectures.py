"""Neural network architectures (reference: ambersim/learning/architectures.py:7-34).

MLP is deliberately pickle-able (module-level class, simple attrs) because the
checkpoint scheme pickles the network wrapper itself
(reference: ambersim/rl/helpers.py:10-14, examples ex_save_and_load.py:86-87).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen


def relu(x: jax.Array) -> jax.Array:
    """Module-level relu so MLP instances pickle by reference."""
    return jnp.where(x > 0, x, 0.0)


def lecun_uniform(key, shape, dtype=jnp.float32):
    """Module-level kernel init so MLP instances pickle by reference."""
    return jax.nn.initializers.lecun_uniform()(key, shape, dtype)


class MLP(linen.Module):
    """Multi-layer perceptron with relu hidden activations.

    Attributes:
      layer_sizes: sizes of all layers, including the output layer.
      activate_final: whether to apply activation after the final layer.
      bias: whether layers use bias terms.
    """

    layer_sizes: Sequence[int]
    activation: Callable[[jax.Array], jax.Array] = relu
    kernel_init: Callable = lecun_uniform
    activate_final: bool = False
    bias: bool = True

    @linen.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, size in enumerate(self.layer_sizes):
            x = linen.Dense(size, name=f"hidden_{i}", kernel_init=self.kernel_init, use_bias=self.bias)(x)
            if i != len(self.layer_sizes) - 1 or self.activate_final:
                x = self.activation(x)
        return x

"""Parameter initializers matching the reference's PyTorch defaults.

* Graph-conv weights: Xavier-uniform with ReLU gain sqrt(2)
  (reference ``models.py:134-146``).
* Prediction-head linear layers: PyTorch ``nn.Linear`` default —
  Kaiming-uniform(a=sqrt(5)) on the weight and U(-1/sqrt(fan_in),
  1/sqrt(fan_in)) on the bias, both of which reduce to bound
  1/sqrt(fan_in) (reference ``models.py:193-207`` uses stock
  ``nn.Linear``).

Matching init distributions keeps training-dynamics parity so syn1
accuracy/AUC comparisons against the reference are apples-to-apples.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_relu_uniform(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = sqrt(2) * sqrt(6 / (fan_in + fan_out))."""
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(2.0) * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default weight init (bound = 1/sqrt(fan_in)).

    Note: flax stores kernels as [fan_in, fan_out]."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init

"""Initializers matching the reference's post-construction init pass.

The reference re-initializes every Linear/LSTM weight with
torch.nn.init.xavier_uniform_ and zeroes biases after building the model
(reference models.py:52, model/utils.py:8-33), which also overwrites the
GAT layers' gain-1.414 init (GraphNN.py:90-92) and MFB's normal(0, 0.01)
init (fusions.py:410-413, init_weight.py:4-14). So the effective scheme is
plain xavier_uniform everywhere; fans are computed on the torch (out, in)
weight shape of each logical Linear, which these helpers make explicit for
params whose JAX array shape differs (per-head GAT weights, LSTM mats).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform_fans(fan_in: int, fan_out: int):
    """xavier_uniform with explicit fans, independent of the param's shape."""
    bound = math.sqrt(6.0 / (fan_in + fan_out))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init

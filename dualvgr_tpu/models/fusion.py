"""MFB bilinear pooling (reference model/fusions/fusions.py:382-453).

Used as the appearance x motion fusion at the end of the DualVGR unit stack
(reference models.py:109,171) with input_dims=[768,768], output_dim=768,
mm_dim=256, factor=2, ELU in/out, no normalization, no dropout.

The reference's normal(0, 0.01) init (fusions.py:410-413) is overwritten by
the model-wide xavier_uniform pass (models.py:52), so xavier is correct here.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dualvgr_tpu.ops.precision import SDense, stream_dtype_of


class MFB(nn.Module):
    """Multimodal Factorized Bilinear pooling."""

    output_dim: int = 768
    mm_dim: int = 256
    factor: int = 2
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x0, x1):
        """x0, x1: (..., D) -> (..., output_dim)."""
        sd = stream_dtype_of(self.compute_dtype)
        z0 = SDense(self.mm_dim * self.factor, stream=sd, name="linear0")(x0)
        z1 = SDense(self.mm_dim * self.factor, stream=sd, name="linear1")(x1)
        z = nn.elu(z0) * nn.elu(z1)
        z = z.reshape(z.shape[:-1] + (self.mm_dim, self.factor)).sum(-1)
        z = SDense(self.output_dim, stream=sd, name="linear_out")(z)
        return nn.elu(z)

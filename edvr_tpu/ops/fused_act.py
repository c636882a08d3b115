"""Fused bias + leaky-ReLU + scale.

Behavioral equivalent of the reference's fused_bias_act CUDA extension
(reference: basicsr/models/ops/fused_act/fused_act.py:66-81,
src/fused_bias_act_kernel.cu:37-48): ``y = leaky_relu(x + b, slope) *
scale`` with per-channel bias, slope 0.2 and scale sqrt(2) for
StyleGAN2. In JAX this is a single fused XLA elementwise op and its
double-backward (needed for R1/path regularization) comes from
autodiff — no custom kernel required for speed-of-light here, since
the op is bandwidth-bound and XLA fuses it into neighbors.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2)) -> jnp.ndarray:
    """x: (..., c) NHWC; bias: (c,) or None."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * negative_slope) * scale

"""Normalization ops: layernorm and inference-mode batchnorm folding.

Replaces the reference's ggml chains:
* layernorm = ``ggml_norm`` * gamma + beta with broadcast ``ggml_repeat``
  (/root/reference/mobilevit/main.cpp:1002-1019)
* batchnorm expanded as ``(x - mu)/sqrt(var + 1e-5) * gamma + beta`` via a
  4-op broadcast chain (/root/reference/mobilevit/main.cpp:809-846).

Here BN statistics are folded once at load time into a per-channel
``scale``/``bias`` pair (fold_batchnorm), so at run time it is a single fused
multiply-add that XLA merges into the producing convolution.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def layer_norm(x, gamma, beta, *, eps: float = 1e-5, axis: int = -1):
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * gamma + beta


class FoldedBN(NamedTuple):
    """Per-channel affine equivalent to inference BatchNorm."""

    scale: jax.Array  # gamma / sqrt(var + eps)
    bias: jax.Array   # beta - mean * scale


def fold_batchnorm(gamma, beta, moving_mean, moving_variance, *, eps: float = 1e-5) -> FoldedBN:
    scale = gamma * jax.lax.rsqrt(moving_variance + eps)
    return FoldedBN(scale=scale, bias=beta - moving_mean * scale)


def apply_folded_bn(x, bn: FoldedBN):
    """x: (..., C) NHWC-style channel-last."""
    return x * bn.scale + bn.bias

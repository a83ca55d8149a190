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
    """Statistics always in f32 (bf16 mean/var over a 144-640-wide axis loses
    bits); result is cast back to x.dtype, so bf16 activations stay bf16.
    The f32 intermediates live only inside the fused elementwise kernel."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axis, keepdims=True)
    var = jnp.var(x32, axis=axis, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


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

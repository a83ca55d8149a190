"""2-D convolutions, NHWC/HWIO, with folded inference BatchNorm + activation.

Replaces ggml's ``ggml_conv_2d`` / ``ggml_conv_depthwise_2d`` path
(/root/reference/mobilevit/main.cpp:771-852). Layout is standardized once:
activations NHWC, kernels HWIO — the TF export order, so weights from the
reference's ``weight.ggml`` format load with **zero** runtime permutes
(the reference instead permutes OIHW->ggml layout at every graph build,
main.cpp:790-806; SURVEY.md §7 "Hard parts" calls out fixing this).

Padding follows the reference / HF TFMobileViT: symmetric explicit padding
``(k-1)//2`` on both sides (HF uses ZeroPadding2D then VALID conv — this is
NOT TF "SAME", which pads asymmetrically for stride 2).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ggml_experiments_tpu.ops.activations import get_activation
from ggml_experiments_tpu.ops.norm import FoldedBN

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: Optional[int] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """x: (B, H, W, Cin), kernel: (KH, KW, Cin//groups, Cout) -> (B, H', W', Cout).

    ``compute_dtype=float32`` forces full-precision MXU passes (on TPU the
    default conv silently runs one bf16 pass) with f32 results. ``bfloat16``
    is the fast path AND the result storage dtype — the MXU accumulates in
    f32 internally, but the materialized activation is bf16, halving the HBM
    traffic that bounds batched MobileViT inference (see PERF.md).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if padding is None:
        padding = (kh - 1) // 2 * dilation
    precision = (
        jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if compute_dtype == jnp.float32 else compute_dtype,
        precision=precision,
    )


def depthwise_conv2d(
    x, kernel, *, stride: int = 1, dilation: int = 1, padding=None, compute_dtype=jnp.float32
):
    """kernel: (KH, KW, 1, C) — grouped conv with groups == C."""
    c = x.shape[-1]
    return conv2d(
        x, kernel, stride=stride, dilation=dilation, groups=c, padding=padding,
        compute_dtype=compute_dtype,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpaceToDepthStem:
    """Stride-2 3x3 stem conv rewritten as space-to-depth + stride-1 2x2 conv.

    The classic TPU trick for RGB stems: a 3-input-channel conv wastes the
    128-deep MXU; folding 2x2 pixel blocks into channels (3 -> 12) and
    rescattering the kernel makes the contraction 4x deeper with identical
    arithmetic. Built from a standard stem by :func:`space_to_depth_stem`.

    Input (B, H, W, 3) -> output (B, H/2, W/2, OC) — bit-compatible (up to fp
    reassociation) with ``ConvBNAct(kernel_3x3, stride=2)``.
    """

    kernel: jax.Array  # (2, 2, 4*Cin, OC), rescattered from (3, 3, Cin, OC)
    bn: Optional[FoldedBN] = None
    activation: str = dataclasses.field(default="silu", metadata=dict(static=True))
    store: str = dataclasses.field(default="none", metadata=dict(static=True))

    def __call__(self, x: jax.Array, *, compute_dtype=jnp.float32) -> jax.Array:
        b, h, w, c = x.shape
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        y = jax.lax.conv_general_dilated(
            x2.astype(compute_dtype),
            self.kernel.astype(compute_dtype),
            window_strides=(1, 1),
            padding=[(1, 0), (1, 0)],   # original symmetric pad 1 maps to top/left
            dimension_numbers=_DN,
            preferred_element_type=jnp.float32 if compute_dtype == jnp.float32 else compute_dtype,
            precision=precision,
        )
        if self.bn is not None:
            y = y * self.bn.scale.astype(y.dtype) + self.bn.bias.astype(y.dtype)
        return apply_store(get_activation(self.activation)(y), self.store)


def space_to_depth_stem(stem: "ConvBNAct") -> SpaceToDepthStem:
    """Convert a stride-2 3x3 ConvBNAct into the space-to-depth form."""
    k = stem.kernel
    kh, kw, cin, oc = k.shape
    if (kh, kw) != (3, 3) or stem.stride != 2 or stem.depthwise:
        raise ValueError("space_to_depth_stem expects a stride-2 3x3 dense conv")
    # K2[P, Q, (a*2+b)*Cin + c, o] = K[2P+a-1, 2Q+b-1, c, o] (zero out of range):
    # output pixel (i,j) reads original rows 2i-1..2i+1 = s2d blocks i-1 (offset
    # a=1) and i (a=0,1); with left/top padding 1 the 2x2 block conv covers them.
    k2 = jnp.zeros((2, 2, 4 * cin, oc), k.dtype)
    for p in range(2):
        for q in range(2):
            for a in range(2):
                for bq in range(2):
                    di, dj = 2 * p + a - 1, 2 * q + bq - 1
                    if 0 <= di < 3 and 0 <= dj < 3:
                        ch = (a * 2 + bq) * cin
                        k2 = k2.at[p, q, ch : ch + cin].set(k[di, dj])
    return SpaceToDepthStem(kernel=k2, bn=stem.bn, activation=stem.activation,
                            store=stem.store)


# Activation *storage* dtypes (distinct from compute dtype): the conv stages
# of batched MobileViT inference are bound by the bytes of the materialized
# boundary activations, not FLOPs. Storing boundaries below bf16 halves those
# bytes; the consumer casts back to the compute dtype inside its own fusion.
# Measured on v5e (tools/probe_act_storage.py, layer_2 inverted-residual
# chain, B=128): f8_e5m2 1.40x over bf16 (e5m2 is bf16 with the mantissa
# truncated to 2 bits — the convert is close to free), int8 1.15x, f8_e4m3
# 1.02x (its convert lowers poorly). e5m2 keeps bf16's exponent range, so
# no scaling is needed; the cost is activation rounding noise (measured in
# tests/test_act_storage.py and the eval CLI).
_STORE_DTYPES = {
    "none": None,
    "bfloat16": jnp.bfloat16,
    "f8_e5m2": jnp.float8_e5m2,
    "f8_e4m3": jnp.float8_e4m3fn,
}


def apply_store(y: jax.Array, store: str) -> jax.Array:
    """Materialize ``y`` at the storage dtype. f32 activations are left
    alone — the f32 compute path is the numerics/parity oracle, and storage
    policies only apply to the bf16 fast path (same gating convention as the
    fused kernel routes)."""
    dt = _STORE_DTYPES[store]
    if dt is None or y.dtype in (dt, jnp.float32):
        return y
    return y.astype(dt)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConvBNAct:
    """Conv (+ optional folded BN) (+ optional activation) parameter bundle.

    Mirrors ``mobilevit_conv_layer`` (/root/reference/mobilevit/main.cpp:56-73)
    but with BN pre-folded to scale/bias at load. ``activation`` is static
    pytree metadata so the module jits cleanly. ``store`` picks the dtype the
    output activation materializes as in HBM (see _STORE_DTYPES above).
    """

    kernel: jax.Array  # (KH, KW, Cin//groups, Cout)
    bn: Optional[FoldedBN] = None
    activation: str = dataclasses.field(default="silu", metadata=dict(static=True))
    stride: int = dataclasses.field(default=1, metadata=dict(static=True))
    depthwise: bool = dataclasses.field(default=False, metadata=dict(static=True))
    dilation: int = dataclasses.field(default=1, metadata=dict(static=True))
    store: str = dataclasses.field(default="none", metadata=dict(static=True))

    def __call__(self, x: jax.Array, *, compute_dtype=jnp.float32) -> jax.Array:
        if self.depthwise:
            y = depthwise_conv2d(
                x, self.kernel, stride=self.stride, dilation=self.dilation,
                compute_dtype=compute_dtype,
            )
        else:
            y = conv2d(
                x, self.kernel, stride=self.stride, dilation=self.dilation,
                compute_dtype=compute_dtype,
            )
        if self.bn is not None:
            y = y * self.bn.scale.astype(y.dtype) + self.bn.bias.astype(y.dtype)
        return apply_store(get_activation(self.activation)(y), self.store)

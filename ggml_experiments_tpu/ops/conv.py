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
    default conv silently runs one bf16 pass); ``bfloat16`` is the explicit
    fast path. Accumulation is always f32.
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
        preferred_element_type=jnp.float32,
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
class ConvBNAct:
    """Conv (+ optional folded BN) (+ optional activation) parameter bundle.

    Mirrors ``mobilevit_conv_layer`` (/root/reference/mobilevit/main.cpp:56-73)
    but with BN pre-folded to scale/bias at load. ``activation`` is static
    pytree metadata so the module jits cleanly.
    """

    kernel: jax.Array  # (KH, KW, Cin//groups, Cout)
    bn: Optional[FoldedBN] = None
    activation: str = dataclasses.field(default="silu", metadata=dict(static=True))
    stride: int = dataclasses.field(default=1, metadata=dict(static=True))
    depthwise: bool = dataclasses.field(default=False, metadata=dict(static=True))
    dilation: int = dataclasses.field(default=1, metadata=dict(static=True))

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
            y = y * self.bn.scale + self.bn.bias
        return get_activation(self.activation)(y)

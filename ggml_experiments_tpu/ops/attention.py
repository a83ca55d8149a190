"""Multi-head self-attention over patch tokens (quantization-aware).

Replaces the reference transformer-layer attention
(/root/reference/mobilevit/main.cpp:988-1108): Q/K/V/output projections run
through :func:`~ggml_experiments_tpu.ops.linear.linear` so they accept either
float or QTensor weights (fused dequant+matmul on TPU); the score/softmax/
context chain is left to XLA, which fuses it onto the MXU/VPU — no
hand-scheduled ``ggml_permute``/``ggml_cont`` juggling.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ggml_experiments_tpu.ops.linear import Weight, linear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AttentionParams:
    wq: Weight
    bq: Optional[jax.Array]
    wk: Weight
    bk: Optional[jax.Array]
    wv: Weight
    bv: Optional[jax.Array]
    wo: Weight
    bo: Optional[jax.Array]
    num_heads: int = dataclasses.field(default=4, metadata=dict(static=True))
    # Route the score/softmax/context chain through the fused Pallas kernel
    # (ops/flash_attention.py) instead of XLA einsums. The serving
    # configuration: at batch the (L, L) score tensors dominate attention
    # HBM traffic and the kernel keeps them in VMEM.
    flash: bool = dataclasses.field(default=False, metadata=dict(static=True))


def multi_head_attention(
    p: AttentionParams, x: jax.Array, *, compute_dtype=jnp.float32
) -> jax.Array:
    """x: (..., L, C) -> (..., L, C). Full (dense) self-attention, no mask.

    The head split is a pure reshape (..., L, H, dh) with the head axis fed
    to the einsums *in place* — no (..., H, L, dh) transpose is ever
    materialized. The classic split-heads swapaxes costs real HBM time here
    (measured 1.08 -> 0.83 ms per layer-core at the L=256 stage, B=128):
    dot_general handles the mid-position batch dim natively, so the explicit
    copy the reference does with ggml_permute+cont (main.cpp:975-986) — and
    that a naive JAX port replicates with swapaxes — is pure waste.
    """
    num_heads = p.num_heads
    cd = dict(compute_dtype=compute_dtype)
    precision = (
        jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    # bf16 compute stores the (L, L) score/prob tensors in bf16 too — at
    # B=128 the L=256 stage's scores are the single largest activation in the
    # model (B*P*H*L*L), so their storage dtype dominates attention HBM time.
    # Softmax subtracts the row max, so bf16 range is a non-issue; the
    # accumulation error over L<=256 terms sits far inside quantization noise.
    acc = jnp.float32 if compute_dtype == jnp.float32 else compute_dtype

    def heads(t):
        *lead, l, c = t.shape
        return t.reshape(*lead, l, num_heads, c // num_heads)

    if p.flash and x.shape[-2] % 8 == 0:
        from ggml_experiments_tpu.ops.flash_attention import flash_mha

        ctx = flash_mha(
            linear(x, p.wq, p.bq, **cd),
            linear(x, p.wk, p.bk, **cd),
            linear(x, p.wv, p.bv, **cd),
            num_heads,
            compute_dtype=compute_dtype,
        )
        return linear(ctx, p.wo, p.bo, **cd)

    q = heads(linear(x, p.wq, p.bq, **cd))  # (..., L, H, dh)
    k = heads(linear(x, p.wk, p.bk, **cd))
    v = heads(linear(x, p.wv, p.bv, **cd))
    dh = q.shape[-1]
    scores = (
        jnp.einsum("...lhd,...mhd->...hlm", q, k, precision=precision,
                   preferred_element_type=acc)
        / math.sqrt(dh)
    )
    probs = jax.nn.softmax(scores, axis=-1).astype(acc)
    ctx = jnp.einsum("...hlm,...mhd->...lhd", probs, v, precision=precision,
                     preferred_element_type=acc)
    *lead, l, c = x.shape
    return linear(ctx.reshape(*lead, l, c), p.wo, p.bo, **cd)

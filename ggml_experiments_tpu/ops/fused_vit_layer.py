"""EXPERIMENTAL: whole MobileViT transformer layer as one Pallas kernel.

Motivation (docs/STATUS.md): the transformer half of MobileViT runs ~5 TF/s
under XLA because its shapes (hidden 144-240, head_dim 36-60, 16-256 tokens)
under-fill the MXU and every sub-op round-trips HBM. This kernel keeps one
sequence's activations resident in VMEM for the entire layer:
LN -> per-head QKV -> scores/softmax/context -> output proj -> residual ->
LN -> SiLU MLP -> residual, with the grid iterating sequences.

Weights are passed per-head stacked (H, C, dh) so no unaligned lane slicing
happens in-kernel (Mosaic pads the dh lanes physically either way).

Status: correctness-verified against TransformerLayerParams (interpret mode)
but NOT wired into the model: measured on v5e (S=512, L=256, C=144, bf16,
pipelined) it runs 9.9 ms/layer vs 8.5 ms for the XLA composable layer —
Mosaic's codegen for these small per-sequence matmuls does not beat XLA's
batched einsums, mirroring the fused-GRU-kernel result at small batch.
Kept as a baseline for future layout experiments (e.g. batching sequences
per grid step, head-merged score matmuls).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_experiments_tpu.quant.pallas_kernels import _default_interpret
from ggml_experiments_tpu.quant.qtensor import QTensor


def _dense(w):
    return w.dequantize() if isinstance(w, QTensor) else w


def _kernel(
    x_ref,        # (1, L, C)
    ln1_ref,      # (2, C) gamma/beta
    wqkv_ref,     # (3, H, C, dh)
    bqkv_ref,     # (3, H, 1, dh)
    wo_ref,       # (H, dh, C)
    bo_ref,       # (1, C)
    ln2_ref,      # (2, C)
    w1_ref,       # (C, F)
    b1_ref,       # (1, F)
    w2_ref,       # (F, C)
    b2_ref,       # (1, C)
    out_ref,      # (1, L, C)
    *,
    num_heads: int,
    eps: float,
    compute_dtype,
):
    cd = compute_dtype
    x = x_ref[0]                                   # (L, C)
    dh = wqkv_ref.shape[-1]
    scale = 1.0 / math.sqrt(dh)

    def ln(v, ref):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean((v - mu) * (v - mu), axis=-1, keepdims=True)
        return ((v - mu) * jax.lax.rsqrt(var + eps)) * ref[0:1, :] + ref[1:2, :]

    xn = ln(x, ln1_ref).astype(cd)
    attn = jnp.zeros_like(x)
    for h in range(num_heads):
        q = jnp.dot(xn, wqkv_ref[0, h].astype(cd),
                    preferred_element_type=jnp.float32) + bqkv_ref[0, h]
        k = jnp.dot(xn, wqkv_ref[1, h].astype(cd),
                    preferred_element_type=jnp.float32) + bqkv_ref[1, h]
        v = jnp.dot(xn, wqkv_ref[2, h].astype(cd),
                    preferred_element_type=jnp.float32) + bqkv_ref[2, h]
        scores = jax.lax.dot_general(
            q.astype(cd), k.astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                   # (L, L)
        probs = jax.nn.softmax(scores, axis=-1).astype(cd)
        ctx = jnp.dot(probs, v.astype(cd), preferred_element_type=jnp.float32)
        attn += jnp.dot(ctx.astype(cd), wo_ref[h].astype(cd),
                        preferred_element_type=jnp.float32)
    x = x + attn + bo_ref[0:1, :]

    yn = ln(x, ln2_ref).astype(cd)
    y = jax.nn.silu(
        jnp.dot(yn, w1_ref[:].astype(cd), preferred_element_type=jnp.float32)
        + b1_ref[0:1, :]
    )
    y = jnp.dot(y.astype(cd), w2_ref[:].astype(cd),
                preferred_element_type=jnp.float32) + b2_ref[0:1, :]
    out_ref[0] = x + y


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "compute_dtype_name"))
def _fused_layer_jit(
    x, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2,
    *, num_heads: int, eps: float, compute_dtype_name: str,
):
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    s, l, c = x.shape
    kern = functools.partial(_kernel, num_heads=num_heads, eps=eps, compute_dtype=cd)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem,
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, l, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_default_interpret(),
    )(x, ln1, wqkv, bqkv, wo, bo, ln2, w1, b1, w2, b2)


def fused_transformer_layer(p, x: jax.Array, *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Run TransformerLayerParams ``p`` over ``x`` (..., L, C) in one kernel.

    Quantized weights are dequantized host-side once per call (they are tiny);
    leading dims are flattened into the sequence grid.
    """
    *lead, l, c = x.shape
    s = 1
    for d in lead:
        s *= d
    x2 = x.reshape(s, l, c).astype(jnp.float32)

    att = p.attention
    h = att.num_heads
    dh = c // h

    def heads(w):  # (C, C) -> (H, C, dh)
        return _dense(w).reshape(c, h, dh).transpose(1, 0, 2)

    wqkv = jnp.stack([heads(att.wq), heads(att.wk), heads(att.wv)])   # (3, H, C, dh)
    bqkv = jnp.stack([
        att.bq.reshape(h, 1, dh), att.bk.reshape(h, 1, dh), att.bv.reshape(h, 1, dh)
    ])
    wo = _dense(att.wo).reshape(h, dh, c)                              # (H, dh, C)
    ln1 = jnp.stack([p.ln_before_gamma, p.ln_before_beta])
    ln2 = jnp.stack([p.ln_after_gamma, p.ln_after_beta])
    out = _fused_layer_jit(
        x2, ln1, wqkv, bqkv, wo, att.bo.reshape(1, c), ln2,
        _dense(p.intermediate_kernel), p.intermediate_bias.reshape(1, -1),
        _dense(p.output_kernel), p.output_bias.reshape(1, c),
        num_heads=h, eps=p.eps,
        compute_dtype_name="bfloat16" if compute_dtype == jnp.bfloat16 else "float32",
    )
    return out.reshape(*lead, l, c)

"""Fused MobileNetV2 inverted-residual Pallas kernel: expand -> depthwise ->
reduce in ONE pass through VMEM.

Why: batched MobileViT inference is HBM-bandwidth-bound and the MNv2 blocks
are the worst offenders — the 4x-expanded activation (H, W, 4C) makes two
full HBM round trips between the three convs
(/root/reference/mobilevit/main.cpp:854-870 runs them as three separate ggml
graph nodes; the XLA port inherits the same traffic). Fusing the chain means
the expanded tensor NEVER leaves VMEM: HBM traffic drops from
``x + 4*expanded + out`` to ``x + out`` (~5-8x less for these shapes).

Design: grid over batch tiles only — the full (H, W) plane of G images plus
the expanded scratch fit comfortably in VMEM for every MobileViT shape (the
largest, 128x128x128 expanded at G=2, is ~8 MB). Per grid step:

  1. expand: (G*H*W, C) x (C, E) on the MXU, folded-BN scale/bias + SiLU
     applied in-register, written into a zero-ringed (G, H+2, W+2, E) scratch
     (the ring supplies the 3x3 depthwise padding);
  2. depthwise 3x3 (+BN+SiLU): nine shifted multiply-adds on the VPU —
     sublane/leading-dim slices of the scratch, f32 accumulator;
  3. reduce: (G*Ho*Wo, E) x (E, Cout) on the MXU, + folded BN bias,
     + the residual skip (still resident in VMEM) when in==out && stride 1.

Stride-2 support exists in the kernel (strided tap slices) and is exact in
interpret mode, but Mosaic currently rejects the sublane-strided slices on
real TPU — the model dispatch (models/mobilevit.InvertedResidualParams)
therefore routes only stride-1 blocks here and leaves the downsamplers on
XLA. BN folding happens at trace time from the ConvBNAct params — weights
are tiny, XLA hoists the folds out of the per-call path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_experiments_tpu.quant.pallas_kernels import _default_interpret


def _ir_kernel(
    x_ref,      # (G, H, W, C)
    wexp_ref,   # (C, E)   BN-folded expand kernel
    bexp_ref,   # (1, E)
    kdw_ref,    # (16, E)  rows 3*di+dj hold the BN-folded dw tap (di, dj)
    bdw_ref,    # (1, E)
    wred_ref,   # (E, Cout) reduce kernel
    bred_ref,   # (1, Cout) BN-folded reduce bias
    out_ref,    # (G, Ho, Wo, Cout)
    xe_ref,     # scratch (G, H+2, W+2, E) compute dtype
    *,
    stride: int,
    use_residual: bool,
    compute_dtype,
):
    g, h, w, c = x_ref.shape
    e = wexp_ref.shape[1]
    ho, wo = h // stride, w // stride
    cd = compute_dtype

    # 1. expand 1x1 (+BN+SiLU) into the zero-ringed scratch
    xe_ref[:] = jnp.zeros_like(xe_ref)
    x2 = x_ref[:].astype(cd).reshape(g * h * w, c)
    ex = jnp.dot(x2, wexp_ref[:].astype(cd), preferred_element_type=jnp.float32)
    ex = jax.nn.silu(ex + bexp_ref[0])
    xe_ref[:, 1 : h + 1, 1 : w + 1, :] = ex.reshape(g, h, w, e).astype(cd)

    # 2. depthwise 3x3 (+BN+SiLU), f32 accumulator
    if stride == 1:
        # di-first decomposition: the di taps slice the LEADING (H) dim —
        # free address offsets — so only the 3 final dj adds pay a sublane
        # shift (vs 9 shifted FMAs in the naive form). Measured 1.07x over
        # the naive taps and 1.25x over XLA's unfused chain at the layer_2
        # shape (64x64, E=256, B=128, chained in-jit to amortize dispatch).
        acc = jnp.zeros((g, h, w, e), jnp.float32)
        for dj in range(3):
            t = jnp.zeros((g, h, w + 2, e), jnp.float32)
            for di in range(3):
                t += xe_ref[:, di : di + h, :, :].astype(jnp.float32) * \
                     kdw_ref[3 * di + dj].astype(jnp.float32)
            acc += t[:, :, dj : dj + w, :]
    else:
        # strided taps: exact, but Mosaic rejects the sublane-strided slices
        # on real TPU — this branch serves interpret/CPU parity only
        acc = jnp.zeros((g, ho, wo, e), jnp.float32)
        for di in range(3):
            for dj in range(3):
                tap = xe_ref[:, di : di + h : stride, dj : dj + w : stride, :]
                acc += tap.astype(jnp.float32) * kdw_ref[3 * di + dj].astype(jnp.float32)
    y = jax.nn.silu(acc + bdw_ref[0])

    # 3. reduce 1x1 (+BN bias, no activation) + residual
    y2 = y.astype(cd).reshape(g * ho * wo, e)
    out = jnp.dot(y2, wred_ref[:].astype(cd), preferred_element_type=jnp.float32)
    out = out + bred_ref[0]
    if use_residual:
        out = out + x_ref[:].astype(jnp.float32).reshape(g * h * w, c)
    out_ref[:] = out.reshape(g, ho, wo, out_ref.shape[-1]).astype(out_ref.dtype)


def _pick_batch_tile(b: int, h: int, w: int, c: int, e: int, cout: int,
                     budget_bytes: int = 48 << 20) -> int:
    """Largest G dividing b whose working set fits the VMEM budget."""
    per_g = (
        (h + 2) * (w + 2) * e * 2      # expanded scratch (bf16)
        + h * w * c * 2                # input tile
        + h * w * e * 4                # f32 dw accumulator
        + h * (w + 2) * e * 4          # di-first per-dj f32 temporary
        + h * w * cout * 4             # output + matmul temp
    )
    g = max(1, budget_bytes // max(per_g, 1))
    while b % g:
        g -= 1
    return g


@functools.partial(
    jax.jit,
    static_argnames=("stride", "use_residual", "compute_dtype", "interpret"),
)
def fused_inverted_residual(
    x: jax.Array,          # (B, H, W, C)
    wexp: jax.Array,       # (C, E) folded
    bexp: jax.Array,       # (E,)
    kdw: jax.Array,        # (3, 3, E) folded
    bdw: jax.Array,        # (E,)
    wred: jax.Array,       # (E, Cout)
    bred: jax.Array,       # (Cout,)
    *,
    stride: int = 1,
    use_residual: bool = False,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    b, h, w, c = x.shape
    e = wexp.shape[1]
    cout = wred.shape[1]
    ho, wo = h // stride, w // stride
    g = _pick_batch_tile(b, h, w, c, e, cout)
    cd = compute_dtype

    kdw16 = jnp.zeros((16, e), kdw.dtype).at[:9].set(kdw.reshape(9, e))
    out = pl.pallas_call(
        functools.partial(
            _ir_kernel, stride=stride, use_residual=use_residual, compute_dtype=cd
        ),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, ho, wo, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), cd),
        scratch_shapes=[pltpu.VMEM((g, h + 2, w + 2, e), cd)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * e + 18 * b * ho * wo * e + 2 * b * ho * wo * e * cout,
            bytes_accessed=x.size * x.dtype.itemsize + b * ho * wo * cout * 2,
            transcendentals=b * (h * w + ho * wo) * e,
        ),
        interpret=_default_interpret() if interpret is None else interpret,
    )(
        x.astype(cd),
        wexp.astype(cd),
        bexp.reshape(1, e).astype(jnp.float32),
        kdw16,
        bdw.reshape(1, e).astype(jnp.float32),
        wred.astype(cd),
        bred.reshape(1, cout).astype(jnp.float32),
    )
    return out


def folded_conv_weights(conv) -> tuple:
    """(kernel, bias) with the ConvBNAct's folded BN absorbed: scale into the
    kernel's output channels, bias kept separate."""
    k = conv.kernel
    if conv.bn is not None:
        k = k * conv.bn.scale  # broadcast over the last (out-channel) dim
        return k, conv.bn.bias
    return k, jnp.zeros((k.shape[-1],), jnp.float32)


def inverted_residual_fused(params, x: jax.Array, *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Run an :class:`~..models.mobilevit.InvertedResidualParams` through the
    fused kernel. Semantics match the unfused path (tested to bf16 noise)."""
    wexp, bexp = folded_conv_weights(params.expand_1x1)
    kdw, bdw = folded_conv_weights(params.conv_3x3)
    wred, bred = folded_conv_weights(params.reduce_1x1)
    e = wexp.shape[-1]
    return fused_inverted_residual(
        x,
        wexp.reshape(wexp.shape[-2], e),     # (1,1,C,E) -> (C,E)
        bexp,
        kdw.reshape(3, 3, e),                # (3,3,1,E) -> (3,3,E)
        bdw,
        wred.reshape(e, wred.shape[-1]),
        bred,
        stride=params.conv_3x3.stride,
        use_residual=params.use_residual,
        compute_dtype=compute_dtype,
    )

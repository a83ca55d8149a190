"""Whole-transformer-layer fused Pallas kernel (one HBM round trip per layer).

Why: with flash attention in place the MobileViT transformer stages still pay
several full activation round trips per layer — LN statistics (convert+reduce
fusions), the q/k/v/ctx tensors written by the projections and re-read by the
attention kernel (plus the layout copies XLA inserts at every Mosaic custom-
call boundary: ~1.4 ms/call of pure relayout at B=128), and the 2x-wide FFN
intermediate. Every one of those tensors is (L <= 256, C <= 240) per sequence
— the whole per-sequence layer state fits comfortably in VMEM — so this
kernel runs the ENTIRE pre-LN ViT layer there:

    LN -> q/k/v proj -> masked-head attention -> out proj (+residual)
       -> LN -> FFN silu -> FFN out (+residual)

reading x once and writing the layer output once. It subsumes
ops/flash_attention.py (same channel-masked head separation, same softmax
policy) and replaces the reference's per-op ggml node chain for a layer
(/root/reference/mobilevit/main.cpp:988-1172) with a single fused region.

Design notes (same rules flash_attention.py earned by measurement):
* Everything stays at logical shapes — no lane padding is materialized; the
  MXU pads K/N internally exactly as XLA's own projection convs do, so the
  padded-FLOP cost is unchanged and only the HBM traffic goes away.
* Heads separated by channel masking (head_dim 36/48/60 is not lane-aligned).
* Grid over G-sequence row blocks; G unrolled in Python.
* LN statistics and all matmul accumulations in f32; activations cross
  between ops in the compute dtype (bf16), matching the unfused path's
  storage policy. Residual sums ride in f32 inside the kernel (a hair more
  accurate than the unfused bf16-storage adds, within bf16 noise).
* Quantized (QTensor) weights are dequantized OUTSIDE the kernel in-graph —
  identical numerics to the unfused XLA-fallback path for these small
  weights (quant/pallas_kernels.XLA_FALLBACK_MAX_ELEMS); their HBM traffic
  is trivial and the blocks stay resident across grid steps.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from ggml_experiments_tpu.quant.pallas_kernels import _default_interpret, dequant_in_graph
from ggml_experiments_tpu.quant.qtensor import QTensor

# vecs_ref row layout (all f32, width C):
(_LN1_G, _LN1_B, _BQ, _BK, _BV, _BO, _LN2_G, _LN2_B, _BO2,
 _LN3_G, _LN3_B, _MASK0) = range(12)


def _ln(xf, gamma, beta, eps):
    """f32 layernorm over the last axis — mirrors ops/norm.layer_norm."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _layer_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, wo_ref, wi_ref, wo2_ref, vecs_ref, bi_ref,
    *refs, num_heads: int, scale: float, eps: float, final_eps: float,
    compute_dtype, final_ln: bool, in_proj: bool, out_proj: bool,
    out_act: bool,
):
    """Row-wise ops (LN, projections, FFN) run once on the FLATTENED
    (G*L, C) block — at the short-sequence stages (L=16/64) per-sequence
    dots leave the 128-row MXU almost empty, and flattening G sequences
    into the M dimension is free (leading-dim collapse, no relayout).
    Only the score/context dots, which couple rows within one sequence,
    iterate per sequence.

    ``in_proj``/``out_proj`` absorb the MobileViT block's pointwise
    conv_1x1 / conv_projection (which commute with unfold/fold): x arrives
    at the narrower pre-projection width and the projection runs in-VMEM;
    symmetrically the output projection (+folded-BN affine, +SiLU) runs
    before the store, so neither conv's activation ever round-trips HBM.
    Trailing refs: [win] + [wout, oaff] + o_ref (positional, flag-gated)."""
    refs = list(refs)
    win_ref = refs.pop(0) if in_proj else None
    wout_ref = refs.pop(0) if out_proj else None
    oaff_ref = refs.pop(0) if out_proj else None
    o_ref = refs.pop(0)
    g, l, cin = x_ref.shape
    c = win_ref.shape[1] if in_proj else cin
    cd = compute_dtype

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if in_proj:
        # conv_1x1 (no BN, no act, main.cpp:1183) as an in-kernel projection
        xf = dot(x_ref[...].reshape(g * l, cin), win_ref[:])    # (G*L, C) f32
    else:
        xf = x_ref[...].reshape(g * l, c).astype(jnp.float32)   # (G*L, C)
    a = _ln(xf, vecs_ref[_LN1_G], vecs_ref[_LN1_B], eps).astype(cd)
    q = ((dot(a, wq_ref[:]) + vecs_ref[_BQ]) * scale).astype(cd)
    k = (dot(a, wk_ref[:]) + vecs_ref[_BK]).astype(cd)
    v = (dot(a, wv_ref[:]) + vecs_ref[_BV]).astype(cd)
    masks = [vecs_ref[_MASK0 + h] for h in range(num_heads)]    # (C,) 0/1 f32
    rows = []
    for i in range(g):
        qs, ks, vs = (t[i * l:(i + 1) * l] for t in (q, k, v))
        # Per-head masked dots, exactly flash_attention's recipe. A head-
        # packed variant (all heads' masked k/v stacked on the key axis so
        # scores+context are one (L, H*L) dot pair) was measured 0.62x at
        # the L=256 stage: the (L, H*L) -> (L, H, L) segmented-softmax
        # reshape splits the lane dim, a full vector relayout in Mosaic,
        # and the kp/vp concats materialize 2*H extra (L, C) blocks.
        acc = jnp.zeros((l, c), jnp.float32)
        for mh in masks:
            s = jax.lax.dot_general(
                qs, ks * mh.astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)                                        # (L, L)
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            ctx = dot(p.astype(cd), vs)                         # f32 (L, C)
            acc += ctx * mh * (1.0 / denom)
        rows.append(acc.astype(cd))
    ctx_all = rows[0] if g == 1 else jnp.concatenate(rows, axis=0)
    x1 = xf + dot(ctx_all, wo_ref[:]) + vecs_ref[_BO]
    y = _ln(x1, vecs_ref[_LN2_G], vecs_ref[_LN2_B], eps).astype(cd)
    h1 = dot(y, wi_ref[:]) + bi_ref[0]                          # (G*L, F)
    h1 = (h1 * jax.nn.sigmoid(h1)).astype(cd)                   # SiLU (:1148)
    o = x1 + dot(h1, wo2_ref[:]) + vecs_ref[_BO2]
    if final_ln:
        # block-final layernorm epilogue (the LN after the transformer
        # stack, main.cpp:1192-1209) — free here vs a full round trip;
        # uses the BLOCK's eps, which need not equal the layer's
        o = _ln(o, vecs_ref[_LN3_G], vecs_ref[_LN3_B], final_eps)
    if out_proj:
        # conv_projection + folded BN (+SiLU) epilogue (main.cpp:1215)
        o = dot(o.astype(cd), wout_ref[:]) * oaff_ref[0] + oaff_ref[1]
        if out_act:
            o = o * jax.nn.sigmoid(o)                           # SiLU
    o_ref[...] = o.astype(o_ref.dtype).reshape(g, l, o_ref.shape[-1])


def _pick_rows_per_step(bp: int, l: int, c: int, f: int, num_heads: int,
                        budget_bytes: int = 8 << 20) -> int:
    cpad = -(-c // 128) * 128
    fpad = -(-f // 128) * 128
    # x/a/q/k/v/o bf16 blocks + f32 scores + f32 x1/acc + f32 FFN intermediate
    del num_heads  # per-head loop reuses one (L, L) score block
    per_row = 6 * l * cpad * 2 + l * l * 4 + 2 * l * cpad * 4 + l * fpad * 4
    # target at least ~512 flattened rows per step so the row-wise dots fill
    # the MXU at short sequence lengths; VMEM budget is the hard cap
    g_cap = max(8, -(-512 // l))
    g = max(1, min(g_cap, budget_bytes // max(per_row, 1), bp))
    while bp % g:
        g -= 1
    return g


def _fused_layer_call(x3, wq, wk, wv, wo, wi, wo2, vecs, bi, *extra,
                      num_heads, eps, final_eps, compute_dtype, interpret,
                      final_ln, in_proj, out_proj, out_act):
    bp, l, cin = x3.shape
    c = wq.shape[0]
    cout = extra[1 if in_proj else 0].shape[-1] if out_proj else c
    f = wi.shape[-1]
    dh = c // num_heads
    g = _pick_rows_per_step(bp, l, max(c, cin, cout), f, num_heads)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    def xspec(width):
        return pl.BlockSpec((g, l, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    extra_specs = []
    if in_proj:
        extra_specs.append(wspec((cin, c)))
    if out_proj:
        extra_specs.append(wspec((c, cout)))
        extra_specs.append(wspec((2, cout)))
    return pl.pallas_call(
        functools.partial(
            _layer_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh),
            eps=eps, final_eps=final_eps, compute_dtype=compute_dtype,
            final_ln=final_ln, in_proj=in_proj, out_proj=out_proj,
            out_act=out_act,
        ),
        grid=(bp // g,),
        in_specs=[
            xspec(cin),
            wspec((c, c)), wspec((c, c)), wspec((c, c)), wspec((c, c)),
            wspec((c, f)), wspec((f, c)),
            wspec(vecs.shape), wspec((1, f)),
            *extra_specs,
        ],
        out_specs=xspec(cout),
        out_shape=jax.ShapeDtypeStruct((bp, l, cout), compute_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            # attention dots + projections + FFN (logical flops; MXU padding
            # is the scheduler's problem, as everywhere else)
            flops=bp * (4 * num_heads * l * l * c + 8 * l * c * c + 4 * l * c * f),
            bytes_accessed=bp * l * (cin + cout) * jnp.dtype(compute_dtype).itemsize,
            transcendentals=bp * (num_heads * l * l + l * f),
        ),
        interpret=_default_interpret() if interpret is None else interpret,
    )(x3, wq, wk, wv, wo, wi, wo2, vecs, bi, *extra)


@functools.lru_cache(maxsize=None)
def _fused_layer_partitioned(num_heads, eps, final_eps, compute_dtype,
                             interpret, final_ln, in_proj, out_proj, out_act):
    """Batch-partitionable wrapper: per-sequence problems are independent, so
    under a sharded jit the kernel must run per-shard on local batch rows
    (XLA's default would all-gather + replicate the pallas_call — the same
    trap flash_attention/qmatmul document). Weights/vecs replicate; l/c stay
    whole per device."""

    def core(x3, *rest):
        return _fused_layer_call(
            x3, *rest, num_heads=num_heads,
            eps=eps, final_eps=final_eps, compute_dtype=compute_dtype,
            interpret=interpret, final_ln=final_ln, in_proj=in_proj,
            out_proj=out_proj, out_act=out_act,
        )

    def _batch_spec(arg_shapes):
        s = arg_shapes[0].sharding
        if isinstance(s, NamedSharding) and s.spec and s.spec[0] is not None:
            return s.spec[0]
        return None

    n_weights = 8 + (1 if in_proj else 0) + (2 if out_proj else 0)

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_spec(arg_shapes), None, None))

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_spec(arg_shapes)
        xs = NamedSharding(mesh, P(b, None, None))
        rep2 = NamedSharding(mesh, P(None, None))
        return mesh, core, xs, (xs,) + (rep2,) * n_weights

    # Rule built per variant: every non-batch dim is a fresh replicated
    # factor, except the output channel dim which shares its factor with
    # the producing weight (wout's N when out_proj, win's N when only
    # in_proj, x's C otherwise). Factors must be listed in order of first
    # appearance (Shardy rejects unsorted special-factor indices).
    terms = ["b l c"]
    order = ["l", "c"]

    def fresh(n):
        out = []
        for _ in range(n):
            name = f"z{len(order)}"
            order.append(name)
            out.append(name)
        return out

    out_c = "c"
    for _ in range(6):  # wq wk wv wo wi wo2
        terms.append(" ".join(fresh(2)))
    terms.append(" ".join(fresh(2)))  # vecs
    terms.append(" ".join(fresh(2)))  # bi
    if in_proj:
        a, bn_ = fresh(2)
        terms.append(f"{a} {bn_}")
        out_c = bn_
    if out_proj:
        a, n = fresh(2)
        terms.append(f"{a} {n}")
        s_ = fresh(1)[0]
        terms.append(f"{s_} {n}")
        out_c = n
    rule = ", ".join(terms) + f" -> b l {out_c}"

    fn = custom_partitioning(core)
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(order),
    )
    return fn


def _as_float(w, dtype):
    """Traceable dequantize-to-dtype (shares quant.dequant_in_graph with the
    unfused XLA-fallback path, so the two routes cannot drift)."""
    if isinstance(w, QTensor):
        w = dequant_in_graph(w)
    return w.astype(dtype)


def fused_transformer_layer(
    p,                       # TransformerLayerParams (duck-typed)
    x: jax.Array,            # (..., L, C) — or (..., L, Cin) with input_proj
    *,
    compute_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    final_ln=None,           # optional (gamma, beta): block-final LN epilogue
    final_ln_eps: Optional[float] = None,      # block eps (default: layer eps)
    input_proj: Optional[jax.Array] = None,    # (Cin, C) pointwise prologue
    output_proj=None,        # optional (kernel (C, Cout), scale, bias, act)
) -> jax.Array:
    """Run one pre-LN ViT encoder layer as a single fused Pallas kernel.

    Numerically matches ``TransformerLayerParams.__call__`` at the same
    compute dtype within bf16 noise (residual sums ride in f32 in-kernel).
    QTensor weights are dequantized in-graph outside the kernel.
    ``final_ln=(gamma, beta)`` additionally applies the MobileViT block's
    post-stack layernorm in-kernel (main.cpp:1192-1209) — the last layer of
    a block takes this to save one full activation round trip.
    ``input_proj``/``output_proj`` absorb the block's pointwise conv_1x1 /
    conv_projection (they commute with unfold/fold): the first/last layer
    of a block takes them so those convs' activations never touch HBM.
    ``output_proj`` is (kernel, bn_scale, bn_bias, act) with act in
    {"silu", "none"}; it applies after ``final_ln`` (block order).
    """
    *lead, l, cin = x.shape
    att = p.attention
    num_heads = att.num_heads
    c = input_proj.shape[1] if input_proj is not None else cin
    if c % num_heads:
        raise ValueError(f"C={c} not divisible by num_heads={num_heads}")
    cd = compute_dtype
    bp = 1
    for d in lead:
        bp *= d

    wq, wk, wv, wo = (_as_float(w, cd) for w in (att.wq, att.wk, att.wv, att.wo))
    wi = _as_float(p.intermediate_kernel, cd)
    wo2 = _as_float(p.output_kernel, cd)
    f = wi.shape[-1]

    def vec(b, width=c):
        return jnp.zeros(width, jnp.float32) if b is None else b.astype(jnp.float32)

    head_ids = jnp.arange(c, dtype=jnp.int32) // (c // num_heads)
    masks = (head_ids[None, :] == jnp.arange(num_heads, dtype=jnp.int32)[:, None])
    ln3_g, ln3_b = final_ln if final_ln is not None else (None, None)
    vecs = jnp.concatenate(
        [
            jnp.stack([
                vec(p.ln_before_gamma), vec(p.ln_before_beta),
                vec(att.bq), vec(att.bk), vec(att.bv), vec(att.bo),
                vec(p.ln_after_gamma), vec(p.ln_after_beta),
                vec(p.output_bias),
                vec(ln3_g), vec(ln3_b),
            ]),
            masks.astype(jnp.float32),
        ]
    )
    bi = vec(p.intermediate_bias, f)[None, :]

    extra = []
    out_act = False
    cout = c
    if input_proj is not None:
        extra.append(input_proj.astype(cd))
    if output_proj is not None:
        wout, bn_scale, bn_bias, act = output_proj
        cout = wout.shape[-1]
        out_act = act == "silu"
        if not out_act and act not in (None, "none"):
            raise ValueError(f"unsupported output_proj activation {act!r}")
        extra.append(wout.astype(cd))
        extra.append(jnp.stack([bn_scale.astype(jnp.float32),
                                bn_bias.astype(jnp.float32)]))

    fn = _fused_layer_partitioned(
        num_heads, float(p.eps),
        float(p.eps if final_ln_eps is None else final_ln_eps),
        cd, interpret, final_ln is not None,
        input_proj is not None, output_proj is not None, out_act,
    )
    out = fn(x.reshape(bp, l, cin).astype(cd), wq, wk, wv, wo, wi, wo2,
             vecs, bi, *extra)
    return out.reshape(*lead, l, cout)

"""Fused multi-head attention Pallas kernel (scores never touch HBM).

Why: at serving batch the MobileViT transformer stages are HBM-bandwidth-
bound, and the (L, L) score/probability tensors are the single largest
activations in the model — at B=128 the L=256 stage materializes
B*P*H*L*L = 268 MB *per score tensor per layer* on the XLA path
(ops/attention.py), several full HBM round trips per transformer layer.
The whole per-(batch, patch-pos, head) attention problem is tiny
(L <= 256, head_dim <= 60), so the entire score -> softmax -> context
chain fits in VMEM: this kernel runs it there, reading q/k/v once and
writing the context once. Replaces the reference's materialized
score/softmax node chain (/root/reference/mobilevit/main.cpp:1073-1093)
the TPU way.

Design notes:
* Inputs stay in the projections' natural (..., L, C) layout — no
  (..., H, L, dh) transpose is ever materialized in HBM (the same rule
  ops/attention.py follows), and heads are separated by channel masking
  rather than lane slicing (see _mha_kernel — head_dim isn't 128-aligned).
* Grid over row-blocks of the flattened leading dims; G rows per step are
  unrolled in Python (Mosaic prefers 2-D dots; G*H small dots per step
  amortize grid overhead).
* Scores/softmax accumulate in f32 regardless of compute dtype;
  probabilities are cast to the compute dtype for the context matmul
  (matches the XLA path's accumulation policy, a hair more accurate).
* No online-softmax tiling: L <= 256 means whole rows fit in VMEM, so
  this is a single-pass fused attention, not a tiled flash loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from ggml_experiments_tpu.quant.pallas_kernels import _default_interpret


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads: int,
                scale: float, compute_dtype):
    """Head separation WITHOUT lane slicing: head_dim is rarely a multiple of
    the 128-lane tile (MobileViT: 36/48/60), so per-head lane slices lower to
    expensive vector shuffles (measured 0.9x vs XLA). Instead every dot runs
    at full channel width and heads are isolated algebraically:

      scores_h = q @ (k * mask_h)^T     (other heads' channels contribute 0)
      ctx      = sum_h (probs_h @ v) * mask_h

    All loads/stores/dots stay 128-aligned; the ~2x padded-FLOP overhead is
    noise for the MXU at these sizes (L <= 256, C <= 240). Two rejected
    shapes, both measured slower on v5e: stacking masked k/v head-major into
    (H*L, C) scratch for one big dot pair per row (1.6x slower — the scratch
    writes cost more than the small dots save), and a fori_loop over rows
    with dynamic ref indexing instead of this Python unroll (1.7x slower).
    """
    g, l, c = q_ref.shape
    cd = compute_dtype
    for i in range(g):
        qf = q_ref[i] * jnp.asarray(scale, q_ref.dtype)   # (L, C)
        kf = k_ref[i]
        vf = v_ref[i]
        acc = jnp.zeros((l, c), jnp.float32)
        for h in range(num_heads):
            mh = mask_ref[h].astype(kf.dtype)             # (C,) 0/1 lane mask
            # Mosaic requires a 32-bit matmul accumulator; the softmax
            # elementwise work then runs at compute precision (bf16 packs
            # two lanes per VPU element; the XLA path stores bf16 scores too)
            s = jax.lax.dot_general(
                qf, kf * mh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)                                  # (L, L)
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            # normalization folded into a per-row context scale: an (L, 1)
            # reciprocal broadcast beats an (L, L) divide
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            ctx = jnp.dot(p.astype(cd), vf, preferred_element_type=jnp.float32)
            acc += ctx * mask_ref[h] * (1.0 / denom)
        o_ref[i] = acc.astype(o_ref.dtype)


def _pick_rows_per_step(bp: int, l: int, c: int, budget_bytes: int = 10 << 20) -> int:
    cpad = -(-c // 128) * 128
    per_row = 4 * l * cpad * 2 + l * l * 4          # q/k/v/o blocks + f32 scores
    g = max(1, min(8, budget_bytes // max(per_row, 1)))
    while bp % g:
        g -= 1
    return g


def _flash_core_call(q3, k3, v3, masks, *, num_heads, compute_dtype, interpret):
    """The pallas_call on an already-flattened (bp, l, c) problem. Runs on
    whatever (possibly per-shard) bp it is given."""
    bp, l, c = q3.shape
    dh = c // num_heads
    g = _pick_rows_per_step(bp, l, c)
    cd = compute_dtype
    spec = pl.BlockSpec((g, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _mha_kernel, num_heads=num_heads, scale=1.0 / math.sqrt(dh),
            compute_dtype=cd,
        ),
        grid=(bp // g,),
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((num_heads, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bp, l, c), cd),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * num_heads * l * l * c,
            bytes_accessed=4 * bp * l * c * jnp.dtype(cd).itemsize,
            transcendentals=bp * num_heads * l * l,
        ),
        interpret=_default_interpret() if interpret is None else interpret,
    )(q3, k3, v3, masks)


@functools.lru_cache(maxsize=None)
def _flash_core_partitioned(num_heads, compute_dtype, interpret):
    """Batch-partitionable wrapper: under a sharded jit the kernel runs
    per-shard on the local batch rows instead of XLA gathering the operands
    to one replicated pallas_call (each (b, l, c) attention problem is
    independent, so DP/row sharding is embarrassingly parallel). The l/c/h
    dims must stay whole on every device — the kernel wants full rows and
    full channel width in VMEM."""
    def core(q3, k3, v3, masks):  # positional-only: custom_partitioning
        return _flash_core_call(
            q3, k3, v3, masks, num_heads=num_heads,
            compute_dtype=compute_dtype, interpret=interpret,
        )

    def _batch_spec(shardings, mesh):
        # q/k/v agree on dim-0 sharding by construction; take the first
        for s in shardings:
            if isinstance(s, NamedSharding) and s.spec and s.spec[0] is not None:
                return s.spec[0]
        return None

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_spec([a.sharding for a in arg_shapes[:3]], mesh)
        return NamedSharding(mesh, P(b, None, None))

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_spec([a.sharding for a in arg_shapes[:3]], mesh)
        qkv = NamedSharding(mesh, P(b, None, None))
        mask_s = NamedSharding(mesh, P(None, None))
        return mesh, core, qkv, (qkv, qkv, qkv, mask_s)

    fn = custom_partitioning(core)
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b l c, b l c, b l c, h c -> b l c",
        need_replication_factors=("l", "c", "h"),
    )
    return fn


@functools.partial(
    jax.jit, static_argnames=("num_heads", "compute_dtype", "interpret")
)
def flash_mha(
    q: jax.Array,            # (..., L, C)
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    """Dense (non-causal, unmasked) MHA over the last two dims: returns the
    context in the same (..., L, C) layout the output projection consumes.
    Partition-aware: batch-dim sharding stays local per device (see
    _flash_core_partitioned)."""
    *lead, l, c = q.shape
    if c % num_heads:
        raise ValueError(f"C={c} not divisible by num_heads={num_heads}")
    bp = 1
    for d in lead:
        bp *= d
    dh = c // num_heads
    cd = compute_dtype

    q3, k3, v3 = (t.reshape(bp, l, c).astype(cd) for t in (q, k, v))
    head_ids = jnp.arange(c, dtype=jnp.int32) // dh          # (C,)
    masks = (head_ids[None, :] == jnp.arange(num_heads, dtype=jnp.int32)[:, None])
    masks = masks.astype(jnp.float32)                        # (H, C)
    fn = _flash_core_partitioned(num_heads, cd, interpret)
    return fn(q3, k3, v3, masks).reshape(*lead, l, c)

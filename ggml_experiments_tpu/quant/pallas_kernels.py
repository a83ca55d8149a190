"""Fused dequant+matmul Pallas TPU kernels for Q8_0 / Q4_0 QTensors.

The TPU-native replacement for ggml's quantized ``ggml_mul_mat`` path
(``ggml-quants.c`` vec-dot kernels, linked by /root/reference/mobilevit/Makefile:16).
Instead of ggml's per-row int8 dot on CPU SIMD, we tile the quantized weight
into VMEM, dequantize in-register on the VPU (codes * per-block scales) and
feed the MXU with one large dot per tile — weights move HBM->VMEM in their
compressed form, so the kernel is bandwidth-bound at the *compressed* byte
count (the whole point of weight-only quantization for decode).

Layout contract (see quant/qtensor.py): ``x (M, K) @ W (K, N)`` with
``codes (Kp, Np)`` int8 (or nibble-packed ``(Kp//2, Np)`` uint8), ``scales
(Kp//32, Np)`` f32, Kp % 32 == 0, Np % 128 == 0.

Grid is (M-tiles, N-tiles, K-tiles); K iterates innermost (sequential on TPU)
accumulating into the f32 output tile, so each output tile stays resident in
VMEM across the K loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from ggml_experiments_tpu.quant.qtensor import (
    BLOCK,
    QTensor,
    unpack_hibits,
    unpack_nibbles,
    unpack_q4,
)

# operand planes per format, in kernel argument order after x. q4_k's stored
# stacked-halves supers plane enters the kernel as two separate K-tiled
# operands (supers_d/supers_m, split by _op_planes) — a single stacked plane
# would need a dynamic-start sublane load in-kernel, which Mosaic rejects
# ("cannot statically prove index is a multiple of 8").
_PLANES = {
    "q8_0": ("codes", "scales"),
    "q4_0": ("codes", "scales"),
    "q4_1": ("codes", "scales", "mins"),
    "q5_0": ("codes", "hibits", "scales"),
    "q5_1": ("codes", "hibits", "scales", "mins"),
    "q4_k": ("codes", "scales", "mins", "supers_d", "supers_m"),
}


def _op_planes(qt: "QTensor"):
    """Kernel operand arrays for a QTensor, in _PLANES order."""
    if qt.qtype == "q4_k":
        ns = qt.supers.shape[0] // 2
        return (qt.codes, qt.scales, qt.mins, qt.supers[:ns], qt.supers[ns:])
    return tuple(getattr(qt, p) for p in _PLANES[qt.qtype])

# Flipped to True on CPU (tests / simulated meshes) where Mosaic can't compile.
_INTERPRET = False

# Weights with K*N at or below this take the inline-XLA dequant+dot path
# instead of the Pallas kernel: for the many small transformer projections
# (MobileViT: 144..480-wide) per-launch overhead dominates, and XLA folds the
# cheap dequant into the surrounding graph (hoisting it out of scans when
# loop-invariant). Large weights (GRU gate matmuls) stay on the fused kernel,
# where compressed HBM traffic matters. Measured crossover on v5e: the small
# path doubles quantized MobileViT throughput with zero accuracy change.
XLA_FALLBACK_MAX_ELEMS = 1 << 20


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _default_interpret() -> bool:
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(x, w, compute_dtype):
    # f32 compute => full-precision MXU passes (parity with the fp32 model);
    # bf16 compute => single-pass MXU (the fast serving path).
    precision = (
        jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _q8_kernel(x_ref, codes_ref, scales_ref, out_ref, *, compute_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk, tn = codes_ref.shape
    w = codes_ref[:].astype(jnp.float32)
    w = (w.reshape(tk // BLOCK, BLOCK, tn) * scales_ref[:][:, None, :]).reshape(tk, tn)
    out_ref[:] += _dot(x_ref[:], w, compute_dtype)


def _q4_kernel(x_ref, codes_ref, scales_ref, out_ref, *, compute_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    half, tn = codes_ref.shape
    tk = half * 2
    w = unpack_q4(codes_ref[:])
    w = (w.reshape(tk // BLOCK, BLOCK, tn) * scales_ref[:][:, None, :]).reshape(tk, tn)
    out_ref[:] += _dot(x_ref[:], w, compute_dtype)


def _q4_1_kernel(x_ref, codes_ref, scales_ref, mins_ref, out_ref, *, compute_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    half, tn = codes_ref.shape
    tk = half * 2
    q = unpack_nibbles(codes_ref[:])
    w = (
        q.reshape(tk // BLOCK, BLOCK, tn) * scales_ref[:][:, None, :]
        + mins_ref[:][:, None, :]
    ).reshape(tk, tn)
    out_ref[:] += _dot(x_ref[:], w, compute_dtype)


def _q5_0_kernel(x_ref, codes_ref, hibits_ref, scales_ref, out_ref, *, compute_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    half, tn = codes_ref.shape
    tk = half * 2
    q = unpack_nibbles(codes_ref[:]) + 16.0 * unpack_hibits(hibits_ref[:]) - 16.0
    w = (q.reshape(tk // BLOCK, BLOCK, tn) * scales_ref[:][:, None, :]).reshape(tk, tn)
    out_ref[:] += _dot(x_ref[:], w, compute_dtype)


def _q5_1_kernel(
    x_ref, codes_ref, hibits_ref, scales_ref, mins_ref, out_ref, *, compute_dtype
):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    half, tn = codes_ref.shape
    tk = half * 2
    q = unpack_nibbles(codes_ref[:]) + 16.0 * unpack_hibits(hibits_ref[:])
    w = (
        q.reshape(tk // BLOCK, BLOCK, tn) * scales_ref[:][:, None, :]
        + mins_ref[:][:, None, :]
    ).reshape(tk, tn)
    out_ref[:] += _dot(x_ref[:], w, compute_dtype)


def _q4_k_kernel(
    x_ref, codes_ref, scales_ref, mins_ref, dsup_ref, msup_ref, out_ref, *,
    compute_dtype
):
    """Super-block k-quant (quant/kquant.py): sub-block scale/min codes are
    uint8, decoded in-VMEM against the per-super-block f32 rows (one
    (tile_k//256, tn) tile per supers half). Requires tile_k % 256 == 0
    (whole super-blocks per tile; _pick_tiles enforces it, qmatmul routes
    ragged K to the XLA path)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    half, tn = codes_ref.shape
    tk = half * 2
    ts = tk // 256                       # super-blocks in this K tile
    sc = scales_ref[:].astype(jnp.int32).astype(jnp.float32)  # (tk//32, tn)
    mc = mins_ref[:].astype(jnp.int32).astype(jnp.float32)
    eff_d = (sc.reshape(ts, 8, tn) * dsup_ref[:][:, None, :]).reshape(tk // BLOCK, tn)
    eff_m = (mc.reshape(ts, 8, tn) * msup_ref[:][:, None, :]).reshape(tk // BLOCK, tn)
    q = unpack_nibbles(codes_ref[:])
    w = (
        q.reshape(tk // BLOCK, BLOCK, tn) * eff_d[:, None, :]
        - eff_m[:, None, :]
    ).reshape(tk, tn)
    out_ref[:] += _dot(x_ref[:], w, compute_dtype)


_KERNELS = {
    "q8_0": _q8_kernel,
    "q4_0": _q4_kernel,
    "q4_1": _q4_1_kernel,
    "q5_0": _q5_0_kernel,
    "q5_1": _q5_1_kernel,
    "q4_k": _q4_k_kernel,
}


# K rows packed per codes row (nibble formats pack two)
def _kdiv(qtype: str) -> int:
    return 1 if qtype == "q8_0" else 2


def _plane_spec(plane: str, qtype: str, tile_k: int, tile_n: int):
    """BlockSpec K-row granularity for each quantization plane."""
    rows = {
        "codes": tile_k // _kdiv(qtype),
        "hibits": tile_k // 8,
        "scales": tile_k // BLOCK,
        "mins": tile_k // BLOCK,
        "supers_d": tile_k // 256,
        "supers_m": tile_k // 256,
    }[plane]
    return pl.BlockSpec((rows, tile_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit, static_argnames=("qtype", "logical_n", "tile_m", "tile_n", "tile_k", "compute_dtype")
)
def _qmatmul_2d(
    x,
    *planes,
    qtype: str,
    logical_n: int,
    tile_m: int,
    tile_n: int,
    tile_k: int,
    compute_dtype,
):
    m, kp = x.shape
    np_ = planes[0].shape[-1]
    grid = (pl.cdiv(m, tile_m), pl.cdiv(np_, tile_n), pl.cdiv(kp, tile_k))

    flops = 2 * m * kp * np_
    bytes_accessed = (
        x.size * x.dtype.itemsize
        + sum(p.size * p.dtype.itemsize for p in planes)
        + m * np_ * 4
    )

    out = pl.pallas_call(
        functools.partial(_KERNELS[qtype], compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        ] + [_plane_spec(p, qtype, tile_k, tile_n) for p in _PLANES[qtype]],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_round_up(m, tile_m), np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=_default_interpret(),
    )(x, *planes)
    return out[:m, :logical_n]


def _pick_tiles(m, kp, np_, qtype):
    """VMEM-aware tile choice for the small/odd shapes of these workloads."""
    tile_m = min(_round_up(m, 8), 256)
    tile_n = min(np_, 512)
    # keep codes(+hibits+mins) tile under ~1 MB, K a multiple of 32 (whole blocks)
    bytes_per_k = tile_n * (1 if qtype == "q8_0" else 0.5)
    if qtype in ("q5_0", "q5_1"):
        bytes_per_k += tile_n * 0.125  # hibits: 1 bit/weight
    if qtype in ("q4_1", "q5_1"):
        bytes_per_k += tile_n * 0.125  # f32 mins: 4 bytes per 32-weight block
    if qtype == "q4_k":
        bytes_per_k += tile_n * 0.0625  # u8 scale + min codes per 32-block
    # q4_k tiles whole 256-row super-blocks (the kernel decodes sub-scales
    # against per-super rows); qmatmul() routes kp % 256 != 0 to the XLA path
    grain = 256 if qtype == "q4_k" else BLOCK
    max_k = int((1 << 20) / max(bytes_per_k, 1))
    tile_k = min(kp, max(_round_up(min(max_k, kp), grain), grain))
    # tile_k must divide into grid steps of whole blocks; also x tile must fit
    while tile_m * tile_k * 4 > (4 << 20) and tile_k > grain:
        tile_k = _round_up(tile_k // 2, grain)
    return tile_m, tile_n, tile_k


@functools.lru_cache(maxsize=None)
def _qmatmul_partitioned(qtype: str, compute_dtype):
    """Partition-aware wrapper over the padded (m, kp)x(kp, np) kernel.

    Under a sharded jit, XLA's default for a pallas_call is to gather every
    operand and run it replicated — which silently defeats Megatron-style
    column-parallel TP for quantized weights (full weight all-gather each
    step). This rule keeps M (activation rows) and N (weight columns) local
    per shard; K and the scale rows must be whole on each device (row-
    parallel K sharding still takes the gather path, as before — the
    sharding module prefers pairing column-parallel QTensors with a
    row-parallel *float* partner, parallel/sharding.py)."""

    n_planes = len(_PLANES[qtype])

    def core(x2, *planes):
        m, kp = x2.shape
        np_ = planes[0].shape[-1]
        tile_m, tile_n, tile_k = _pick_tiles(m, kp, np_, qtype)
        return _qmatmul_2d(
            x2, *planes, qtype=qtype, logical_n=np_,
            tile_m=tile_m, tile_n=tile_n, tile_k=tile_k,
            compute_dtype=compute_dtype,
        )

    def _axis(sharding, dim):
        if isinstance(sharding, NamedSharding) and len(sharding.spec) > dim:
            return sharding.spec[dim]
        return None

    def _axes(arg_shapes):
        m_ax = _axis(arg_shapes[0].sharding, 0)
        n_ax = None
        for s in arg_shapes[1:]:
            n_ax = n_ax or _axis(s.sharding, 1)
        return m_ax, n_ax

    def infer(mesh, arg_shapes, result_shape):
        m_ax, n_ax = _axes(arg_shapes)
        return NamedSharding(mesh, P(m_ax, n_ax))

    def partition(mesh, arg_shapes, result_shape):
        m_ax, n_ax = _axes(arg_shapes)
        return (
            mesh,
            core,
            NamedSharding(mesh, P(m_ax, n_ax)),
            (NamedSharding(mesh, P(m_ax, None)),)
            + (NamedSharding(mesh, P(None, n_ax)),) * n_planes,
        )

    fn = custom_partitioning(core)
    # every plane's K-rows are distinct factors (codes pack 2 K rows/row,
    # hibits 8, scales/mins 32): all K-ish dims replicated, m/n free to shard
    k_factors = tuple(f"k{i}" for i in range(n_planes + 1))
    plane_terms = ", ".join(f"{k} n" for k in k_factors[1:])
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"m {k_factors[0]}, {plane_terms} -> m n",
        need_replication_factors=k_factors,
    )
    return fn


def qmatmul(x: jax.Array, qt: QTensor, *, compute_dtype=jnp.float32) -> jax.Array:
    """``x @ dequantize(qt)`` with fused in-kernel dequantization.

    ``x``: float array ``(..., K)``. Returns float32 ``(..., N)``.
    Falls back to interpret mode automatically off-TPU. Partition-aware:
    M/N shardings stay local per device (see _qmatmul_partitioned).
    """
    k, n = qt.shape
    if x.shape[-1] != k:
        raise ValueError(f"x last dim {x.shape[-1]} != weight K {k}")
    if k * n <= XLA_FALLBACK_MAX_ELEMS:
        return _xla_dequant_dot(x, qt, compute_dtype=compute_dtype)
    if qt.qtype == "q4_k" and qt.kp % 256 != 0:
        # the kernel tiles whole super-blocks; ragged-K q4_k weights (none in
        # this repo's large-weight set) take the in-graph dequant dot
        return _xla_dequant_dot(x, qt, compute_dtype=compute_dtype)
    batch_shape = x.shape[:-1]
    m = 1
    for d in batch_shape:
        m *= d
    x2 = x.reshape(m, k).astype(jnp.float32)
    kp = qt.kp
    if kp != k:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - k)))
    planes = _op_planes(qt)
    out = _qmatmul_partitioned(qt.qtype, compute_dtype)(x2, *planes)
    if n != out.shape[-1]:
        out = out[:, :n]  # drop lane padding (kept through the sharded call)
    if compute_dtype != jnp.float32:
        out = out.astype(compute_dtype)  # bf16 storage; kernel accumulates f32
    return out.reshape(*batch_shape, n)


def dequant_in_graph(qt: QTensor) -> jax.Array:
    """Traceable dequantize to a dense f32 ``(k, n)`` array — the ONE
    in-graph dequant implementation (QTensor.dequantize() is numpy-only);
    shared by the XLA fallback dot and the fused-transformer-layer weight
    prep so their numerics cannot drift apart."""
    if qt.qtype == "q8_0":
        q = qt.codes.astype(jnp.float32)
    elif qt.qtype == "q4_0":
        q = unpack_q4(qt.codes)
    else:
        q = unpack_nibbles(qt.codes)
        if qt.hibits is not None:
            q = q + 16.0 * unpack_hibits(qt.hibits)
        if qt.qtype == "q5_0":
            q = q - 16.0
    kp, np_ = q.shape
    if qt.qtype == "q4_k":
        nb = kp // BLOCK
        ns = qt.supers.shape[0] // 2
        sc = qt.scales.astype(jnp.int32).astype(jnp.float32)
        mc = qt.mins.astype(jnp.int32).astype(jnp.float32)
        # nb rows of sub-block codes against ceil(nb/8) super rows (pad the
        # tail group so the reshape is whole; padded rows multiply into 0)
        pad = ns * 8 - nb
        if pad:
            sc = jnp.pad(sc, ((0, pad), (0, 0)))
            mc = jnp.pad(mc, ((0, pad), (0, 0)))
        eff_d = (sc.reshape(ns, 8, np_) * qt.supers[:ns, None, :]).reshape(-1, np_)[:nb]
        eff_m = (mc.reshape(ns, 8, np_) * qt.supers[ns:, None, :]).reshape(-1, np_)[:nb]
        w = q.reshape(nb, BLOCK, np_) * eff_d[:, None, :] - eff_m[:, None, :]
        return w.reshape(kp, np_)[: qt.k, : qt.n]
    w = q.reshape(kp // BLOCK, BLOCK, np_) * qt.scales[:, None, :]
    if qt.mins is not None:
        w = w + qt.mins[:, None, :]
    return w.reshape(kp, np_)[: qt.k, : qt.n]


def _xla_dequant_dot(x: jax.Array, qt: QTensor, *, compute_dtype=jnp.float32) -> jax.Array:
    """In-graph dequantize + dot for small weights (traceable, scan-hoistable)."""
    w = dequant_in_graph(qt)
    precision = (
        jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32 if compute_dtype == jnp.float32 else compute_dtype,
        precision=precision,
    )


def qmatmul_reference(x: jax.Array, qt: QTensor) -> jax.Array:
    """Unfused reference: dequantize-then-matmul in plain XLA (test oracle)."""
    w = qt.dequantize()
    return jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)

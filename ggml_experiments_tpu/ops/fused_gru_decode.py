"""Persistent fused GRU decode: the whole greedy decode loop in ONE Pallas kernel.

The performance ceiling of scan-based decode (models/gru_textgen.generate) is
per-step dispatch: three pallas_calls + gather/argmax glue per token put the
chip at ~144us/step while the arithmetic needs ~15us. This kernel runs the
*entire* token loop on-core:

  * Q8_0 weights are loaded HBM->VMEM once and dequantized to bf16 in VMEM —
    zero per-step weight traffic (the scan path re-reads ~4 MB per step);
  * the input projection is a vocab-wide table (emb · W, built once in
    setup) contracted against the step's one-hot on the MXU (no gather);
  * gate math, state update, logits and argmax all happen in-kernel;
  * the recurrent state h lives in VMEM scratch for the whole decode.

Mosaic layout rules shape the design: dynamic slices are only legal on the
sublane dim, so the per-step token stream lives as rows of (T, B) buffers and
all per-slot scalars are (1, B) row vectors; the vocab projection is computed
*transposed* — ``logits (Vp, B) = d_bf^T·h`` — so the greedy argmax reduces
over sublanes and lands directly as the next (1, B) token row, with no
transposes anywhere in the loop.

This is the TPU-native answer to the reference's per-token host loop
(rnn_text_generation.cpp:293-313) at speed-of-light rather than mere
correctness; the composable scan path remains for sampling/training.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggml_experiments_tpu.quant.qtensor import BLOCK, QTensor, unpack_q4
from ggml_experiments_tpu.quant.pallas_kernels import _default_interpret

NEG = -1e30

def _dequant_to(codes, scales, out_ref, dtype, qtype):
    if qtype == "dense":
        # pre-dequantized plane (q4_1/q5_0/q5_1 and mixed-qtype params):
        # the plane arrives at the compute dtype; the setup copies it into
        # the same scratch the quantized paths dequantize into, so the
        # per-step loop is identical across formats (reading the operand
        # refs directly in the loop was measured ~2x slower per step and
        # removed — see docs/capacity_sweep_r4.json dense_path notes)
        out_ref[:] = codes[:].astype(dtype)
        return
    w = unpack_q4(codes) if qtype == "q4_0" else codes.astype(jnp.float32)
    kp, n = w.shape
    w = (w.reshape(kp // BLOCK, BLOCK, n) * scales[:, None, :]).reshape(kp, n)
    out_ref[:] = w.astype(dtype)


def _gru_step(tok, h_ref, proj_bf, u_bf, d_bf, b0, b1, dbias_col, sub_v,
              *, units, compute_dtype, active_col=None):
    """One decode step shared by the offline kernel and the serving tick:
    one-hot input projection -> gates -> state update (optionally masked by
    the (B, 1) ``active_col``) -> transposed logits -> greedy (1, B) argmax.
    Mutates ``h_ref`` in place; returns (pred, logits_vb)."""
    cd = compute_dtype
    u = units
    g = 3 * u
    onehot_vb = (sub_v == tok).astype(cd)                 # (Vp, B)
    # mx (B, G) = onehot^T · proj   (contract the sublane Vp dim) — the
    # projected-row gather as one small matmul
    mx = (
        jax.lax.dot_general(
            onehot_vb, proj_bf[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b0
    )
    h_full = h_ref[:]                                     # (B, Ku); pad cols stay 0
    mh = (
        jnp.dot(h_full.astype(cd), u_bf[:], preferred_element_type=jnp.float32)[:, :g]
        + b1
    )
    z = jax.nn.sigmoid(mx[:, :u] + mh[:, :u])
    r = jax.nn.sigmoid(mx[:, u : 2 * u] + mh[:, u : 2 * u])
    hh = jnp.tanh(mx[:, 2 * u :] + r * mh[:, 2 * u :])
    h = z * h_full[:, :u] + (1.0 - z) * hh
    if active_col is not None:
        h = jnp.where(active_col, h, h_full[:, :u])
    if h_full.shape[1] == u:
        h_ref[:] = h
    else:
        h_ref[:, :u] = h

    # logits transposed: (Vp, B) = d_bf^T · h^T  — contract Ku on both
    logits_vb = jax.lax.dot_general(
        d_bf[:], h_ref[:].astype(cd), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + dbias_col                                          # pad rows get NEG bias
    m = jnp.max(logits_vb, axis=0, keepdims=True)          # (1, B)
    cand = jnp.where(logits_vb == m, sub_v, jnp.int32(2**30))
    pred = jnp.min(cand, axis=0, keepdims=True)            # first argmax, TF-style
    return pred, logits_vb


def _kernel(
    # inputs
    emb_ref,          # (Vp, Ke) f32
    wc_ref, ws_ref,   # (Ke, G) int8, (Ke/32, G) f32      G = 3*units
    uc_ref, us_ref,   # (Ku, G) int8, (Ku/32, G) f32
    bias_ref,         # (8, G) f32; rows 0/1 = input/recurrent bias
    dc_ref, ds_ref,   # (Ku, Vp) int8, (Ku/32, Vp) f32
    dbias_ref,        # (Vp, 128) f32; col 0 = dense bias, pad rows NEG
    prompt_ref,       # (Tp, B) int32
    plen_ref,         # (8, B) int32; row 0 = prompt lengths
    # outputs
    toks_ref,         # (Tp, B) int32
    h_out_ref,        # (B, Ku) f32
    # scratch
    w_bf, u_bf, d_bf, proj_bf, h_ref, prev_ref,
    *,
    units: int,
    total_steps: int,
    compute_dtype,
    qtype: str,
    tiled: bool = False,
):
    cd = compute_dtype

    def _setup_weights():
        _dequant_to(wc_ref[:], ws_ref[:], w_bf, cd, qtype)
        _dequant_to(uc_ref[:], us_ref[:], u_bf, cd, qtype)
        _dequant_to(dc_ref[:], ds_ref[:], d_bf, cd, qtype)
        # Vocab-wide input-projection table, computed ONCE during VMEM setup:
        # proj[v] = emb[v] · W. The per-step x-projection then contracts the
        # one-hot over (Vp, G) instead of (Vp, Ke) + (Ke, G) — the same
        # loop-invariant hoist the scan path does (gru_textgen.generate), done
        # the in-kernel way; drops ~1.6 GFLOP/step at the reference shapes.
        proj_bf[:] = jnp.dot(
            emb_ref[:].astype(cd), w_bf[:].astype(cd),
            preferred_element_type=jnp.float32,
        ).astype(cd)

    if tiled:
        # batch-tiled: the weight scratch persists across the sequential
        # grid over batch tiles — build it once, on the first tile (same
        # design as the tiled serving tick below); per-tile state (h, prev)
        # is re-zeroed every grid step since each tile decodes from scratch
        @pl.when(pl.program_id(0) == 0)
        def _():
            _setup_weights()
    else:
        _setup_weights()
    h_ref[:] = jnp.zeros_like(h_ref)
    prev_ref[:] = jnp.zeros_like(prev_ref)

    b = prompt_ref.shape[1]
    vp = emb_ref.shape[0]
    u = units                 # logical units; Ku >= u is the K-padded width
    b0 = bias_ref[0:1, :]
    b1 = bias_ref[1:2, :]
    plen = plen_ref[0:1, :]                               # (1, B)
    dbias_col = dbias_ref[:, 0:1]                         # (Vp, 1)
    sub_v = jax.lax.broadcasted_iota(jnp.int32, (vp, b), 0)

    def body(j, _):
        pj = prompt_ref[pl.ds(j, 1), :]                   # (1, B)
        tok = jnp.where(j < plen, pj, prev_ref[:])        # (1, B)
        toks_ref[pl.ds(j, 1), :] = tok
        pred, _ = _gru_step(
            tok, h_ref, proj_bf, u_bf, d_bf, b0, b1, dbias_col, sub_v,
            units=u, compute_dtype=cd,
        )
        prev_ref[:] = pred
        return 0

    jax.lax.fori_loop(0, total_steps, body, 0)
    h_out_ref[:] = h_ref[:]


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("units", "total_steps", "compute_dtype_name", "qtype",
                     "batch_tile"),
)
def _fused_decode_jit(
    emb, wc, ws, uc, us, bias, dc, ds, dbias, prompt, plen,
    *, units: int, total_steps: int, compute_dtype_name: str, qtype: str = "q8_0",
    batch_tile: int = 0,
):
    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    if qtype == "dense":
        # dense planes enter the kernel at the compute dtype and are used
        # as operand refs directly (no scratch copy)
        wc, uc, dc = wc.astype(cd), uc.astype(cd), dc.astype(cd)
    kdiv = 2 if qtype == "q4_0" else 1  # q4 codes nibble-pack two K rows/row
    tp, b = prompt.shape
    vp, ke = emb.shape
    g = wc.shape[1]
    ku = uc.shape[0] * kdiv  # K-padded state width (>= units)
    tiled = bool(batch_tile) and batch_tile < b
    bt = batch_tile if tiled else b
    if tiled and b % batch_tile:
        raise ValueError(f"batch_tile {batch_tile} must divide padded batch {b}")
    kernel = functools.partial(
        _kernel, units=units, total_steps=total_steps, compute_dtype=cd,
        qtype=qtype, tiled=tiled,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if tiled:
        # sequential grid over batch tiles; weights ride whole in every step
        # (Mosaic keeps the unchanged blocks resident), per-tile operands
        # slice the batch (lane) dim
        grid = (b // bt,)
        whole = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
        colb = lambda rows: pl.BlockSpec((rows, bt), lambda i: (0, i))
        in_specs = [whole(op.shape)
                    for op in (emb, wc, ws, uc, us, bias, dc, ds, dbias)]
        in_specs += [colb(tp), colb(8)]
        out_specs = (colb(tp), pl.BlockSpec((bt, ku), lambda i: (i, 0)))
    else:
        grid = ()
        in_specs = [vmem] * 11
        out_specs = (vmem, vmem)
    toks, h_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((tp, b), jnp.int32),
            jax.ShapeDtypeStruct((b, ku), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ke, g), cd),       # w_bf
            pltpu.VMEM((ku, g), cd),       # u_bf
            pltpu.VMEM((ku, vp), cd),      # d_bf
            pltpu.VMEM((vp, g), cd),       # proj_bf (input-projection table)
            pltpu.VMEM((bt, ku), jnp.float32),  # h
            pltpu.VMEM((1, bt), jnp.int32),     # prev token row
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * total_steps * b * (vp * g + ku * g + ku * vp),
            bytes_accessed=wc.size + uc.size + dc.size + 4 * (tp * b * 2),
            transcendentals=total_steps * b * 3 * units,
        ),
        interpret=_default_interpret(),
    )(emb, wc, ws, uc, us, bias, dc, ds, dbias, prompt, plen)
    return toks, h_out


_FUSABLE_QTYPES = ("q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "q4_k")

# Dense-path plane cache: the in-graph dequant would otherwise re-run on
# EVERY decode call / serving tick (q8_0's in-jit prep is cheap slicing;
# q5_1's is a full unpack+scale of the weights). Keyed by id(params) — the
# params dataclass is unhashable, so a WeakKeyDictionary cannot hold it —
# with a weakref finalizer evicting the entry when the params object dies
# (also guarding against id reuse).
import weakref as _weakref

_DENSE_CACHE = {}
_DEQ_JIT = None  # lazily-built module-level jit so tracing happens once


def _densify(params):
    """Params with each QTensor weight replaced by its dequantized f32
    array, computed once per params object."""
    key = id(params)
    hit = _DENSE_CACHE.get(key)
    if hit is not None:
        return hit
    global _DEQ_JIT
    if _DEQ_JIT is None:
        from ggml_experiments_tpu.quant.pallas_kernels import dequant_in_graph

        _DEQ_JIT = jax.jit(dequant_in_graph)

    def d(x):
        return _DEQ_JIT(x) if isinstance(x, QTensor) else x

    cell = params.cell
    out = dataclasses.replace(
        params,
        cell=dataclasses.replace(
            cell, kernel=d(cell.kernel), recurrent_kernel=d(cell.recurrent_kernel)
        ),
        dense_kernel=d(params.dense_kernel),
    )
    try:
        _weakref.finalize(params, _DENSE_CACHE.pop, key, None)
        _DENSE_CACHE[key] = out
    except TypeError:  # no weakref support: don't risk a stale id-reuse hit
        pass
    return out


def is_fusable_params(params) -> bool:
    """True iff the fused decode kernels can run these GRU params: all three
    weight matrices QTensors of any supported block format (q8_0/q4_0 keep
    their codes quantized in the kernel's VMEM setup; q4_1/q5_0/q5_1/q4_k and
    mixed-qtype params dequantize in-graph and ride the 'dense' plane path)."""
    cell = params.cell
    return (
        isinstance(cell.kernel, QTensor)
        and isinstance(cell.recurrent_kernel, QTensor)
        and isinstance(params.dense_kernel, QTensor)
        and cell.kernel.qtype in _FUSABLE_QTYPES
        and cell.recurrent_kernel.qtype in _FUSABLE_QTYPES
        and params.dense_kernel.qtype in _FUSABLE_QTYPES
    )


def _check_quantized(params) -> str:
    """The kernel-side qtype for these params: 'q8_0'/'q4_0' when all three
    matrices share that format (in-kernel dequant), else 'dense'."""
    if not is_fusable_params(params):
        raise ValueError("the fused decode kernels require block-quantized "
                         "GRU params (q8_0/q4_0/q4_1/q5_0/q5_1; load with "
                         "qtype='q8_0' etc.)")
    qts = {params.cell.kernel.qtype, params.cell.recurrent_kernel.qtype,
           params.dense_kernel.qtype}
    if len(qts) == 1 and qts <= {"q8_0", "q4_0"}:
        return next(iter(qts))
    return "dense"


def _prep_weights(params, kernel_qtype="native"):
    """Kernel-layout weight operands (shared by offline decode and slot tick).

    ``kernel_qtype`` 'dense' replaces each codes plane with the in-graph
    dequantized f32 plane (q4_1/q5_0/q5_1 and mixed-qtype params — one XLA
    dequant per call, negligible next to the decode loop) and the scales
    planes with dummies the kernel never reads; anything else keeps the
    native q8_0/q4_0 codes+scales layout for in-VMEM dequantization."""
    cell = params.cell
    v, e = params.embeddings.shape
    u = cell.recurrent_kernel.shape[0]
    g = 3 * u
    vp = _round_up(v, 128)
    ke = _round_up(e, 32)  # K-padding of the input-projection codes
    emb = jnp.zeros((vp, ke), jnp.float32).at[:v, :e].set(params.embeddings)

    if kernel_qtype == "dense":
        from ggml_experiments_tpu.quant.pallas_kernels import dequant_in_graph

        ku = _round_up(u, 32)

        def plane(qt, k_pad, n_pad):
            # callers _densify() params first (one dequant per params object);
            # raw QTensors still work, at a per-call dequant cost
            w = qt if not isinstance(qt, QTensor) else dequant_in_graph(qt)
            k, n = w.shape
            return jnp.zeros((k_pad, n_pad), jnp.float32).at[:k, :n].set(w)

        wc = plane(cell.kernel, ke, g)
        uc = plane(cell.recurrent_kernel, ku, g)
        dc = plane(params.dense_kernel, ku, vp)
        ws = us = ds = jnp.zeros((1, 128), jnp.float32)  # unread by the kernel
    else:
        def q(qt, n_logical):
            # kernel wants exactly (K, n) codes/scales; QTensor already lane-pads
            return qt.codes[:, :n_logical], qt.scales[:, :n_logical]

        wc, ws = q(cell.kernel, g)
        uc, us = q(cell.recurrent_kernel, g)
        # dense head: pad N (vocab) to vp; QTensor np_ is already >= 128-padded
        dqt = params.dense_kernel
        dc = dqt.codes[:, :vp] if dqt.np_ >= vp else jnp.pad(dqt.codes, ((0, 0), (0, vp - dqt.np_)))
        ds = dqt.scales[:, :vp] if dqt.np_ >= vp else jnp.pad(dqt.scales, ((0, 0), (0, vp - dqt.np_)))

    bias = jnp.zeros((8, g), jnp.float32)
    if cell.bias is not None:
        bias = bias.at[0:2].set(cell.bias)
    dbias_rows = jnp.full((vp,), NEG, jnp.float32).at[:v].set(
        params.dense_bias if params.dense_bias is not None else jnp.zeros((v,))
    )
    dbias = jnp.zeros((vp, 128), jnp.float32).at[:, 0].set(dbias_rows)
    return (emb, wc, ws, uc, us, bias, dc, ds, dbias), (v, e, u, g, vp)


# Measured VMEM boundary of the UNTILED offline decode kernel. The serving
# tick's 3584/3712 boundaries do NOT transfer: at T=512 the offline kernel's
# B=3584 compile fails with a scoped-VMEM stack OOM (110.38M vs the 100M
# limit — bench.py round 4; the per-slot cost is dominated by the ~27KB/slot
# (B, 3U) f32 gate intermediates, so it is nearly T-independent), while
# B=2048/T=512 compiles with ~30M headroom. 2048 is also the best-measured
# tile width, so past it the kernel grid-tiles at no throughput cost
# (B=8192: 25.05M tok/s, above the untiled tick's own sweet spot).
FUSED_DECODE_MAX_UNTILED = {"q8_0": 2048, "q4_0": 2048, "dense": 2048}


def _auto_tile(bp: int, limit: int) -> int:
    """0 (untiled) at/below the VMEM boundary, else the LARGEST 128-multiple
    tile <= limit that divides the padded batch (e.g. bp=3840 with limit
    2048 tiles at 1920, not the ladder-of-powers-of-two's 256 — narrow
    tiles pay the fused kernel's per-step fixed cost many times over)."""
    if bp <= limit:
        return 0
    for tile in range(min(limit, bp) // 128 * 128, 0, -128):
        if bp % tile == 0:
            return tile
    raise ValueError(f"no boundary-safe tile divides {bp}")


def _decode_tile_limit(qtype: str, total_steps: int) -> int:
    """Slot-width limit for one VMEM block of the offline kernel, as a
    function of decode length. VMEM model fit to the measured T=512 points
    (B=2048 compiles with ~30M headroom; B=3584 OOMs scoped VMEM at
    110.38M against the 100M budget): ~26KB/slot of f32 gate
    intermediates + 8*Tp bytes/slot of i32 prompt+token rows against an
    ~86M usable budget. At T<=512 this returns the measured 2048; longer
    decodes shrink the tile so "any B compiles" stays true at any T."""
    tp = _round_up(total_steps, 8)
    base = FUSED_DECODE_MAX_UNTILED.get(qtype, 2048)
    fit = int(86e6 / (26_000 + 8 * tp)) // 128 * 128
    return max(128, min(base, fit))


def fused_gru_decode(
    params,
    prompt_ids: jax.Array,      # (B, P) int32
    prompt_lengths: jax.Array,  # (B,) int32
    total_steps: int,
    *,
    compute_dtype=jnp.bfloat16,
    batch_tile=None,
) -> jax.Array:
    """Greedy decode via the persistent kernel. Semantics identical to
    models/gru_textgen.generate(temperature=0): returns (B, total_steps)
    tokens (prompt prefix + generated continuation).

    Requires Q8_0- or Q4_0-quantized cell/dense kernels (the serving
    configurations); all three weight matrices must share one qtype. Q4_0
    nibbles are unpacked once during the kernel's VMEM weight setup, so the
    per-step loop is identical to Q8_0's.

    ``batch_tile``: None (default) auto-tiles the batch dim once the padded
    batch exceeds the kernel's measured VMEM boundary (so any B compiles, at
    per-tile throughput); an int forces that tile width; 0 forces untiled.
    """
    qtype = _check_quantized(params)
    if qtype == "dense":
        params = _densify(params)  # one dequant per params object, cached
    b, p = prompt_ids.shape
    (emb, wc, ws, uc, us, bias, dc, ds, dbias), (v, e, u, g, vp) = _prep_weights(params, qtype)

    bp = _round_up(b, 128)   # B is a lane dim for the token rows
    tp = _round_up(total_steps, 8)
    prompt = jnp.zeros((tp, bp), jnp.int32)
    prompt = prompt.at[: min(p, tp), :b].set(prompt_ids[:, :tp].swapaxes(0, 1))
    plen = jnp.zeros((8, bp), jnp.int32).at[0, :b].set(prompt_lengths)

    if batch_tile is None:
        batch_tile = _auto_tile(bp, _decode_tile_limit(qtype, total_steps))
    toks, _ = _fused_decode_jit(
        emb, wc, ws, uc, us, bias, dc, ds, dbias, prompt, plen,
        units=u,
        total_steps=total_steps,
        compute_dtype_name="bfloat16" if compute_dtype == jnp.bfloat16 else "float32",
        qtype=qtype,
        batch_tile=batch_tile,
    )
    return toks[:total_steps, :b].swapaxes(0, 1)


# ---------------------------------------------------------------------------
# Resumable slot tick: the serving engine's inner loop on the fused kernel
# ---------------------------------------------------------------------------

def _hash_bits_u32(seed, j, shape, slot0=None):
    """Stateless splitmix-style 32-bit hash lattice over (row, col) — the
    interpret-mode stand-in for ``pltpu.prng_random_bits`` (which has no
    interpret lowering). Distinct (seed, step, row, col[, slot0]) tuples map
    to decorrelated bits — ``slot0`` (a block's first global slot index)
    enters as its own hashed operand, mirroring the TPU path's two-operand
    ``pltpu.prng_seed(seed, slot0)`` (a linear seed+slot0*c fold would make
    (slot0=s, step t) collide with (slot0=s+k, step t-ck)). This is NOT the
    TPU hardware stream and is not meant to match it: sample streams are
    layout-dependent by contract (the tick docstring), only the per-step
    *distribution* is pinned."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + j.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
         + r * jnp.uint32(0xC2B2AE35) + c * jnp.uint32(0x27D4EB2F))
    if slot0 is not None:
        # avalanche BEFORE folding slot0 in: adding it to the still-linear
        # base would just be another linear term (the collision family the
        # round-4 advisor flagged); hashing first leaves no (j, slot0)
        # lattice structure to collide along
        x = x ^ (x >> jnp.uint32(13))
        x = x * jnp.uint32(0xD168AAAD)
        x = x + slot0.astype(jnp.uint32) * jnp.uint32(0x165667B1)
    for mult in (0x2C1B3C6D, 0x297A2D39):
        x = x ^ (x >> jnp.uint32(15))
        x = x * jnp.uint32(mult)
    x = x ^ (x >> jnp.uint32(16))
    # int32 bit pattern: what pltpu.prng_random_bits' consumer shifts
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _filter_topk_vb(s, k, b):
    """In-kernel top-k mask on (Vp, B) temperature-scaled logits.

    Matches ops/sampling.apply_top_k: threshold = k-th largest per slot
    (counting duplicates), kept iff ``>=`` it (boundary ties all kept).
    The threshold comes from k iterations of extract-max-and-mask — k is a
    STATIC engine config, typically << vocab, and each iteration is one
    sublane reduction; the VPU work rides in the shadow of the step's MXU
    dots like the rest of the sampling math."""

    def body(_, carry):
        thr, cnt, cur = carry
        m = jnp.max(cur, axis=0, keepdims=True)             # (1, B)
        thr = jnp.where(cnt < k, m, thr)
        tied = cur == m
        cnt = cnt + jnp.sum(tied.astype(jnp.int32), axis=0, keepdims=True)
        cur = jnp.where(tied, NEG, cur)
        return thr, cnt, cur

    thr0 = jnp.full((1, b), NEG, jnp.float32)
    cnt0 = jnp.zeros((1, b), jnp.int32)
    thr, _, _ = jax.lax.fori_loop(0, k, body, (thr0, cnt0, s))
    return jnp.where(s >= thr, s, NEG)


def _filter_topp_vb(s, p, vocab, b):
    """In-kernel nucleus (top-p) mask on (Vp, B) scaled logits.

    Matches ops/sampling.apply_top_p: softmax over the (possibly already
    top-k-masked) set, keep the descending-order prefix whose cumulative
    mass BEFORE each token is < p (the argmax always survives). Runs as a
    ``vocab``-iteration descending extraction; exact ties at the p boundary
    are kept as a group (the sort-based scan path splits them by index
    order — a measure-zero divergence on real logits, documented in
    fused_slot_tick)."""
    mx = jnp.max(s, axis=0, keepdims=True)
    live = s > NEG * 0.5
    e = jnp.where(live, jnp.exp(s - mx), 0.0)
    target = p * jnp.sum(e, axis=0, keepdims=True)          # unnormalized

    def body(_, carry):
        thr, cum, cur = carry
        m = jnp.max(cur, axis=0, keepdims=True)
        tied = cur == m
        grp = jnp.sum(jnp.where(tied, e, 0.0), axis=0, keepdims=True)
        thr = jnp.where((cum < target) & (m > NEG * 0.5), m, thr)
        cum = cum + grp
        cur = jnp.where(tied, NEG, cur)
        return thr, cum, cur

    thr0 = jnp.full((1, b), NEG, jnp.float32)
    cum0 = jnp.zeros((1, b), jnp.float32)
    thr, _, _ = jax.lax.fori_loop(0, vocab, body, (thr0, cum0, s))
    return jnp.where(s >= thr, s, NEG)


def _tick_kernel(
    # inputs (weights as in _kernel, then per-slot state; with sampling two
    # extra operands follow h: ftemp (8, B) f32 and seed (1,) int32 in SMEM)
    *refs,
    units: int,
    inner_steps: int,
    compute_dtype,
    qtype: str,
    enable_sampling: bool = False,
    top_k: int = 0,
    top_p: float = 0.0,
    vocab: int = 0,
    tiled: bool = False,
    interp_prng: bool = False,
):
    """One serving tick: advance every slot ``inner_steps`` tokens, resuming
    from (h, prev, pos) and honouring per-slot prompt/total cursors.

    Same VMEM-resident design as :func:`_kernel` with two twists:

    * per-slot *prompt* feeding reads ``prompt[pos[b], b]`` — a per-lane
      dynamic row index, which Mosaic cannot slice — as a masked sublane
      reduction (``sum(prompt * (iota == pos))``), O(Pp) VPU work per step;
    * per-slot activity masks are needed in BOTH layouts: row (1, B) for the
      token stream and column (B, 1) for the state rows. Rather than
      transposing across lanes each step, pos/total are carried in both
      layouts (srow/scol scratch) and updated with identical arithmetic.

    ``enable_sampling`` adds per-slot temperature sampling via the on-core
    PRNG and the Gumbel-argmax identity (categorical(softmax(l/t)) ==
    argmax(l/t + gumbel)): the (Vp, B) noise never exists outside VMEM and
    the sampled argmax reuses the greedy min-index reduction. temp <= 0
    slots stay exactly greedy. ``interp_prng`` swaps pltpu.prng_* (no
    interpret lowering) for a stateless hash lattice so the sampled tick —
    including its slot-sharded multi-process form — runs under the Pallas
    interpreter on simulated CPU meshes; the two streams differ but both
    draw the pinned per-step distribution.
    """
    (emb_ref, wc_ref, ws_ref, uc_ref, us_ref, bias_ref, dc_ref, ds_ref,
     dbias_ref, prompt_ref, srow_in_ref, scol_in_ref, h_in_ref) = refs[:13]
    n_in = 15 if enable_sampling else 13
    if enable_sampling:
        ftemp_ref, seed_ref = refs[13:15]
    toks_ref, srow_out_ref, h_out_ref = refs[n_in:n_in + 3]
    w_bf, u_bf, d_bf, proj_bf, h_ref, srow_ref, scol_ref = refs[n_in + 3:]
    cd = compute_dtype
    if enable_sampling:
        # mix the tick seed with this block's first GLOBAL slot index
        # (srow row 4, stamped by _fused_slot_tick_jit): every slot tile of
        # the sequential grid AND every shard of a slot-partitioned tick
        # draws a distinct sample stream. A bare replicated seed would
        # replay identical Gumbel noise across tiles/shards — the round-3
        # reason sampled multi-process serving was forced onto the scan.
        slot0 = jnp.min(srow_in_ref[4:5, :])
        if not interp_prng:
            pltpu.prng_seed(seed_ref[0], slot0)

    def _setup_weights():
        _dequant_to(wc_ref[:], ws_ref[:], w_bf, cd, qtype)
        _dequant_to(uc_ref[:], us_ref[:], u_bf, cd, qtype)
        _dequant_to(dc_ref[:], ds_ref[:], d_bf, cd, qtype)
        proj_bf[:] = jnp.dot(
            emb_ref[:].astype(cd), w_bf[:].astype(cd),
            preferred_element_type=jnp.float32,
        ).astype(cd)

    if tiled:
        # weight scratch persists across the sequential grid: dequantize +
        # build the projection table once, on the first slot tile only
        @pl.when(pl.program_id(0) == 0)
        def _():
            _setup_weights()
    else:
        _setup_weights()
    h_ref[:] = h_in_ref[:]
    srow_ref[:] = srow_in_ref[:]
    scol_ref[:] = scol_in_ref[:]

    pp, b = prompt_ref.shape
    vp = emb_ref.shape[0]
    u = units
    b0 = bias_ref[0:1, :]
    b1 = bias_ref[1:2, :]
    dbias_col = dbias_ref[:, 0:1]                         # (Vp, 1)
    sub_v = jax.lax.broadcasted_iota(jnp.int32, (vp, b), 0)
    sub_p = jax.lax.broadcasted_iota(jnp.int32, (pp, b), 0)

    def body(j, _):
        prev = srow_ref[0:1, :]
        pos = srow_ref[1:2, :]
        total = srow_ref[2:3, :]
        plen = srow_ref[3:4, :]
        active = pos < total                              # (1, B)
        # prompt[pos[b], b] as a masked sublane reduction
        pcur = jnp.sum(
            jnp.where(sub_p == pos, prompt_ref[:], 0), axis=0, keepdims=True
        )                                                 # (1, B)
        tok = jnp.where(pos < plen, pcur, prev)
        toks_ref[pl.ds(j, 1), :] = tok
        # column-layout activity mask for the (B, Ku) state rows
        active_col = scol_ref[:, 0:1] < scol_ref[:, 1:2]  # (B, 1)
        pred, logits_vb = _gru_step(
            tok, h_ref, proj_bf, u_bf, d_bf, b0, b1, dbias_col, sub_v,
            units=u, compute_dtype=cd, active_col=active_col,
        )
        if enable_sampling:
            temp = ftemp_ref[0:1, :]                      # (1, B)
            inv_t = 1.0 / jnp.maximum(temp, 1e-6)
            if interp_prng:
                bits = _hash_bits_u32(seed_ref[0], j, (vp, b), slot0=slot0)
            else:
                bits = pltpu.prng_random_bits((vp, b))
            # 23-bit uniforms: (k + 0.5) * 2^-23 for k < 2^23 is EXACT in f32
            # and strictly inside (0, 1). 24 bits would hit u01 == 1.0 with
            # p = 2^-24 per draw (16777215.5 rounds-to-even to 2^24), making
            # the Gumbel +inf so a NEG pad row wins argmax — observed ~1 in
            # 26M draws as an out-of-vocab token before this was tightened.
            u01 = (
                jax.lax.shift_right_logical(bits, 9).astype(jnp.int32).astype(jnp.float32)
                + 0.5
            ) * (1.0 / (1 << 23))                         # (0, 1) exclusive
            gumbel = -jnp.log(-jnp.log(u01))
            scaled = logits_vb * inv_t
            # static top-k / top-p filtering, in-VMEM (engine-level config,
            # like the scan tick's): masked entries drop to NEG so the
            # Gumbel-argmax below never picks them
            if top_k:
                scaled = _filter_topk_vb(scaled, min(top_k, vocab or vp), b)
            if top_p:
                scaled = _filter_topp_vb(scaled, top_p, vocab or vp, b)
            scored = scaled + gumbel                      # NEG pad rows never win
            ms = jnp.max(scored, axis=0, keepdims=True)
            cand_s = jnp.where(scored == ms, sub_v, jnp.int32(2**30))
            sampled = jnp.min(cand_s, axis=0, keepdims=True)
            pred = jnp.where(temp > 0.0, sampled, pred)

        srow_ref[0:1, :] = jnp.where(active, pred, prev)
        srow_ref[1:2, :] = pos + active.astype(jnp.int32)
        scol_ref[:, 0:1] = scol_ref[:, 0:1] + active_col.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, inner_steps, body, 0)
    toks_pad = toks_ref.shape[0]
    if toks_pad > inner_steps:
        toks_ref[pl.ds(inner_steps, toks_pad - inner_steps), :] = jnp.zeros(
            (toks_pad - inner_steps, b), jnp.int32
        )
    srow_out_ref[:] = srow_ref[:]
    h_out_ref[:] = h_ref[:]


def _tick_call(
    *operands,
    units: int, inner_steps: int, compute_dtype, qtype: str,
    enable_sampling: bool, top_k: int = 0, top_p: float = 0.0,
    vocab: int = 0, slot_tile: int = 0,
):
    """The raw tick pallas_call on final-layout operands (local shapes).

    ``slot_tile`` > 0 runs the tick as a sequential grid over slot tiles of
    that width: the weight scratch (dequantized planes + projection table)
    persists across grid steps and is built once, while each step carries
    only its tile's state/tokens in VMEM — so the slot count stops being
    VMEM-bounded (the untiled kernel tops out at the capacity-probe
    boundary) at the cost of one extra grid iteration per tile. 0 = untiled
    (single-block, the fastest form below the boundary).
    """
    cd = compute_dtype
    kdiv = 2 if qtype == "q4_0" else 1
    if qtype == "dense":
        # dense planes enter the kernel at the compute dtype and are used
        # as operand refs directly (no scratch copy — see _kernel)
        operands = list(operands)
        for i in (1, 3, 6):
            operands[i] = operands[i].astype(cd)
        operands = tuple(operands)
    emb, wc, uc, dc = operands[0], operands[1], operands[3], operands[6]
    prompt = operands[9]
    pp, b = prompt.shape
    vp, ke = emb.shape
    g = wc.shape[1]
    ku = uc.shape[0] * kdiv
    ts = _round_up(inner_steps, 8)
    tiled = bool(slot_tile) and slot_tile < b
    bt = slot_tile if tiled else b
    if tiled and b % slot_tile:
        raise ValueError(f"slot_tile {slot_tile} must divide padded slots {b}")
    kernel = functools.partial(
        _tick_kernel, units=units, inner_steps=inner_steps, compute_dtype=cd,
        qtype=qtype, enable_sampling=enable_sampling,
        top_k=top_k, top_p=top_p, vocab=vocab, tiled=tiled,
        interp_prng=_default_interpret(),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if tiled:
        grid = (b // bt,)
        whole = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
        colb = lambda rows: pl.BlockSpec((rows, bt), lambda i: (0, i))
        rowb = lambda cols: pl.BlockSpec((bt, cols), lambda i: (i, 0))
        in_specs = [whole(op.shape) for op in operands[:9]]
        in_specs += [colb(pp), colb(8), rowb(128), rowb(ku)]
        if enable_sampling:
            in_specs += [colb(8), pl.BlockSpec(memory_space=pltpu.SMEM)]
        out_specs = (colb(ts), colb(8), rowb(ku))
    else:
        grid = ()
        in_specs = [vmem] * 13
        if enable_sampling:
            in_specs += [vmem, pl.BlockSpec(memory_space=pltpu.SMEM)]
        out_specs = (vmem, vmem, vmem)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((ts, b), jnp.int32),
            jax.ShapeDtypeStruct((8, b), jnp.int32),
            jax.ShapeDtypeStruct((b, ku), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ke, g), cd),       # w_bf
            pltpu.VMEM((ku, g), cd),       # u_bf
            pltpu.VMEM((ku, vp), cd),      # d_bf
            pltpu.VMEM((vp, g), cd),            # proj_bf
            pltpu.VMEM((bt, ku), jnp.float32),  # h
            pltpu.VMEM((8, bt), jnp.int32),     # srow (prev/pos/total/plen)
            pltpu.VMEM((bt, 128), jnp.int32),   # scol (pos/total, column layout)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * inner_steps * b * (vp * g + ku * g + ku * vp),
            bytes_accessed=wc.size + uc.size + dc.size + 4 * (ts * b + b * ku),
            transcendentals=inner_steps * b * 3 * units,
        ),
        interpret=_default_interpret(),
    )(*operands)


# Measured VMEM boundaries of the UNTILED serving tick per qtype
# (tools/capacity_probe.py, v5e round 4): q8_0 compiles through B=3712 and
# fails at 3840 (remote tpu_compile_helper exit 1, ~45 s fail-fast); q4_0
# compiles through 3584, fails at 3840/4096, and its 3712 compile ran past
# 1800 s (near-boundary compile blowup — treated as out of bounds). Above
# these the auto policy grid-tiles the slot dim.
FUSED_TICK_MAX_UNTILED = {"q8_0": 3712, "q4_0": 3584}
TICK_SLOT_TILE = 2048   # the measured-fast tile width (docs reference; the
                        # auto policy picks the largest boundary-safe divisor)


def _auto_slot_tile(bp: int, qtype: str, inner_steps: int = 128) -> int:
    """0 (untiled) below the measured VMEM boundary, else the widest
    boundary-safe tile that divides the padded slot count. The boundaries
    were measured at inner_steps=128; longer ticks grow the per-slot token
    buffers, so past 256 inner steps the limit falls back to the
    always-safe 2048 (the offline kernel's measured T=512 boundary)."""
    limit = FUSED_TICK_MAX_UNTILED.get(qtype, 2048)
    if inner_steps > 256:
        limit = min(limit, 2048)
    return _auto_tile(bp, limit)


def _tick_slot_axis(arg_shapes):
    """The mesh axis the slot dim is sharded over (prompt dim 1 / h dim 0)."""
    from jax.sharding import NamedSharding

    for idx, dim in ((9, 1), (12, 0), (11, 0), (10, 1)):
        s = arg_shapes[idx].sharding
        if isinstance(s, NamedSharding) and len(s.spec) > dim and s.spec[dim] is not None:
            return s.spec[dim]
    return None


@functools.lru_cache(maxsize=None)
def _tick_partitioned(units, inner_steps, compute_dtype_name, qtype,
                      enable_sampling, slot_tile=None, top_k=0, top_p=0.0,
                      vocab=0):
    """Slot-parallel rule for the serving tick: under a sharded jit the slot
    (batch) axis stays local per device — each device ticks only its own
    slots with replicated weights — instead of XLA gathering every operand
    and running the kernel replicated on all devices (the same failure mode
    the qmatmul/flash/train kernels guard against). Weights and all per-slot
    layout dims must be whole per device; only the slot axis shards.

    This is what lets multi-process DecodeEngines route through the fused
    tick (VERDICT r2 #5): state enters replicated, a sharding constraint in
    _fused_slot_tick_jit slices it per shard, each process's devices tick
    their local slots, and the (small, uint8-packable) outputs all-gather
    back to the replicated layout the engine's host loop reads."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    cd = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32

    def core(*ops):
        # tile from the LOCAL slot width (under slot-sharding each device
        # ticks only its shard; the tile decision must match that shape)
        b_local = ops[9].shape[1]
        st = (_auto_slot_tile(b_local, qtype, inner_steps)
              if slot_tile is None else slot_tile)
        return _tick_call(
            *ops, units=units, inner_steps=inner_steps, compute_dtype=cd,
            qtype=qtype, enable_sampling=enable_sampling, slot_tile=st,
            top_k=top_k, top_p=top_p, vocab=vocab,
        )

    def infer(mesh, arg_shapes, result_shape):
        b_ax = _tick_slot_axis(arg_shapes)
        colb = NamedSharding(mesh, P(None, b_ax))
        return (colb, colb, NamedSharding(mesh, P(b_ax, None)))

    def partition(mesh, arg_shapes, result_shape):
        b_ax = _tick_slot_axis(arg_shapes)
        rep2 = NamedSharding(mesh, P(None, None))
        colb = NamedSharding(mesh, P(None, b_ax))   # (x, B) layouts
        rowb = NamedSharding(mesh, P(b_ax, None))   # (B, x) layouts
        in_sh = [rep2] * 9 + [colb, colb, rowb, rowb]
        if enable_sampling:
            in_sh += [colb, NamedSharding(mesh, P(None))]
        return mesh, core, (colb, colb, rowb), tuple(in_sh)

    fn = custom_partitioning(core)
    weights = "v e, k0 g, s0 g, k1 g, s1 g, r0 g, k2 w, s2 w, v2 x"
    state_in = "p b, r1 b, b c0, b k3"
    rule = f"{weights}, {state_in}"
    repl = ["v", "e", "k0", "g", "s0", "k1", "s1", "r0", "k2", "w", "s2",
            "v2", "x", "p", "r1", "c0", "k3"]
    if enable_sampling:
        rule += ", r2 b, i"
        # sdy requires need_replication factors sorted by first-appearance
        # index: r2/i enter in the operand list, before the output-only t
        repl += ["r2", "i"]
    repl += ["t"]
    rule += " -> t b, r1 b, b k3"
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(repl),
    )
    return fn


@functools.partial(
    jax.jit,
    static_argnames=("units", "inner_steps", "compute_dtype_name", "qtype",
                     "enable_sampling", "slot_tile", "top_k", "top_p", "vocab"),
)
def _fused_tick_jit(
    emb, wc, ws, uc, us, bias, dc, ds, dbias, prompt, srow, scol, h,
    ftemp=None, seed=None,
    *, units: int, inner_steps: int, compute_dtype_name: str, qtype: str = "q8_0",
    enable_sampling: bool = False, slot_tile=None, top_k: int = 0,
    top_p: float = 0.0, vocab: int = 0,
):
    operands = [emb, wc, ws, uc, us, bias, dc, ds, dbias, prompt, srow, scol, h]
    if enable_sampling:
        operands += [ftemp, seed]
    return _tick_partitioned(
        units, inner_steps, compute_dtype_name, qtype, enable_sampling,
        slot_tile, top_k, top_p, vocab,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("inner_steps", "compute_dtype_name", "qtype",
                     "enable_sampling", "mesh", "slot_axis", "slot_tile",
                     "top_k", "top_p"),
    donate_argnames=("state",),
)
def _fused_slot_tick_jit(params, state, seed, *, inner_steps, compute_dtype_name,
                         qtype, enable_sampling, mesh=None, slot_axis=None,
                         slot_tile=None, top_k=0, top_p=0.0):
    """One-dispatch tick: weight prep + layout glue + kernel + state repack
    all inside a single jitted program (the glue is on-device-cheap; eagerly
    it would cost a tunnel dispatch per op).

    ``mesh``/``slot_axis`` (static): shard the kernel's slot dim over that
    mesh axis — the padded per-slot operands are sliced per shard (free: the
    engine's state is replicated), each device ticks only its local slots
    via _tick_partitioned's rule, and the outputs constrain back to
    replicated so the engine's host loop (np.asarray readbacks, cursor
    shadow) is untouched. None = replicated execution on every device."""
    (emb, wc, ws, uc, us, bias, dc, ds, dbias), (v, e, u, g, vp) = _prep_weights(params, qtype)
    b, p = state.prompt.shape
    bp = _round_up(b, 128)
    pp = _round_up(p, 8)
    ku = uc.shape[0] * (2 if qtype == "q4_0" else 1)

    prompt = jnp.zeros((pp, bp), jnp.int32).at[:p, :b].set(state.prompt.swapaxes(0, 1))
    srow = jnp.zeros((8, bp), jnp.int32)
    srow = srow.at[0, :b].set(state.prev).at[1, :b].set(state.pos)
    srow = srow.at[2, :b].set(state.total).at[3, :b].set(state.plen)
    # row 4: global slot index — each tile/shard block carries its own slot
    # offset, the kernel's per-block PRNG decorrelator (see _tick_kernel)
    srow = srow.at[4, :].set(jnp.arange(bp, dtype=jnp.int32))
    scol = jnp.zeros((bp, 128), jnp.int32)
    scol = scol.at[:b, 0].set(state.pos).at[:b, 1].set(state.total)
    h = jnp.zeros((bp, ku), jnp.float32).at[:b, :u].set(state.h)

    extra = {}
    if enable_sampling:
        extra = dict(
            ftemp=jnp.zeros((8, bp), jnp.float32).at[0, :b].set(state.temp),
            seed=jnp.reshape(seed.astype(jnp.int32), (1,)),
        )
    if mesh is not None and slot_axis is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        colb = NamedSharding(mesh, P(None, slot_axis))
        rowb = NamedSharding(mesh, P(slot_axis, None))
        prompt = jax.lax.with_sharding_constraint(prompt, colb)
        srow = jax.lax.with_sharding_constraint(srow, colb)
        scol = jax.lax.with_sharding_constraint(scol, rowb)
        h = jax.lax.with_sharding_constraint(h, rowb)
        if enable_sampling:
            extra["ftemp"] = jax.lax.with_sharding_constraint(extra["ftemp"], colb)
    toks, srow_out, h_out = _fused_tick_jit(
        emb, wc, ws, uc, us, bias, dc, ds, dbias, prompt, srow, scol, h,
        units=u, inner_steps=inner_steps,
        compute_dtype_name=compute_dtype_name, qtype=qtype,
        enable_sampling=enable_sampling, slot_tile=slot_tile,
        top_k=top_k, top_p=top_p, vocab=v, **extra,
    )
    if mesh is not None and slot_axis is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        toks = jax.lax.with_sharding_constraint(toks, repl)
        srow_out = jax.lax.with_sharding_constraint(srow_out, repl)
        h_out = jax.lax.with_sharding_constraint(h_out, repl)
    new_state = dataclasses.replace(
        state,
        h=h_out[:b, :u],
        prev=srow_out[0, :b],
        pos=srow_out[1, :b],
    )
    toks = toks[:inner_steps, :b].swapaxes(0, 1)
    if v <= 255:
        toks = toks.astype(jnp.uint8)  # same wire-size trick as the scan tick
    return new_state, toks


def fused_slot_tick(params, state, inner_steps: int, *, compute_dtype=jnp.bfloat16,
                    enable_sampling: bool = False, seed=0,
                    mesh=None, slot_axis=None, slot_tile=None,
                    top_k=None, top_p=None):
    """Advance the serving engine's slot state ``inner_steps`` tokens
    through the persistent kernel.

    Drop-in device path for ``DecodeEngine``'s scan tick (serving/engine.py
    ``_slot_scan``): takes and returns the engine's ``SlotState`` plus the
    (B, inner_steps) tokens fed at each step, uint8-packed when the vocab
    allows, matching the scan tick's readback contract. Greedy is
    token-exact with the scan tick at matched compute dtype (tested).

    ``enable_sampling=True`` samples slots with ``state.temp > 0`` at their
    temperature via in-kernel Gumbel-argmax (on-core PRNG on real TPUs; a
    stateless hash lattice under the Pallas interpreter, where pltpu.prng_*
    has no lowering; temp <= 0 slots stay exactly greedy). ``top_k`` /
    ``top_p`` (engine-level static config, like the scan tick's) filter the
    sampled distribution IN-KERNEL: the temperature-scaled logits are
    masked to NEG before the Gumbel draw, with semantics matching
    ops/sampling.apply_top_k/apply_top_p (threshold-by-extraction in VMEM;
    the one divergence is exact float ties straddling the nucleus boundary,
    which the kernel keeps as a group while the sort-based path splits by
    index — measure-zero on real logits). ``seed`` reseeds
    the PRNG per tick — pass the engine's deterministic tick seed; each
    slot tile and each slot shard mixes in its first global slot index, so
    tiled/sharded streams stay decorrelated. The sample stream differs from
    the scan tick's jax.random stream (and is layout-dependent: tiling or
    sharding the slot dim re-draws it); every variant samples the same
    per-step distribution, and a given (config, seed) replays exactly.

    ``mesh``/``slot_axis``: shard the tick's slot dim over that mesh axis
    (each device ticks only its local slots; outputs return replicated) —
    the multi-process serving path. The padded slot count must divide the
    axis; on real TPUs each shard must keep a lane-aligned (128-multiple)
    slot width, so use n_slots >= 128 * axis_size.

    ``slot_tile``: None (default) auto-tiles the kernel's slot dim once the
    (local) slot count crosses the measured untiled VMEM boundary
    (FUSED_TICK_MAX_UNTILED) — weights/projection-table scratch persist
    across the sequential grid and are built once, so slot capacity is no
    longer VMEM-bounded. 0 forces the untiled single-block kernel (compile
    error past the boundary); an explicit int forces that tile width.
    """
    qtype = _check_quantized(params)
    if qtype == "dense":
        params = _densify(params)  # one dequant per params object, cached
    if top_k is not None and top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    if top_p is not None and not 0.0 < top_p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    if slot_axis is not None:
        if mesh is None or slot_axis not in mesh.axis_names:
            raise ValueError(f"slot_axis={slot_axis!r} requires a mesh with "
                             f"that axis")
        n = mesh.shape[slot_axis]
        bp = _round_up(state.prompt.shape[0], 128)
        if bp % n:
            raise ValueError(f"padded slot count {bp} not divisible by "
                             f"{slot_axis} axis size {n}")
    import numpy as _np

    # seed stays a host scalar: it enters the jit uncommitted (identical on
    # every host by the engine's deterministic tick counter), which is what
    # lets it join a multi-process global computation — a process-local
    # device array here would poison the SPMD program.
    return _fused_slot_tick_jit(
        params, state, _np.int32(seed), inner_steps=inner_steps,
        compute_dtype_name="bfloat16" if compute_dtype == jnp.bfloat16 else "float32",
        qtype=qtype, enable_sampling=enable_sampling,
        mesh=mesh, slot_axis=slot_axis, slot_tile=slot_tile,
        top_k=int(top_k or 0), top_p=float(top_p or 0.0),
    )

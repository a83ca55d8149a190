"""TF-variant GRU cell (reset-after, dual bias rows) — batched, scan-ready.

The compute core of the reference's ``gru_forward``
(/root/reference/rnn_text_gen/rnn_text_generation.cpp:186-263), which mirrors
``tf.keras.layers.GRU`` defaults (activation=tanh, recurrent_activation=
sigmoid, reset_after=True). Weight shapes follow the TF export
(rnn_text_generation.py:104-115 header comment, .cpp:13-20):

* ``kernel``            (embed_dim, 3*units)   gate order [z | r | h]
* ``recurrent_kernel``  (units, 3*units)
* ``bias``              (2, 3*units)           row 0 input bias, row 1 recurrent

Differences from the reference by design: true sigmoid (not the NaN-at-0
``silu(x)/x`` trick, .cpp:51-55), a batch dimension from day one, and the two
gate matmuls run through :func:`linear` so kernels may be QTensors (fused
dequant+matmul). The decode loop lives in models/gru_textgen.py as a
``jax.lax.scan`` — state stays in HBM, never memcpy'd through the host as in
the reference (.cpp:305-310).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ggml_experiments_tpu.ops.linear import Weight, linear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GRUCellParams:
    kernel: Weight             # (E, 3U)
    recurrent_kernel: Weight   # (U, 3U)
    bias: Optional[jax.Array]  # (2, 3U) or None

    @property
    def units(self) -> int:
        k = self.recurrent_kernel
        n = k.shape[1] if hasattr(k, "ndim") else k.n
        return n // 3


def gru_combine(mx: jax.Array, mh: jax.Array, h: jax.Array) -> jax.Array:
    """Gate math given the two biased projections mx = x·W + b0, mh = h·U + b1.

    Split out of the cell so callers can source ``mx`` from a precomputed
    projection (a vocab-sized table gather during decode, or one whole-
    sequence matmul during training) instead of a per-step matmul.
    """
    u = h.shape[-1]
    z = jax.nn.sigmoid(mx[..., :u] + mh[..., :u])
    r = jax.nn.sigmoid(mx[..., u : 2 * u] + mh[..., u : 2 * u])
    # reset-after: r gates the *projected* recurrent term
    hh = jnp.tanh(mx[..., 2 * u :] + r * mh[..., 2 * u :])
    return z * h + (1.0 - z) * hh


def recurrent_projection(
    p: GRUCellParams, h: jax.Array, *, compute_dtype=jnp.float32
) -> jax.Array:
    b_rec = p.bias[1] if p.bias is not None else None
    return linear(h, p.recurrent_kernel, b_rec, compute_dtype=compute_dtype)


def input_projection(
    p: GRUCellParams, x: jax.Array, *, compute_dtype=jnp.float32
) -> jax.Array:
    b_in = p.bias[0] if p.bias is not None else None
    return linear(x, p.kernel, b_in, compute_dtype=compute_dtype)


def gru_cell(
    p: GRUCellParams, x: jax.Array, h: jax.Array, *, compute_dtype=jnp.float32
) -> jax.Array:
    """One step. x: (B, E), h: (B, U) -> new h (B, U).

    ``compute_dtype=jnp.bfloat16`` runs the two gate matmuls single-pass on
    the MXU (the fast serving config); float32 uses full-precision passes
    (parity with the fp32 reference model). Gate math stays f32 either way.
    """
    mx = input_projection(p, x, compute_dtype=compute_dtype)       # (B, 3U)
    mh = recurrent_projection(p, h, compute_dtype=compute_dtype)   # (B, 3U)
    return gru_combine(mx, mh, h)


def _use_fused_train(p: GRUCellParams, fused) -> bool:
    """Fused training kernel dispatch: explicit override, else auto on TPU
    for float (non-QTensor) weights whose gate splits are lane-aligned."""
    if fused is not None:
        return fused
    if not isinstance(p.recurrent_kernel, jax.Array):
        return False
    u = p.units
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu and u % 128 == 0 and p.bias is not None


def gru_sequence_time_major(
    p: GRUCellParams,
    xs_tm: jax.Array,
    h0: jax.Array,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
    fused: Optional[bool] = None,
):
    """Time-major training forward: xs_tm (T, B, E) -> (ys (T, B, U), h_last).

    Time-major is the layout the sequential loop wants (a (B, T, ...) scan
    transposes the full (B, T, 3U) projection — ~630 MB at the training
    config); callers keep (T, B) end to end and transpose only the int32
    token/target ids.

    ``fused=None`` auto-routes bfloat16 float-weight models on TPU through
    the persistent Pallas kernel pair (ops/fused_gru_train.py: whole time
    loop on-core, backward rematerializes gates); otherwise ``lax.scan``
    with the whole-sequence input projection hoisted (the cuDNN-style RNN
    optimization). ``remat=True`` checkpoints the scan cell (the fused
    backward already rematerializes).
    """
    mxs = input_projection(p, xs_tm, compute_dtype=compute_dtype)  # (T, B, 3U)

    if compute_dtype == jnp.bfloat16 and _use_fused_train(p, fused):
        from ggml_experiments_tpu.ops.fused_gru_train import fused_gru_scan

        ys = fused_gru_scan(
            mxs, h0.astype(compute_dtype), p.recurrent_kernel, p.bias[1]
        )
        return ys, ys[-1]

    def step(h, mx_t):
        h = gru_combine(mx_t, recurrent_projection(p, h, compute_dtype=compute_dtype), h)
        return h, h

    if remat:
        step = jax.checkpoint(step)
    h_last, ys = jax.lax.scan(step, h0, mxs)
    return ys, h_last


def gru_sequence(
    p: GRUCellParams,
    xs: jax.Array,
    h0: jax.Array,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
    fused: Optional[bool] = None,
):
    """Run over a full sequence. xs: (B, T, E) -> ((B, T, U), final (B, U)).

    Batch-major convenience wrapper over :func:`gru_sequence_time_major`
    (which see for the fused-kernel dispatch); the input transpose happens
    on the small (B, T, E) embeddings, before the 3U-wide projection.
    """
    ys, h_last = gru_sequence_time_major(
        p, xs.swapaxes(0, 1), h0,
        compute_dtype=compute_dtype, remat=remat, fused=fused,
    )
    return ys.swapaxes(0, 1), h_last

"""Dense / matmul with transparent quantized-weight dispatch.

Replaces ggml's ``ggml_mul_mat`` (+ bias ``ggml_add`` + ``ggml_repeat``
broadcast chains, e.g. /root/reference/mobilevit/main.cpp:1022-1070): one
``linear`` op that accepts either a float ``(K, N)`` array or a
:class:`~ggml_experiments_tpu.quant.QTensor`, in which case the fused
dequant+matmul Pallas kernel runs.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ggml_experiments_tpu.quant import QTensor, qmatmul

Weight = Union[jax.Array, QTensor]

# Calibration tap (quant/calibration.py): when set to a list, every float-
# weight matmul appends (weight_shape, input Gram tracer, row count) during
# tracing — the jitted wrapper returns the Grams as auxiliary outputs, giving
# per-weight E[x xᵀ] statistics for GPTQ with zero model-code changes. The
# forward's matmul call order is deterministic per architecture, which is the
# key the collector matches weights by.
_CALIBRATION_TAPS = None


def matmul(x: jax.Array, w: Weight, *, compute_dtype=jnp.float32) -> jax.Array:
    """``x (..., K) @ w (K, N) -> (..., N)``; QTensor weights use the Pallas kernel.

    ``compute_dtype=float32`` means *actual* f32 accuracy (HIGHEST precision —
    on TPU the MXU otherwise silently drops f32 operands to one bf16 pass)
    with f32 results. ``bfloat16`` is the explicit single-pass fast path AND
    the storage dtype of the result: the MXU still accumulates in f32
    internally, but the materialized output is bf16 — halving HBM activation
    traffic, which is what bounds the inference workloads here (see PERF.md).
    """
    if isinstance(w, QTensor):
        return qmatmul(x, w, compute_dtype=compute_dtype)
    if _CALIBRATION_TAPS is not None:
        x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        _CALIBRATION_TAPS.append(
            (tuple(w.shape), jnp.dot(x2.T, x2, precision=jax.lax.Precision.HIGHEST),
             x2.shape[0])
        )
    precision = (
        jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32 if compute_dtype == jnp.float32 else compute_dtype,
        precision=precision,
    )


def linear(
    x: jax.Array,
    w: Weight,
    b: Optional[jax.Array] = None,
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    y = matmul(x, w, compute_dtype=compute_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)  # keep bf16 results bf16 (bias is stored f32)
    return y


def embedding_lookup(table: jax.Array, ids: jax.Array, *,
                     one_hot_grad: bool = False) -> jax.Array:
    """Row gather — ggml's ``ggml_get_rows`` embedding path
    (/root/reference/rnn_text_gen/rnn_text_generation.cpp:200).

    ``one_hot_grad=True`` computes the lookup as a one-hot matmul instead:
    numerically identical, but its transpose (the table gradient) is a
    matmul rather than a scatter-add — on TPU the scatter serializes per
    duplicate key and costs ~0.7 ms/step at the training config, while the
    (V, rows) x (rows, E) contraction is trivial for small vocabularies.
    Use under ``jax.grad`` when V is small; plain gather is faster forward.
    """
    if one_hot_grad:
        onehot = jax.nn.one_hot(ids, table.shape[0], dtype=table.dtype)
        return jnp.einsum("...v,ve->...e", onehot, table)
    return jnp.take(table, ids, axis=0)

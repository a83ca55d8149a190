"""Calibration-weighted quantization: activation statistics as importance.

The q4_k grid search (quant/kquant.py) minimizes a *weighted* reconstruction
error. The weighting that actually tracks model output error is the diagonal
Gauss-Newton term: for ``y = x @ W``, perturbing row ``i`` of W by dW costs
``E[(x_i * dW)^2] = E[x_i^2] * dW^2`` — so each input row's importance is the
second moment of the activation that multiplies it. This is the same
statistic ggml's ``imatrix`` tool collects for its k-quants and what
AWQ/GPTQ-diagonal use; here it is computed in-framework from the committed
corpus / image task, no external tooling.

``collect_gru_moments`` runs the trained GRU teacher-forced over calibration
text and returns per-input-row ``E[x^2]`` for each of the three weight
matrices (embedding rows for the input kernel; previous hidden state for the
recurrent kernel; current hidden state for the vocab head).

Reference scope note: the reference repo has no quantization of its own
(SURVEY.md §2.2 — ggml-quants.c is linked, never exercised); calibration is
part of this framework's replacement for that subsystem.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def collect_gru_moments(params, token_seqs) -> Dict[str, np.ndarray]:
    """Per-input-row activation second moments for the GRU's weight matrices.

    ``token_seqs``: int array (B, T+1) of teacher-forcing sequences (the
    same shape eval_gru_delta consumes). Returns ``{"kernel": (E,),
    "recurrent_kernel": (U,), "dense_kernel": (U,)}`` float64 moments.
    """
    from ggml_experiments_tpu.models import gru_textgen

    seqs = jnp.asarray(token_seqs)
    inputs = seqs[:, :-1]                                   # (B, T)
    b, t = inputs.shape
    emb = jnp.asarray(params.embeddings, jnp.float32)       # (V, E)

    h0 = gru_textgen.init_state(params, b)

    def scan_step(h, tok_col):
        _, h2 = gru_textgen.step(params, tok_col, h)
        return h2, h2

    _, hs = jax.lax.scan(scan_step, h0, inputs.T)            # (T, B, U)
    hs = np.asarray(hs, np.float64)

    # input kernel rows multiply emb[token]: token-frequency-weighted moment
    toks = np.asarray(inputs).reshape(-1)
    counts = np.bincount(toks, minlength=emb.shape[0]).astype(np.float64)
    freq = counts / counts.sum()
    emb2 = np.asarray(emb, np.float64) ** 2                  # (V, E)
    m_kernel = freq @ emb2                                   # (E,)

    # recurrent kernel rows multiply h_{t-1} (zeros at t=0 included — that IS
    # the state the matmul sees); vocab head rows multiply h_t
    h_prev = np.concatenate([np.zeros((1, b, hs.shape[-1])), hs[:-1]], axis=0)
    m_rec = np.mean(h_prev.reshape(-1, hs.shape[-1]) ** 2, axis=0)
    m_dense = np.mean(hs.reshape(-1, hs.shape[-1]) ** 2, axis=0)
    return {
        "kernel": m_kernel,
        "recurrent_kernel": m_rec,
        "dense_kernel": m_dense,
    }


def collect_gru_hessians(params, token_seqs) -> Dict[str, np.ndarray]:
    """Input Gram matrices ``H = E[x xᵀ]`` for the GRU's three weight
    matrices — the GPTQ second-order statistic (quant/gptq.py).

    Same input taps as :func:`collect_gru_moments`: embedding rows (token-
    frequency weighted) for the input kernel, previous hidden state for the
    recurrent kernel, current hidden state for the vocab head.
    """
    from ggml_experiments_tpu.models import gru_textgen

    seqs = jnp.asarray(token_seqs)
    inputs = seqs[:, :-1]
    b, t = inputs.shape
    emb = np.asarray(params.embeddings, np.float64)

    h0 = gru_textgen.init_state(params, b)

    def scan_step(h, tok_col):
        _, h2 = gru_textgen.step(params, tok_col, h)
        return h2, h2

    _, hs = jax.lax.scan(scan_step, h0, inputs.T)
    hs = np.asarray(hs, np.float64)                          # (T, B, U)
    u = hs.shape[-1]

    toks = np.asarray(inputs).reshape(-1)
    counts = np.bincount(toks, minlength=emb.shape[0]).astype(np.float64)
    freq = counts / counts.sum()
    h_kernel = (emb * freq[:, None]).T @ emb                 # (E, E)

    h_prev = np.concatenate([np.zeros((1, b, u)), hs[:-1]], axis=0).reshape(-1, u)
    h_cur = hs.reshape(-1, u)
    return {
        "kernel": h_kernel,
        "recurrent_kernel": h_prev.T @ h_prev / h_prev.shape[0],
        "dense_kernel": h_cur.T @ h_cur / h_cur.shape[0],
    }


def gptq_gru_params(params, token_seqs, *, head_qtype: str = "q8_0"):
    """The framework's best < 5 bits/weight GRU quantization recipe
    (``q4_k_m``): GPTQ-compensated q4_k on the two big gate matrices,
    ``head_qtype`` (default q8_0 — it is ~2%% of the weights and feeds the
    logits directly) on the vocab head. Calibration runs the model over
    ``token_seqs`` (use training text, not the eval set)."""
    import dataclasses

    from ggml_experiments_tpu.quant.gptq import (
        gptq_quantize_q4_k,
        gptq_quantize_q8_0,
    )
    from ggml_experiments_tpu.quant.qtensor import quantize

    hess = collect_gru_hessians(params, token_seqs)
    if head_qtype == "q8_0":
        head = gptq_quantize_q8_0(
            np.asarray(params.dense_kernel), hess["dense_kernel"]
        )
    else:
        head = quantize(np.asarray(params.dense_kernel), head_qtype)
    return dataclasses.replace(
        params,
        cell=dataclasses.replace(
            params.cell,
            # input-kernel activations span only the 66 embedding rows
            # (rank-deficient H): tiny damping lets the recursion dump
            # rounding error into the null space the model never sees
            kernel=gptq_quantize_q4_k(
                np.asarray(params.cell.kernel), hess["kernel"], percdamp=1e-4
            ),
            recurrent_kernel=gptq_quantize_q4_k(
                np.asarray(params.cell.recurrent_kernel), hess["recurrent_kernel"]
            ),
        ),
        dense_kernel=head,
    )


# ---------------------------------------------------------------------------
# MobileViT: call-order Gram taps + GPTQ over the transformer kernels
# ---------------------------------------------------------------------------


def _vision_quantizable(params):
    """The model's quantizable weight leaves in FORWARD CALL ORDER — must
    mirror the unfused forward exactly (attention q/k/v/out, then the MLP
    pair, per layer per block; classifier last). The Gram collector matches
    taps to weights by this order and asserts shapes."""
    out = []
    for bname in ("layer_3", "layer_4", "layer_5"):
        blk = getattr(params, bname)
        for ti, tl in enumerate(blk.transformer):
            a = tl.attention
            out += [
                (f"{bname}.t{ti}.wq", a, "wq"),
                (f"{bname}.t{ti}.wk", a, "wk"),
                (f"{bname}.t{ti}.wv", a, "wv"),
                (f"{bname}.t{ti}.wo", a, "wo"),
                (f"{bname}.t{ti}.intermediate", tl, "intermediate_kernel"),
                (f"{bname}.t{ti}.output", tl, "output_kernel"),
            ]
    if params.classifier_kernel is not None:
        out.append(("classifier", params, "classifier_kernel"))
    return out


def collect_mobilevit_grams(params, images, *, batch: int = 32,
                            compute_dtype=jnp.float32):
    """Per-weight input Gram matrices ``E[x xᵀ]`` for every quantizable
    MobileViT weight, via the ops/linear.py calibration tap.

    ``params`` must be a FLOAT (qtype=None) pytree on the unfused path
    (flash_attn/fused_layer off — the fused kernels bypass ops.linear).
    Returns ``{name: (K, K) float64}`` keyed like :func:`_vision_quantizable`.
    """
    # NOTE: ops/__init__ re-exports a FUNCTION named `linear` that shadows
    # the submodule attribute, so even `import ...ops.linear as m` binds the
    # function (PEP 328 getattr semantics); fetch the real module object
    import importlib

    linear_mod = importlib.import_module("ggml_experiments_tpu.ops.linear")
    from ggml_experiments_tpu.models.mobilevit import classify, extract_features

    order = _vision_quantizable(params)
    fwd = classify if params.classifier_kernel is not None else extract_features
    shapes = []

    def tapped(p, x):
        linear_mod._CALIBRATION_TAPS = taps = []
        try:
            fwd(p, x, compute_dtype=compute_dtype)
        finally:
            linear_mod._CALIBRATION_TAPS = None
        if not shapes:
            shapes.extend((s, c) for s, _, c in taps)
        return [g for _, g, _ in taps]

    jt = jax.jit(tapped)
    images = np.asarray(images)
    acc = None
    rows = 0
    for i in range(0, len(images), batch):
        chunk = jnp.asarray(images[i : i + batch])
        grams = jt(params, chunk)
        if acc is None:
            acc = [np.zeros(g.shape, np.float64) for g in grams]
        for a, g in zip(acc, grams):
            a += np.asarray(g, np.float64)
        rows += 1
    if acc is None:
        raise ValueError("no calibration images supplied")
    if len(acc) != len(order):
        raise AssertionError(
            f"tap count {len(acc)} != quantizable weights {len(order)}: the "
            "forward call order changed (fused path enabled, or params "
            "already quantized?)"
        )
    out = {}
    for (name, holder, field), (wshape, _), a in zip(order, shapes, acc):
        k = np.asarray(getattr(holder, field)).shape[0]
        if a.shape != (k, k) or wshape[0] != k:
            raise AssertionError(f"gram/weight shape mismatch at {name}")
        # GPTQ is invariant to the Gram's overall scale (damping is relative,
        # the recursion uses factor ratios); normalize per chunk for sanity
        out[name] = a / rows
    return out


def gptq_mobilevit_params(target_params, grams, *, head_qtype: str = "q8_0"):
    """Replace ``target_params``' transformer kernels with GPTQ q4_k
    QTensors (classifier at ``head_qtype``), using Grams from
    :func:`collect_mobilevit_grams`. ``target_params`` may be a fresh float
    load with production flags (fused kernels on) — only the weight leaves
    change; returns the same object, mutated.
    """
    from ggml_experiments_tpu.quant.gptq import (
        gptq_quantize_q4_k,
        gptq_quantize_q8_0,
    )

    for name, holder, field in _vision_quantizable(target_params):
        w = np.asarray(getattr(holder, field))
        h = grams[name]
        if name == "classifier" and head_qtype == "q8_0":
            qt = gptq_quantize_q8_0(w, h)
        elif name == "classifier":
            from ggml_experiments_tpu.quant.qtensor import quantize

            qt = quantize(w, head_qtype)
        else:
            qt = gptq_quantize_q4_k(w, h)
        setattr(holder, field, qt)
    return target_params


def calibrated_gru_params(params, token_seqs, qtype: str = "q4_k"):
    """Quantize a float GRU params pytree with calibrated importance.

    The three weight matrices quantize at ``qtype`` with their collected
    activation moments as grid-search importance; biases/embeddings stay
    float (as in every loader path).
    """
    import dataclasses

    from ggml_experiments_tpu.quant.qtensor import quantize

    moments = collect_gru_moments(params, token_seqs)

    def q(w, key):
        return quantize(np.asarray(w), qtype, importance=moments[key])

    return dataclasses.replace(
        params,
        cell=dataclasses.replace(
            params.cell,
            kernel=q(params.cell.kernel, "kernel"),
            recurrent_kernel=q(params.cell.recurrent_kernel, "recurrent_kernel"),
        ),
        dense_kernel=q(params.dense_kernel, "dense_kernel"),
    )

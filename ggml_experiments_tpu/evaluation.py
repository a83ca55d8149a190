"""Quantization-delta evaluation: logits / top-1 / perplexity vs FP32.

Implements the north-star acceptance contract (BASELINE.md): quantized models
must match FP32 within the quantization delta at matched bit-width — GRU
next-token logits/perplexity, MobileViT features/top-1. The reference has no
eval harness at all (its check is a human reading printed floats,
/root/reference/mobilevit/README.md:39-45); this makes the comparison a
first-class, scriptable artifact.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DeltaReport:
    max_abs: float
    mean_abs: float
    rel_rmse: float           # ||a-b|| / ||b||
    top1_agreement: Optional[float] = None   # fraction of positions agreeing
    ppl_a: Optional[float] = None
    ppl_b: Optional[float] = None

    def as_dict(self) -> Dict:
        return {k: v for k, v in dataclasses.asdict(self).items() if v is not None}


def compare_logits(
    logits_a, logits_b, *, targets: Optional[np.ndarray] = None
) -> DeltaReport:
    """a = candidate (e.g. quantized), b = reference (fp32). Last dim = classes."""
    a = np.asarray(logits_a, np.float32)
    b = np.asarray(logits_b, np.float32)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    diff = np.abs(a - b)
    rel = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))
    top1 = float((a.argmax(-1) == b.argmax(-1)).mean())
    ppl_a = ppl_b = None
    if targets is not None:
        ppl_a = perplexity(a, targets)
        ppl_b = perplexity(b, targets)
    return DeltaReport(
        max_abs=float(diff.max()),
        mean_abs=float(diff.mean()),
        rel_rmse=rel,
        top1_agreement=top1,
        ppl_a=ppl_a,
        ppl_b=ppl_b,
    )


def perplexity(logits, targets) -> float:
    """exp(mean NLL) of integer targets under logits (..., T, V)."""
    logits = jnp.asarray(logits)
    targets = jnp.asarray(targets)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return float(jnp.exp(nll.mean()))


def eval_gru_delta(
    params_ref, params_q, token_seqs, *, compute_dtype=jnp.float32
) -> DeltaReport:
    """Teacher-forced next-token comparison over (B, T+1) sequences."""
    from ggml_experiments_tpu.models import gru_textgen

    seqs = jnp.asarray(token_seqs)
    inputs, targets = seqs[:, :-1], np.asarray(seqs[:, 1:])
    la, _ = gru_textgen.forward_sequence(params_q, inputs, compute_dtype=compute_dtype)
    lb, _ = gru_textgen.forward_sequence(params_ref, inputs, compute_dtype=compute_dtype)
    return compare_logits(la, lb, targets=targets)


def eval_mobilevit_delta(
    params_ref, params_q, images, *, compute_dtype=jnp.float32
) -> DeltaReport:
    """Feature comparison; uses classifier logits when both have heads."""
    from ggml_experiments_tpu.models.mobilevit import classify, extract_features

    images = jnp.asarray(images)
    if params_ref.classifier_kernel is not None and params_q.classifier_kernel is not None:
        a = classify(params_q, images, compute_dtype=compute_dtype)
        b = classify(params_ref, images, compute_dtype=compute_dtype)
        return compare_logits(a, b)
    a = extract_features(params_q, images, compute_dtype=compute_dtype)
    b = extract_features(params_ref, images, compute_dtype=compute_dtype)
    # features: compare along channels (top-1 over channel dim is meaningless
    # for features; report pure numeric deltas)
    a2 = np.asarray(a).reshape(-1, a.shape[-1])
    b2 = np.asarray(b).reshape(-1, b.shape[-1])
    diff = np.abs(a2 - b2)
    return DeltaReport(
        max_abs=float(diff.max()),
        mean_abs=float(diff.mean()),
        rel_rmse=float(np.linalg.norm(a2 - b2) / max(np.linalg.norm(b2), 1e-30)),
    )

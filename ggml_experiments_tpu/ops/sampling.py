"""Token sampling: greedy, temperature, top-k, nucleus (top-p).

The reference decodes greedy-only (argmax_1d, rnn_text_generation.cpp:74-77);
these are the standard serving extensions, written scan-safe (static shapes,
no data-dependent control flow) so they run inside the decode loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e30


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Mask all but the k largest logits per row (ties keep earlier indices)."""
    if k <= 0:
        raise ValueError(f"top_k must be positive, got {k}")
    v = logits.shape[-1]
    k = min(k, v)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits >= kth, logits, NEG)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering: keep the smallest prefix of the sorted distribution
    with cumulative probability >= p (always keeps the argmax)."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1], got {p}")
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i is kept iff the cumulative mass BEFORE it is < p
    keep_sorted = (cum - probs) < p
    keep = _unsort_mask(keep_sorted, sort_idx)
    return jnp.where(keep, logits, NEG)


def _unsort_mask(mask_sorted: jax.Array, sort_idx: jax.Array) -> jax.Array:
    inv = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(mask_sorted, inv, axis=-1)


def sample(
    logits: jax.Array,
    key: jax.Array,
    *,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """Draw token ids (..., V) -> (...). temperature==0 is greedy argmax."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits / temperature
    if top_k is not None:
        x = apply_top_k(x, top_k)
    if top_p is not None:
        x = apply_top_p(x, top_p)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)

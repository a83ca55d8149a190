"""MobileViT patch unfold/fold: feature map <-> transformer token sequence.

Replaces the reference's reshape/permute/cont chains
(``mobile_vit_layer::unfolding``/``folding``,
/root/reference/mobilevit/main.cpp:721-768, numpy pseudocode :709-719).
Pure reshape/transpose — XLA compiles these to layout changes, no copies of
the ggml ``ggml_cont`` kind are materialized unless needed.

Ordering contract (matches the reference / HF MobileViT):
  patch_area index  p = ph_idx * PW + pw_idx
  num_patches index n = nh_idx * n_patch_w + nw_idx
"""

from __future__ import annotations

import jax


def unfold(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, patch_area, num_patches, C). H, W divisible by patch."""
    b, h, w, c = x.shape
    ps = patch_size
    if h % ps or w % ps:
        raise ValueError(f"H={h}, W={w} not divisible by patch_size={ps}")
    nh, nw = h // ps, w // ps
    x = x.reshape(b, nh, ps, nw, ps, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, ph, pw, nh, nw, C)
    return x.reshape(b, ps * ps, nh * nw, c)


def fold(x: jax.Array, patch_size: int, height: int, width: int) -> jax.Array:
    """(B, patch_area, num_patches, C) -> (B, H, W, C). Inverse of :func:`unfold`."""
    b, pa, np_, c = x.shape
    ps = patch_size
    nh, nw = height // ps, width // ps
    if pa != ps * ps or np_ != nh * nw:
        raise ValueError(f"bad fold shapes: {x.shape} for patch={ps}, H={height}, W={width}")
    x = x.reshape(b, ps, ps, nh, nw, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # (B, nh, ph, nw, pw, C)
    return x.reshape(b, height, width, c)

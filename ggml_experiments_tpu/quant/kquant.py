"""Q4_K-class super-block quantization (the k-quant family, TPU-native).

ggml grew the k-quant formats in ``ggml-quants.c`` (linked by the reference
build, /root/reference/mobilevit/Makefile:16) because the classic 4-bit
formats (q4_0/q4_1) are not accurate enough: per-32-block f32 scales spend
2 extra bits/weight, and round-to-nearest picks per-block grids that are far
from MSE-optimal. The k-quant answer is a *super-block*: sub-block scales
are themselves quantized against one scale-of-scales, and the sub-block
affine grid is chosen by a weighted error search rather than RTN.

This module is the TPU-native redesign of that idea (``q4_k``), not a copy
of ggml's layout:

* sub-block = 32 rows along K (same as the classic formats — the fused
  kernels tile K at 32-row granularity);
* super-block = 8 sub-blocks = 256 K rows;
* sub-block scale/min codes are stored as FULL uint8 (0..255) planes in the
  same ``(Kp//32, Np)`` lane-parallel layout the classic formats use for
  their f32 scales — ggml bit-weaves 6-bit fields inside a block struct,
  which on TPU would cost a sublane shuffle per tile; spending 2 more bits
  per code (still only 0.0625 bits/weight more) keeps every unpack a pure
  shift/mask and buys 4x finer scale resolution than ggml's 6-bit codes;
* per super-block, two f32 rows in a ``(2*ns, Np)`` plane stored as stacked
  halves — rows ``[0, ns)`` hold ``d`` (the scale-of-scales), rows
  ``[ns, 2*ns)`` hold ``m`` (the min-scale). Stacked, not interleaved, so
  the Pallas kernel slices each half with a plain dynamic-start contiguous
  load (a stride-2 sublane gather would fight Mosaic's TPU lowering).

Dequantization::

    eff_d[b]  = supers[b//8]      * scale_code[b]       # b = sub-block index
    eff_m[b]  = supers[ns + b//8] * min_code[b]
    w[32b+i]  = q[32b+i] * eff_d[b] - eff_m[b]          # q in [0, 15]

(The min is stored as a subtracted non-negative magnitude, ggml-style: the
search clamps the block minimum to <= 0, so all-positive blocks anchor at 0.)

Storage: 4 (codes) + 0.25 (scale codes) + 0.25 (min codes) + 0.25 (two f32
rows / 256 weights) = **4.75 bits/weight** — under the 5-bit class budget,
vs 6 for q4_1 and 12 for q8_0 in this repo's f32-scale layout.

The quantizer is a vectorized numpy implementation of the weighted-affine
search (importance defaults to x^2, ggml's default; callers can pass
per-row calibration importance — see ``calibration.py``): for each 32-block
it sweeps candidate grids, refits (d, m) by weighted least squares given the
rounded codes, keeps the lowest-error grid, quantizes the per-block (d, m)
to uint8 codes against the super-block maxima, and finally re-rounds the
weight codes against the *decoded* grid (so code rounding sees the exact
scales inference will use).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

SUB = 32        # rows per sub-block (= qtensor.BLOCK)
GROUP = 8       # sub-blocks per super-block
SUPER = SUB * GROUP  # 256 rows per super-block

# grid-candidate sweep: initial inverse scale 15/(max-min) scanned over
# nearby factors, ggml's nstep/rdelta idea (make_qkx2_quants). Step 0.05
# (2x ggml's 0.1): measured +0.02% next-token agreement on the trained GRU
# contract for 2x (offline, host-side) quantize cost.
_CANDIDATE_FACTORS = np.arange(-1.0, 1.001, 0.05) + 15.0


def _weighted_affine_fit(x: np.ndarray, q: np.ndarray, w: np.ndarray):
    """Weighted least-squares (d, m) for x ~ q*d + m, per block.

    x, q, w: (nb, SUB, N). Returns d, m of shape (nb, N). Degenerate blocks
    (constant q) fall back to d=0, m=weighted mean.
    """
    sw = np.sum(w, axis=1)
    swq = np.sum(w * q, axis=1)
    swqq = np.sum(w * q * q, axis=1)
    swx = np.sum(w * x, axis=1)
    swqx = np.sum(w * q * x, axis=1)
    det = swqq * sw - swq * swq
    ok = det > 1e-12
    safe = np.where(ok, det, 1.0)
    d = np.where(ok, (sw * swqx - swq * swx) / safe, 0.0)
    m = np.where(ok, (swqq * swx - swq * swqx) / safe,
                 swx / np.maximum(sw, 1e-12))
    return d, m


def _weighted_err(x, q, d, m, w):
    r = q * d[:, None, :] + m[:, None, :] - x
    return np.sum(w * r * r, axis=1)


def quantize_q4_k_blocks(
    w_blocks: np.ndarray, importance: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Quantize (nb, 32, Np) float blocks to the q4_k planes.

    Returns ``(q, scale_codes, min_codes, supers)``:
    q (nb, 32, Np) uint8 in [0, 15]; scale/min codes (nb, Np) uint8;
    supers (2*ceil(nb/8), Np) f32, stacked halves (d rows then m rows).

    ``importance``: optional non-negative weights, same shape as w_blocks or
    broadcastable — defaults to x^2 + mean(x^2) (ggml's sigma2-regularized
    x^2 weighting: large weights matter more, but zero weights still count).
    """
    x = w_blocks.astype(np.float64)
    nb, sub, n = x.shape
    assert sub == SUB

    sigma2 = np.mean(x * x, axis=1, keepdims=True)
    if importance is None:
        imp = x * x + sigma2
    else:
        # ggml's imatrix combination for q4_K: calibration importance times
        # sqrt(sigma2 + x^2) — activation moments say which rows matter,
        # the local term keeps large weights from being sacrificed
        imp = np.broadcast_to(np.asarray(importance, np.float64), x.shape)
        imp = imp * np.sqrt(x * x + sigma2)
        # guard all-zero importance blocks (would make the fit singular)
        zero = np.sum(imp, axis=1, keepdims=True) <= 0
        imp = np.where(zero, 1.0, imp)

    mn = np.minimum(x.min(axis=1), 0.0)          # (nb, N), clamp to <= 0
    mx = np.maximum(x.max(axis=1), 0.0)
    rng = mx - mn

    best_err = np.full((nb, n), np.inf)
    best_d = np.zeros((nb, n))
    best_m = np.zeros((nb, n))

    with np.errstate(divide="ignore", invalid="ignore"):
        for f in _CANDIDATE_FACTORS:
            inv = np.where(rng > 0, f / np.where(rng > 0, rng, 1.0), 0.0)
            q = np.clip(np.rint((x - mn[:, None, :]) * inv[:, None, :]), 0, 15)
            d, m = _weighted_affine_fit(x, q, imp)
            # the stored min is subtracted as a non-negative magnitude
            m = np.minimum(m, 0.0)
            # refit d alone where the min clamp moved m (weighted, m fixed)
            d2 = np.sum(imp * q * (x - m[:, None, :]), axis=1) / np.maximum(
                np.sum(imp * q * q, axis=1), 1e-12
            )
            d = np.where(m == 0.0, d2, d)
            d = np.maximum(d, 0.0)
            err = _weighted_err(x, q, d, m, imp)
            better = err < best_err
            best_err = np.where(better, err, best_err)
            best_d = np.where(better, d, best_d)
            best_m = np.where(better, m, best_m)

    mm = -best_m  # stored magnitude, >= 0

    # ---- quantize the per-block (d, mm) against super-block maxima --------
    ns = (nb + GROUP - 1) // GROUP
    pad = ns * GROUP - nb
    if pad:
        best_d = np.pad(best_d, ((0, pad), (0, 0)))
        mm = np.pad(mm, ((0, pad), (0, 0)))
    dg = best_d.reshape(ns, GROUP, n)
    mg = mm.reshape(ns, GROUP, n)
    # supers round to f16-REPRESENTABLE values here, before any code
    # quantizes against them: checkpoint files then store the supers plane
    # as lossless f16 (halving its footprint — it dominates the format
    # overhead on short-K vision weights), and in-memory f32 planes
    # dequantize bit-identically to a save/load roundtrip. f16's 2^-11
    # relative step is noise next to the 8-bit scale codes.
    d_super = np.float16(dg.max(axis=1) / 255.0).astype(np.float64)  # (ns, N)
    m_super = np.float16(mg.max(axis=1) / 255.0).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        d_inv = np.where(d_super > 0, 1.0 / np.where(d_super > 0, d_super, 1.0), 0.0)
        m_inv = np.where(m_super > 0, 1.0 / np.where(m_super > 0, m_super, 1.0), 0.0)
    sc = np.clip(np.rint(dg * d_inv[:, None, :]), 0, 255).astype(np.uint8)
    mc = np.clip(np.rint(mg * m_inv[:, None, :]), 0, 255).astype(np.uint8)

    # decoded grid the kernel will actually use
    eff_d = (d_super[:, None, :] * sc).reshape(ns * GROUP, n)[:nb]
    eff_m = (m_super[:, None, :] * mc).reshape(ns * GROUP, n)[:nb]

    # ---- final code rounding against the decoded grid ---------------------
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_d = np.where(eff_d > 0, 1.0 / np.where(eff_d > 0, eff_d, 1.0), 0.0)
    q = np.clip(
        np.rint((x + eff_m[:, None, :]) * inv_d[:, None, :]), 0, 15
    ).astype(np.uint8)

    supers = np.concatenate(
        [d_super.astype(np.float32), m_super.astype(np.float32)], axis=0
    )
    return q, sc.reshape(ns * GROUP, n)[:nb], mc.reshape(ns * GROUP, n)[:nb], supers


def effective_scales_np(
    scale_codes: np.ndarray, min_codes: np.ndarray, supers: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode (eff_d, eff_m) f32 planes of shape (nb, N) from stored codes."""
    nb, n = scale_codes.shape
    ns = supers.shape[0] // 2
    d_super = supers[:ns].astype(np.float32)
    m_super = supers[ns:].astype(np.float32)
    group = np.minimum(np.arange(nb) // GROUP, ns - 1)
    eff_d = d_super[group] * scale_codes.astype(np.float32)
    eff_m = m_super[group] * min_codes.astype(np.float32)
    return eff_d, eff_m

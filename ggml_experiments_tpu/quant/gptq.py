"""GPTQ-class sequential error-compensated quantization onto q4_k grids.

Round-to-nearest (even with the k-quant grid search) treats every weight
independently; the remaining model error is dominated by the *correlated*
effect of many small rounding errors on the layer output. GPTQ (Frantar et
al., 2022) fixes this with second-order error compensation: process input
rows in order, and after rounding row ``i`` push its rounding error onto the
not-yet-quantized rows through the inverse Hessian of the layer inputs
(``H = E[x xᵀ]``) — the update that exactly minimizes the layer-output MSE
for the rows still free to move.

This implementation composes GPTQ with the q4_k super-block format
(quant/kquant.py):

* rows are processed in natural order, one 256-row super-block slab at a
  time — when a slab is reached, its sub-block grids (scale/min codes +
  supers) are fitted by the weighted k-quant search on the slab's CURRENT
  (already-compensated) values, then frozen;
* each row of the slab is rounded onto the frozen grid and its error
  propagated to all later rows via the Cholesky factor of ``H⁻¹`` (the
  standard GPTQ recursion);
* the collected codes/scale planes assemble into a normal :class:`QTensor`
  — downstream (fused kernels, serving, checkpoints) cannot tell GPTQ
  output from RTN output, only the codes are better.

The Hessians come from running the trained model over the committed
calibration corpus (quant/calibration.py) — no external data, no egress.

The reference repo has no quantization pipeline at all (its ggml-quants.c
link is a build artifact, SURVEY.md §2.2); this module is part of the
framework's replacement for that subsystem, at the accuracy level the
4-bit Δ contract demands (BASELINE.md).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ggml_experiments_tpu.quant import kquant
from ggml_experiments_tpu.quant.qtensor import (
    BLOCK,
    QTensor,
    _pack_nibbles,
    from_numpy_blocks,
)

PERCDAMP = 0.01  # standard GPTQ diagonal damping fraction


def _hessian_inverse_chol(h: np.ndarray, percdamp: Optional[float] = None) -> np.ndarray:
    """Upper-triangular U with ``H⁻¹ = Uᵀ U`` (damped), the GPTQ recursion
    factor.

    ``percdamp``: diagonal damping as a fraction of mean(diag(H)). For
    rank-deficient input distributions (e.g. the GRU input kernel, whose
    activations span only the 66 embedding rows) a SMALL damp lets the
    recursion push rounding error into the activation null space, where it
    is invisible to the model — use ~1e-4; full-rank inputs keep the
    standard 0.01."""
    h = np.asarray(h, np.float64).copy()
    k = h.shape[0]
    # dead inputs (zero activation everywhere): pin the diagonal so the
    # factorization exists; their rows then quantize plain-RTN
    diag = np.diagonal(h).copy()
    dead = diag <= 0
    h[dead, dead] = 1.0
    if percdamp is None:
        percdamp = PERCDAMP
    damp = percdamp * float(np.mean(diag[~dead])) if (~dead).any() else 1.0
    h[np.arange(k), np.arange(k)] += damp
    hinv = np.linalg.inv(h)
    # numpy cholesky returns lower L (A = L Lᵀ); U = Lᵀ gives A = Uᵀ U
    return np.linalg.cholesky(hinv).T


def gptq_quantize_q4_k(
    w: np.ndarray,
    hessian: np.ndarray,
    importance: Optional[np.ndarray] = None,
    percdamp: Optional[float] = None,
) -> QTensor:
    """Quantize ``w (K, N)`` to q4_k with GPTQ error compensation.

    ``hessian``: (K, K) ``E[x xᵀ]`` of the layer's inputs over calibration
    data. ``importance``: optional per-row grid-search weights; defaults to
    ``diag(hessian)`` (the matching diagonal objective).
    """
    w = np.asarray(w, np.float64)
    k, n = w.shape
    if hessian.shape != (k, k):
        raise ValueError(f"hessian {hessian.shape} does not match K={k}")
    if importance is None:
        importance = np.diagonal(hessian).copy()
        if not (importance > 0).any():
            importance = None

    u = _hessian_inverse_chol(hessian, percdamp)
    wk = w.copy()

    nb = (k + BLOCK - 1) // BLOCK
    codes = np.zeros((nb * BLOCK, n), np.uint8)
    sc_all = np.zeros((nb, n), np.uint8)
    mc_all = np.zeros((nb, n), np.uint8)
    ns = (nb + kquant.GROUP - 1) // kquant.GROUP
    d_sup_all = np.zeros((ns, n), np.float32)
    m_sup_all = np.zeros((ns, n), np.float32)

    for s0 in range(0, k, kquant.SUPER):
        s1 = min(s0 + kquant.SUPER, k)
        slab = wk[s0:s1]
        rows = s1 - s0
        pad = (-rows) % BLOCK
        if pad:
            slab = np.pad(slab, ((0, pad), (0, 0)))
        slab_blocks = slab.reshape(-1, BLOCK, n)
        imp = None
        if importance is not None:
            imp = np.asarray(importance, np.float64)[s0:s1, None] * np.ones((1, n))
            if pad:
                imp = np.pad(imp, ((0, pad), (0, 0)))
            imp = imp.reshape(-1, BLOCK, n)
        # super-block scale rows from this slab's current (compensated)
        # values — the supers must be frozen before any sub-block of the
        # slab quantizes its scale codes against them
        _, _, _, supers = kquant.quantize_q4_k_blocks(slab_blocks, imp)
        si = s0 // kquant.SUPER
        d_sup_all[si] = supers[0]
        m_sup_all[si] = supers[1]
        d_sup = supers[0].astype(np.float64)
        m_sup = supers[1].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            d_sup_inv = np.where(d_sup > 0, 1.0 / np.where(d_sup > 0, d_sup, 1.0), 0.0)
            m_sup_inv = np.where(m_sup > 0, 1.0 / np.where(m_sup > 0, m_sup, 1.0), 0.0)

        for b0 in range(s0, s1, BLOCK):
            b1 = min(b0 + BLOCK, k)
            # per-block grid REFIT at block start: errors compensated into
            # this block by earlier rows of the same slab shift its optimal
            # grid — fit on current values, then snap (d, m) onto the frozen
            # supers' code lattice
            blk = wk[b0:b1]
            bpad = (-(b1 - b0)) % BLOCK
            if bpad:
                blk = np.pad(blk, ((0, bpad), (0, 0)))
            bimp = None
            if importance is not None:
                bimp = np.asarray(importance, np.float64)[b0:b1, None] * np.ones((1, n))
                if bpad:
                    bimp = np.pad(bimp, ((0, bpad), (0, 0)))
                bimp = bimp[None]
            q_blk, _, _, sup_blk = kquant.quantize_q4_k_blocks(blk[None], bimp)
            d_fit = sup_blk[0].astype(np.float64) * 255.0  # the block's best d
            m_fit = sup_blk[1].astype(np.float64) * 255.0
            sc = np.clip(np.rint(d_fit * d_sup_inv), 0, 255)
            mc = np.clip(np.rint(m_fit * m_sup_inv), 0, 255)
            bi = b0 // BLOCK
            sc_all[bi] = sc.astype(np.uint8)
            mc_all[bi] = mc.astype(np.uint8)
            eff_d = d_sup * sc
            eff_m = m_sup * mc
            with np.errstate(divide="ignore", invalid="ignore"):
                inv_d = np.where(eff_d > 0, 1.0 / np.where(eff_d > 0, eff_d, 1.0), 0.0)
            # sequential rounding with error feedback
            for i in range(b0, b1):
                q = np.clip(np.rint((wk[i] + eff_m) * inv_d), 0, 15)
                codes[i] = q.astype(np.uint8)
                wq = q * eff_d - eff_m
                err = (wk[i] - wq) / u[i, i]
                if i + 1 < k:
                    wk[i + 1 :] -= np.outer(u[i, i + 1 :], err)

    packed = _pack_nibbles(codes.reshape(nb, BLOCK, n))
    return from_numpy_blocks(
        packed, sc_all, (k, n), "q4_k", mins=mc_all,
        supers=np.concatenate([d_sup_all, m_sup_all], axis=0),
    )


def gptq_quantize_q8_0(w: np.ndarray, hessian: np.ndarray,
                       percdamp: Optional[float] = None) -> QTensor:
    """GPTQ error compensation onto the classic q8_0 grid.

    Same recursion as :func:`gptq_quantize_q4_k` with the simpler per-block
    symmetric grid (d = absmax/127, frozen per 32-row block at block start
    from the current compensated values). Used for the high-precision
    tensors of mixed recipes (e.g. the q4_k_m vocab head) so their residual
    error is layer-output-optimal too.
    """
    w = np.asarray(w, np.float64)
    k, n = w.shape
    if hessian.shape != (k, k):
        raise ValueError(f"hessian {hessian.shape} does not match K={k}")
    u = _hessian_inverse_chol(hessian, percdamp)
    wk = w.copy()
    nb = (k + BLOCK - 1) // BLOCK
    codes = np.zeros((nb * BLOCK, n), np.int8)
    scales = np.zeros((nb, n), np.float32)
    for b0 in range(0, k, BLOCK):
        b1 = min(b0 + BLOCK, k)
        d = np.max(np.abs(wk[b0:b1]), axis=0) / 127.0
        scales[b0 // BLOCK] = d.astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
        for i in range(b0, b1):
            q = np.clip(np.rint(wk[i] * inv), -127, 127)
            codes[i] = q.astype(np.int8)
            err = (wk[i] - q * d) / u[i, i]
            if i + 1 < k:
                wk[i + 1 :] -= np.outer(u[i, i + 1 :], err)
    return from_numpy_blocks(codes[:k], scales, (k, n), "q8_0")

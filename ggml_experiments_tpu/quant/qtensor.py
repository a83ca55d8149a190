"""GGML-class block weight-only quantization as a JAX pytree leaf.

TPU-native replacement for the block formats in ggml's ``ggml-quants.c``
(linked by the reference build, /root/reference/mobilevit/Makefile:13-17).
Semantics follow GGML's classic 32-element block family: blocks of 32
consecutive weights along the *reduction* dimension share one scale
(weight-only):

* **Q8_0**: ``d = absmax/127``, ``q = rint(x/d)`` stored int8, ``x ≈ q*d``.
* **Q4_0**: signed max ``m`` (value of largest magnitude), ``d = m/-8``,
  ``q = clamp(rint(x/d) + 8, 0, 15)`` stored as packed nibbles,
  ``x ≈ (q-8)*d`` — ggml's sign-flip trick so the extremal weight is exact.
* **Q4_1**: asymmetric, ``m = min``, ``d = (max-min)/15``,
  ``q = clamp(rint((x-m)/d), 0, 15)``, ``x ≈ q*d + m`` — better on
  one-sided distributions (biased/positive weights) at +1 f32 per block.
* **Q5_0**: symmetric 5-bit, ``d = signed_absmax/-16``,
  ``q = clamp(rint(x/d) + 16, 0, 31)``, ``x ≈ (q-16)*d``; the 5th bit
  rides in a separate bit-plane.
* **Q5_1**: asymmetric 5-bit, ``d = (max-min)/31``, ``x ≈ q*d + m``.
* **Q4_K**: super-block k-quant (quant/kquant.py) — 4-bit codes with
  uint8-quantized sub-block scale/min codes against per-256-row
  scale-of-scales rows (f16-rounded, stored f16), grids picked by weighted
  error search; 4.625 stored bits/weight vs q4_1's 6 in this layout.

Layout is TPU-first, not a copy of ggml's array-of-structs: a weight
``W[K, N]`` (in-features first, so ``y = x @ W``) is stored as

* ``codes``:  int8 ``(Kp, Np)`` (Q8_0) or packed uint8 ``(Kp//2, Np)``
  (all nibble formats: byte ``i`` of a 32-row block holds unpacked rows
  ``(32b+i, 32b+16+i)`` as (low, high) nibbles — block-local, so the fused
  kernel can tile K at whole-block granularity)
* ``scales``: float32 ``(Kp//32, Np)``
* ``mins``:   float32 ``(Kp//32, Np)`` — Q4_1/Q5_1 only (per-block offset)
* ``hibits``: uint8 ``(Kp//8, Np)`` — Q5_0/Q5_1 only. Bit-plane of the 5th
  bit, packed so unpacking is concat-only (no sublane shuffle): block-local
  row ``t`` lives in byte ``t % 4`` at bit ``t // 4``.

``Kp``/``Np`` are padded up to the TPU tile grid (K to the 32-element
block, N to the 128-lane boundary) at quantize time so that the fused
dequant+matmul Pallas kernel (quant/pallas_kernels.py) never re-pads at run
time. The logical shape is kept as static aux data on the pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 32  # weights per scale block, along the reduction dim (ggml's QK8_0/QK4_0)
LANE = 128  # TPU lane width; N is padded to this

QTYPES = ("q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "q4_k")  # supported block formats
# bits per weight (codes + bit-plane), excluding per-block scale/min rows
QTYPE_BITS = {"q8_0": 8, "q4_0": 4, "q4_1": 4, "q5_0": 5, "q5_1": 5, "q4_k": 4}
# total stored bits/weight including scale planes (f32 per-32-block scales for
# the classic formats; uint8 sub-block codes + f32 per-256 supers for q4_k)
QTYPE_TOTAL_BITS = {
    "q8_0": 8 + 1.0,          # + f32 scale / 32
    "q4_0": 4 + 1.0,
    "q4_1": 4 + 2.0,          # + f32 scale + f32 min / 32
    "q5_0": 5 + 1.0,
    "q5_1": 5 + 2.0,
    "q4_k": 4 + 0.25 + 0.25 + 0.125,  # u8 scale + u8 min / 32 + 2 f16 / 256
}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _native_quantize(w: np.ndarray, qtype: str):
    """Try the C++ codec (runtime/). Returns unpadded-N planes as a
    (codes, scales, mins, hibits) tuple (absent planes None) or None."""
    try:
        from ggml_experiments_tpu import runtime
    except Exception:  # pragma: no cover
        return None
    if qtype == "q8_0":
        r = runtime.quantize_q8_0(w)
        return None if r is None else (r[0], r[1], None, None)
    if qtype == "q4_0":
        r = runtime.quantize_q4_0(w)
        return None if r is None else (r[0], r[1], None, None)
    if qtype == "q4_1":
        r = runtime.quantize_q4_1(w)
        return None if r is None else (r[0], r[1], r[2], None)
    if qtype == "q5_0":
        r = runtime.quantize_q5_0(w)
        return None if r is None else (r[0], r[2], None, r[1])
    if qtype == "q5_1":
        r = runtime.quantize_q5_1(w)
        return None if r is None else (r[0], r[2], r[3], r[1])
    return None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A block-quantized 2-D weight. Pytree: (codes, scales[, mins, hibits])
    leaves; static aux."""

    codes: jax.Array   # int8 (Kp, Np) for q8_0; uint8 (Kp//2, Np) nibble-packed
    scales: jax.Array  # f32 (Kp//32, Np); q4_k: uint8 sub-block scale codes
    shape: Tuple[int, int]  # logical (K, N)
    qtype: str  # one of QTYPES
    mins: Optional[jax.Array] = None    # f32 (Kp//32, Np) q4_1/q5_1; uint8 q4_k
    hibits: Optional[jax.Array] = None  # uint8 (Kp//8, Np), q5_0/q5_1
    supers: Optional[jax.Array] = None  # f32 (2*ceil(Kp/256), Np), q4_k only:
    #   stacked halves — per-super-block scale-of-scales rows, then min-scale
    #   rows (quant/kquant.py)

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (self.codes, self.scales, self.mins, self.hibits, self.supers), (
            self.shape, self.qtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, scales, mins, hibits, supers = children
        shape, qtype = aux
        return cls(codes=codes, scales=scales, shape=shape, qtype=qtype,
                   mins=mins, hibits=hibits, supers=supers)

    # -- convenience ----------------------------------------------------------
    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def kp(self) -> int:
        return self.scales.shape[0] * BLOCK

    @property
    def np_(self) -> int:
        return self.codes.shape[-1]

    @property
    def dtype(self):
        return jnp.float32

    @property
    def nbytes(self) -> int:
        n = self.codes.size * self.codes.dtype.itemsize
        n += self.scales.size * self.scales.dtype.itemsize
        if self.mins is not None:
            n += self.mins.size * self.mins.dtype.itemsize
        if self.hibits is not None:
            n += self.hibits.size
        if self.supers is not None:
            n += self.supers.size * 4
        return n

    @property
    def bits_per_weight(self) -> float:
        """In-HBM bits per LOGICAL weight (padded planes over logical
        elements) — the device-capacity number; lane padding (N to 128)
        inflates it for narrow tensors, identically across formats."""
        return 8.0 * self.nbytes / (self.shape[0] * self.shape[1])

    @property
    def stored_nbytes(self) -> int:
        """Bytes of the LOGICAL-region planes — what checkpoint files store
        (formats/checkpoint.py trims lane/K padding on save; q4_k supers
        serialize as lossless f16 — their values are f16-rounded at
        quantize time)."""
        planes = to_numpy_blocks(self)
        n = sum(p.nbytes for p in planes if p is not None)
        if self.qtype == "q4_k":
            n -= planes[3].nbytes // 2  # f32 in memory, f16 on disk
        return n

    @property
    def stored_bits_per_weight(self) -> float:
        """File-storage bits per weight: 4.75 for q4_k, 6 for q4_1, 9 for
        q8_0 on block-aligned shapes — the k-quant capacity contract."""
        return 8.0 * self.stored_nbytes / (self.shape[0] * self.shape[1])

    def dequantize(self) -> jax.Array:
        """Reference dequantization to float32 ``(K, N)`` (pure jnp)."""
        return dequantize(self)


def _blockify(w: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """Pad (K, N) fp weight to (Kp, Np) and reshape to (nb, BLOCK, Np)."""
    k, n = w.shape
    kp, np_ = _round_up(k, BLOCK), _round_up(n, LANE)
    w = np.pad(w.astype(np.float32), ((0, kp - k), (0, np_ - n)))
    return w.reshape(kp // BLOCK, BLOCK, np_), kp, np_


def _quantize_q8_0_arrays(w_blocks: np.ndarray):
    absmax = np.max(np.abs(w_blocks), axis=1)             # (nb, Np)
    d = (absmax / 127.0).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.rint(w_blocks * inv[:, None, :])
    q = np.clip(q, -127, 127).astype(np.int8)
    return q, d


def _quantize_q4_0_arrays(w_blocks: np.ndarray):
    # ggml Q4_0: m = signed value of the largest-magnitude weight; d = m / -8.
    amax_idx = np.argmax(np.abs(w_blocks), axis=1)         # (nb, Np)
    m = np.take_along_axis(w_blocks, amax_idx[:, None, :], axis=1)[:, 0, :]
    d = (m / -8.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
    q = np.clip(np.rint(w_blocks * inv[:, None, :]) + 8.0, 0.0, 15.0)
    return q.astype(np.uint8), d


def _quantize_q5_0_arrays(w_blocks: np.ndarray):
    # ggml Q5_0: same sign-flip trick at 5 bits; d = signed_absmax / -16.
    amax_idx = np.argmax(np.abs(w_blocks), axis=1)
    m = np.take_along_axis(w_blocks, amax_idx[:, None, :], axis=1)[:, 0, :]
    d = (m / -16.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
    q = np.clip(np.rint(w_blocks * inv[:, None, :]) + 16.0, 0.0, 31.0)
    return q.astype(np.uint8), d


def _quantize_offset_arrays(w_blocks: np.ndarray, levels: int):
    # ggml Q4_1/Q5_1: asymmetric per-block affine, m = min, d = (max-min)/L.
    mn = w_blocks.min(axis=1).astype(np.float32)           # (nb, Np)
    mx = w_blocks.max(axis=1).astype(np.float32)
    d = ((mx - mn) / levels).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.clip(np.rint((w_blocks - mn[:, None, :]) * inv[:, None, :]), 0.0, levels)
    return q.astype(np.uint8), d, mn


def _pack_nibbles(q3: np.ndarray) -> np.ndarray:
    """(nb, 32, Np) values 0..15 -> block-local nibble-packed (Kp//2, Np)."""
    nb, _, np_ = q3.shape
    packed = q3[:, : BLOCK // 2] | (q3[:, BLOCK // 2 :] << 4)
    return packed.reshape(nb * BLOCK // 2, np_).astype(np.uint8)


def _pack_hibits(hi3: np.ndarray) -> np.ndarray:
    """(nb, 32, Np) bits 0/1 -> bit-plane (Kp//8, Np).

    Block-local row ``t`` -> byte ``t % 4``, bit ``t // 4``; chosen so the
    unpack is 8 shift-mask copies concatenated in order (no row shuffle —
    Mosaic-friendly; see unpack_hibits)."""
    nb, _, np_ = hi3.shape
    hb = np.zeros((nb, 4, np_), np.uint8)
    for t in range(BLOCK):
        hb[:, t % 4] |= (hi3[:, t].astype(np.uint8) << (t // 4))
    return hb.reshape(nb * 4, np_)


def quantize(w, qtype: str = "q8_0", *, importance=None) -> QTensor:
    """Quantize a float ``(K, N)`` weight into a :class:`QTensor`.

    Runs in numpy on the host: quantization is a load/convert-time operation
    and must not trigger a device compile (remote-compile latency on a
    tunneled TPU makes per-weight jit round-trips prohibitive). The resulting
    buffers are placed on the default device.

    ``importance``: optional non-negative per-row ``(K,)`` or full ``(K, N)``
    error weights for the q4_k grid search (e.g. calibration input second
    moments, quant/calibration.py); ignored by the RTN formats.
    """
    w = np.asarray(w)
    if w.ndim != 2:
        raise ValueError(f"QTensor quantizes 2-D weights, got shape {w.shape}")
    k, n = w.shape

    if qtype == "q4_k":
        from ggml_experiments_tpu.quant import kquant

        w_blocks, kp, np_ = _blockify(w)
        imp = None
        if importance is not None:
            imp = np.asarray(importance, np.float64)
            if imp.ndim == 1:
                imp = imp[:, None] * np.ones((1, n))
            imp = np.pad(imp, ((0, kp - k), (0, np_ - n)))
            imp = imp.reshape(kp // BLOCK, BLOCK, np_)
        q, sc, mc, supers = kquant.quantize_q4_k_blocks(w_blocks, imp)
        codes = _pack_nibbles(q.reshape(kp // BLOCK, BLOCK, np_))
        return QTensor(
            codes=jnp.asarray(codes), scales=jnp.asarray(sc), shape=(k, n),
            qtype="q4_k", mins=jnp.asarray(mc), supers=jnp.asarray(supers),
        )

    # native fast path (runtime/libgxt.so, the ggml-quants.c replacement);
    # numpy below is the bit-identical reference implementation
    native = _native_quantize(w, qtype)
    if native is not None:
        codes, d, mins, hibits = native
        np_ = _round_up(n, LANE)
        if np_ != n:  # lane-pad columns (scale 0 / min 0 ⇒ zero contribution)
            d = np.pad(d, ((0, 0), (0, np_ - n)))
            pad_val = 0x88 if qtype == "q4_0" else 0
            codes = np.pad(codes, ((0, 0), (0, np_ - n)), constant_values=pad_val)
            if mins is not None:
                mins = np.pad(mins, ((0, 0), (0, np_ - n)))
            if hibits is not None:
                hibits = np.pad(hibits, ((0, 0), (0, np_ - n)))
        return QTensor(
            codes=jnp.asarray(codes), scales=jnp.asarray(d), shape=(k, n), qtype=qtype,
            mins=None if mins is None else jnp.asarray(mins),
            hibits=None if hibits is None else jnp.asarray(hibits),
        )

    w_blocks, kp, np_ = _blockify(w)
    mins = hibits = None
    if qtype == "q8_0":
        q, d = _quantize_q8_0_arrays(w_blocks)
        codes = q.reshape(kp, np_)
    elif qtype == "q4_0":
        # pack within each 32-row block: byte i of block b holds rows
        # (32b+i, 32b+16+i) as (low, high) nibble. Unpacking is then a
        # block-local concat — no cross-tile dependency (the fused kernel can
        # tile K at any whole-block granularity) and no even/odd interleave
        # shuffle (which Mosaic's TPU lowering rejects).
        q, d = _quantize_q4_0_arrays(w_blocks)
        codes = _pack_nibbles(q)
    elif qtype == "q4_1":
        q, d, mn = _quantize_offset_arrays(w_blocks, 15)
        codes = _pack_nibbles(q)
        mins = mn
    elif qtype == "q5_0":
        q, d = _quantize_q5_0_arrays(w_blocks)
        codes = _pack_nibbles(q & 0xF)
        hibits = _pack_hibits(q >> 4)
    elif qtype == "q5_1":
        q, d, mn = _quantize_offset_arrays(w_blocks, 31)
        codes = _pack_nibbles(q & 0xF)
        hibits = _pack_hibits(q >> 4)
        mins = mn
    else:
        raise ValueError(f"unknown qtype {qtype!r} (expected one of {QTYPES})")
    return QTensor(
        codes=jnp.asarray(codes), scales=jnp.asarray(d), shape=(k, n), qtype=qtype,
        mins=None if mins is None else jnp.asarray(mins),
        hibits=None if hibits is None else jnp.asarray(hibits),
    )


def unpack_nibbles(codes: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Unpack uint8 nibble-packed (Kp//2, Np) -> (Kp, Np) values in [0, 15].

    Inverse of the block-local packing in :func:`quantize`: packed byte i of
    block b holds unpacked rows (32b+i, 32b+16+i) as (low, high) nibbles.
    Arithmetic runs via int32 (Mosaic has no uint8->f32 cast / int8 subtract).
    """
    half, np_ = codes.shape
    c3 = codes.reshape((2 * half) // BLOCK, BLOCK // 2, np_).astype(jnp.int32)
    lo = c3 & 0xF
    hi = c3 >> 4
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * half, np_).astype(dtype)


def unpack_q4(codes: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Unpack q4_0/q4_1-packed codes -> (Kp, Np) values in [-8, 7]."""
    half, np_ = codes.shape
    nb = (2 * half) // BLOCK
    # widen to int32 first: Mosaic has no uint8->f32 cast and no int8 subtract
    c3 = codes.reshape(nb, BLOCK // 2, np_).astype(jnp.int32)
    lo = (c3 & 0xF) - 8
    hi = (c3 >> 4) - 8
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * half, np_).astype(dtype)


def unpack_hibits(hibits: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Unpack the q5 bit-plane (Kp//8, Np) -> (Kp, Np) values in {0, 1}.

    Inverse of :func:`_pack_hibits`: block-local row ``t`` is byte ``t % 4``
    bit ``t // 4``, so part ``i`` of the concat below lands rows ``4i..4i+3``
    — pure shift/mask + concat, no sublane shuffle.
    """
    rows, np_ = hibits.shape
    nb = rows // 4
    b = hibits.reshape(nb, 4, np_).astype(jnp.int32)
    parts = [(b >> i) & 1 for i in range(8)]
    return jnp.concatenate(parts, axis=1).reshape(rows * 8, np_).astype(dtype)


def _unpack_nibbles_np(codes: np.ndarray) -> np.ndarray:
    half, np_ = codes.shape
    c3 = codes.reshape((2 * half) // BLOCK, BLOCK // 2, np_)
    lo = (c3 & 0xF).astype(np.float32)
    hi = (c3 >> 4).astype(np.float32)
    return np.concatenate([lo, hi], axis=1).reshape(2 * half, np_)


def _unpack_q4_np(codes: np.ndarray) -> np.ndarray:
    return _unpack_nibbles_np(codes) - 8.0


def _unpack_hibits_np(hibits: np.ndarray) -> np.ndarray:
    rows, np_ = hibits.shape
    b = hibits.reshape(rows // 4, 4, np_)
    parts = [((b >> i) & 1).astype(np.float32) for i in range(8)]
    return np.concatenate(parts, axis=1).reshape(rows * 8, np_)


def _codes_to_q_np(qt: QTensor) -> np.ndarray:
    """Decode stored planes to the integer q grid (numpy, fp values)."""
    codes = np.asarray(qt.codes)
    if qt.qtype == "q8_0":
        return codes.astype(np.float32)
    q = _unpack_nibbles_np(codes)
    if qt.qtype in ("q5_0", "q5_1"):
        q = q + 16.0 * _unpack_hibits_np(np.asarray(qt.hibits))
    return q


def dequantize(qt: QTensor) -> jax.Array:
    """Host-side (numpy) dequantization — the semantic reference the Pallas
    kernel must match. Load/convert-time only; never runs on device."""
    if qt.qtype not in QTYPES:
        raise ValueError(qt.qtype)
    q = _codes_to_q_np(qt)
    kp, np_ = q.shape
    k, n = qt.shape
    if qt.qtype == "q4_k":
        from ggml_experiments_tpu.quant.kquant import effective_scales_np

        eff_d, eff_m = effective_scales_np(
            np.asarray(qt.scales), np.asarray(qt.mins), np.asarray(qt.supers)
        )
        w = (q.reshape(kp // BLOCK, BLOCK, np_) * eff_d[:, None, :]
             - eff_m[:, None, :]).reshape(kp, np_)
        return jnp.asarray(w[:k, :n])
    if qt.qtype == "q4_0":
        q -= 8.0
    elif qt.qtype == "q5_0":
        q -= 16.0
    scales = np.asarray(qt.scales)
    w = (q.reshape(kp // BLOCK, BLOCK, np_) * scales[:, None, :])
    if qt.mins is not None:
        w = w + np.asarray(qt.mins)[:, None, :]
    w = w.reshape(kp, np_)
    return jnp.asarray(w[:k, :n])


def quantization_error(w, qtype: str = "q8_0") -> float:
    """Max-abs dequantization error — used by the Δ-vs-FP32 tests."""
    w = jnp.asarray(w, jnp.float32)
    return float(jnp.max(jnp.abs(dequantize(quantize(w, qtype)) - w)))


def to_numpy_blocks(qt: QTensor):
    """Export logical-region planes as numpy, unpadded along N/K.

    Returns ``(codes, scales)`` for q8_0/q4_0 (back-compat),
    ``(codes, scales, mins, hibits)`` for q4_1/q5_x and
    ``(codes, scales, mins, supers)`` for q4_k (absent planes are None).
    Used by the format writers (formats/) which store the logical tensor.
    """
    k, n = qt.shape
    nb = (k + BLOCK - 1) // BLOCK
    scales = np.asarray(qt.scales)[:nb, :n]
    if qt.qtype == "q8_0":
        codes = np.asarray(qt.codes)[: nb * BLOCK, :n]
    else:
        codes = np.asarray(qt.codes)[: (nb * BLOCK) // 2, :n]
    if qt.qtype in ("q8_0", "q4_0"):
        return codes, scales
    mins = None if qt.mins is None else np.asarray(qt.mins)[:nb, :n]
    if qt.qtype == "q4_k":
        ns = (nb + 7) // 8
        return codes, scales, mins, np.asarray(qt.supers)[: 2 * ns, :n]
    hibits = None if qt.hibits is None else np.asarray(qt.hibits)[: nb * 4, :n]
    return codes, scales, mins, hibits


def from_numpy_blocks(codes, scales, shape, qtype: str, mins=None, hibits=None,
                      supers=None) -> QTensor:
    """Rebuild a padded QTensor from logical-region blocks (inverse of above)."""
    k, n = shape
    kp, np_ = _round_up(k, BLOCK), _round_up(n, LANE)
    nb = kp // BLOCK
    if qtype == "q4_k":
        codes_p = np.zeros((kp // 2, np_), np.uint8)
        codes_p[: codes.shape[0], :n] = codes
        scales_p = np.zeros((nb, np_), np.uint8)
        scales_p[: scales.shape[0], :n] = scales
        mins_p = np.zeros((nb, np_), np.uint8)
        mins_p[: mins.shape[0], :n] = mins
        ns = (nb + 7) // 8
        supers_p = np.zeros((2 * ns, np_), np.float32)
        supers_p[: supers.shape[0], :n] = supers
        # pad regions decode to 0: codes 0 * (scale code 0 or super 0) - 0
        return QTensor(
            codes=jnp.asarray(codes_p), scales=jnp.asarray(scales_p),
            shape=(k, n), qtype=qtype, mins=jnp.asarray(mins_p),
            supers=jnp.asarray(supers_p),
        )
    scales_p = np.zeros((nb, np_), np.float32)
    scales_p[: scales.shape[0], :n] = scales
    if qtype == "q8_0":
        codes_p = np.zeros((kp, np_), np.int8)
        codes_p[: codes.shape[0], :n] = codes
    elif qtype == "q4_0":
        codes_p = np.zeros((kp // 2, np_), np.uint8)
        # padded-N nibbles of 0 decode to -8; zero their scale instead (done above)
        codes_p[: codes.shape[0], :n] = codes
        codes_p[codes.shape[0]:, :] = 0x88  # (0|8)<<4|(0|8): decodes to q=8-8=0
        codes_p[:, n:] = 0x88
    else:
        # q4_1/q5_x pad regions decode to exactly 0 with zero scale/min/bits
        codes_p = np.zeros((kp // 2, np_), np.uint8)
        codes_p[: codes.shape[0], :n] = codes
    mins_p = hibits_p = None
    if qtype in ("q4_1", "q5_1"):
        mins_p = np.zeros((nb, np_), np.float32)
        mins_p[: mins.shape[0], :n] = mins
    if qtype in ("q5_0", "q5_1"):
        hibits_p = np.zeros((nb * 4, np_), np.uint8)
        hibits_p[: hibits.shape[0], :n] = hibits
    return QTensor(
        codes=jnp.asarray(codes_p), scales=jnp.asarray(scales_p), shape=(k, n), qtype=qtype,
        mins=None if mins_p is None else jnp.asarray(mins_p),
        hibits=None if hibits_p is None else jnp.asarray(hibits_p),
    )

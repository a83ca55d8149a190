"""GGML-class block weight-only quantization as a JAX pytree leaf.

TPU-native replacement for the block formats in ggml's ``ggml-quants.c``
(linked by the reference build, /root/reference/mobilevit/Makefile:13-17).
Semantics follow GGML's Q8_0 / Q4_0: blocks of 32 consecutive weights along
the *reduction* dimension share one scale (weight-only, symmetric):

* **Q8_0**: ``d = absmax/127``, ``q = rint(x/d)`` stored int8, ``x ≈ q*d``.
* **Q4_0**: signed max ``m`` (value of largest magnitude), ``d = m/-8``,
  ``q = clamp(rint(x/d) + 8, 0, 15)`` stored as packed nibbles,
  ``x ≈ (q-8)*d`` — ggml's sign-flip trick so the extremal weight is exact.

Layout is TPU-first, not a copy of ggml's array-of-structs: a weight
``W[K, N]`` (in-features first, so ``y = x @ W``) is stored as

* ``codes``:  int8 ``(Kp, Np)`` (Q8_0) or packed uint8 ``(Kp//2, Np)`` (Q4_0)
* ``scales``: float32 ``(Kp//32, Np)``

where ``Kp``/``Np`` are padded up to the TPU tile grid (K to the 32-element
block, N to the 128-lane boundary) at quantize time so that the fused
dequant+matmul Pallas kernel (quant/pallas_kernels.py) never re-pads at run
time. The logical shape is kept as static aux data on the pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 32  # weights per scale block, along the reduction dim (ggml's QK8_0/QK4_0)
LANE = 128  # TPU lane width; N is padded to this


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _native_quantize(w: np.ndarray, qtype: str):
    """Try the C++ codec (runtime/); returns (codes, scales) unpadded-N or None."""
    try:
        from ggml_experiments_tpu import runtime
    except Exception:  # pragma: no cover
        return None
    if qtype == "q8_0":
        return runtime.quantize_q8_0(w)
    if qtype == "q4_0":
        return runtime.quantize_q4_0(w)
    return None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A block-quantized 2-D weight. Pytree: (codes, scales) leaves; static aux."""

    codes: jax.Array   # int8 (Kp, Np) for q8_0; uint8 (Kp//2, Np) packed for q4_0
    scales: jax.Array  # f32 (Kp//32, Np)
    shape: Tuple[int, int]  # logical (K, N)
    qtype: str  # "q8_0" | "q4_0"

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (self.codes, self.scales), (self.shape, self.qtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, scales = children
        shape, qtype = aux
        return cls(codes=codes, scales=scales, shape=shape, qtype=qtype)

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
        return self.codes.size * self.codes.dtype.itemsize + self.scales.size * 4

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


def quantize(w, qtype: str = "q8_0") -> QTensor:
    """Quantize a float ``(K, N)`` weight into a :class:`QTensor`.

    Runs in numpy on the host: quantization is a load/convert-time operation
    and must not trigger a device compile (remote-compile latency on a
    tunneled TPU makes per-weight jit round-trips prohibitive). The resulting
    buffers are placed on the default device.
    """
    w = np.asarray(w)
    if w.ndim != 2:
        raise ValueError(f"QTensor quantizes 2-D weights, got shape {w.shape}")
    k, n = w.shape

    # native fast path (runtime/libgxt.so, the ggml-quants.c replacement);
    # numpy below is the bit-identical reference implementation
    native = _native_quantize(w, qtype)
    if native is not None:
        codes, d = native
        np_ = _round_up(n, LANE)
        if np_ != n:  # lane-pad columns (scale 0 / q==0 ⇒ zero contribution)
            d = np.pad(d, ((0, 0), (0, np_ - n)))
            pad_val = 0 if qtype == "q8_0" else 0x88
            codes = np.pad(codes, ((0, 0), (0, np_ - n)), constant_values=pad_val)
        return QTensor(
            codes=jnp.asarray(codes), scales=jnp.asarray(d), shape=(k, n), qtype=qtype
        )

    w_blocks, kp, np_ = _blockify(w)
    if qtype == "q8_0":
        q, d = _quantize_q8_0_arrays(w_blocks)
        codes = q.reshape(kp, np_)
    elif qtype == "q4_0":
        q, d = _quantize_q4_0_arrays(w_blocks)
        q = q.reshape(kp, np_)
        # pack within each 32-row block: byte i of block b holds rows
        # (32b+i, 32b+16+i) as (low, high) nibble. Unpacking is then a
        # block-local concat — no cross-tile dependency (the fused kernel can
        # tile K at any whole-block granularity) and no even/odd interleave
        # shuffle (which Mosaic's TPU lowering rejects).
        q3 = q.reshape(kp // BLOCK, BLOCK, np_)
        codes = (q3[:, : BLOCK // 2] | (q3[:, BLOCK // 2 :] << 4)).reshape(kp // 2, np_)
        codes = codes.astype(np.uint8)
    else:
        raise ValueError(f"unknown qtype {qtype!r} (expected 'q8_0' or 'q4_0')")
    return QTensor(codes=jnp.asarray(codes), scales=jnp.asarray(d), shape=(k, n), qtype=qtype)


def unpack_q4(codes: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Unpack uint8 nibble-packed (Kp//2, Np) -> (Kp, Np) values in [-8, 7].

    Inverse of the block-local packing in :func:`quantize`: packed byte i of
    block b holds unpacked rows (32b+i, 32b+16+i) as (low, high) nibbles.
    Arithmetic runs in ``dtype`` (float by default): Mosaic's TPU lowering
    has no int8 subtract.
    """
    half, np_ = codes.shape
    nb = (2 * half) // BLOCK
    # widen to int32 first: Mosaic has no uint8->f32 cast and no int8 subtract
    c3 = codes.reshape(nb, BLOCK // 2, np_).astype(jnp.int32)
    lo = (c3 & 0xF) - 8
    hi = (c3 >> 4) - 8
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * half, np_).astype(dtype)


def _unpack_q4_np(codes: np.ndarray) -> np.ndarray:
    half, np_ = codes.shape
    nb = (2 * half) // BLOCK
    c3 = codes.reshape(nb, BLOCK // 2, np_)
    lo = (c3 & 0xF).astype(np.float32) - 8
    hi = (c3 >> 4).astype(np.float32) - 8
    return np.concatenate([lo, hi], axis=1).reshape(2 * half, np_)


def dequantize(qt: QTensor) -> jax.Array:
    """Host-side (numpy) dequantization — the semantic reference the Pallas
    kernel must match. Load/convert-time only; never runs on device."""
    codes = np.asarray(qt.codes)
    scales = np.asarray(qt.scales)
    if qt.qtype == "q8_0":
        q = codes.astype(np.float32)
    elif qt.qtype == "q4_0":
        q = _unpack_q4_np(codes)
    else:
        raise ValueError(qt.qtype)
    kp, np_ = q.shape
    w = (q.reshape(kp // BLOCK, BLOCK, np_) * scales[:, None, :]).reshape(kp, np_)
    k, n = qt.shape
    return jnp.asarray(w[:k, :n])


def quantization_error(w, qtype: str = "q8_0") -> float:
    """Max-abs dequantization error — used by the Δ-vs-FP32 tests."""
    w = jnp.asarray(w, jnp.float32)
    return float(jnp.max(jnp.abs(dequantize(quantize(w, qtype)) - w)))


def to_numpy_blocks(qt: QTensor):
    """Export logical-region (codes, scales) as numpy, unpadded along N/K.

    Used by the format writers (formats/) which store the logical tensor.
    """
    k, n = qt.shape
    nb = (k + BLOCK - 1) // BLOCK
    scales = np.asarray(qt.scales)[:nb, :n]
    if qt.qtype == "q8_0":
        codes = np.asarray(qt.codes)[: nb * BLOCK, :n]
    else:
        codes = np.asarray(qt.codes)[: (nb * BLOCK) // 2, :n]
    return codes, scales


def from_numpy_blocks(codes, scales, shape, qtype: str) -> QTensor:
    """Rebuild a padded QTensor from logical-region blocks (inverse of above)."""
    k, n = shape
    kp, np_ = _round_up(k, BLOCK), _round_up(n, LANE)
    nb = kp // BLOCK
    scales_p = np.zeros((nb, np_), np.float32)
    scales_p[: scales.shape[0], :n] = scales
    if qtype == "q8_0":
        codes_p = np.zeros((kp, np_), np.int8)
        codes_p[: codes.shape[0], :n] = codes
    else:
        codes_p = np.zeros((kp // 2, np_), np.uint8)
        # padded-N nibbles of 0 decode to -8; zero their scale instead (done above)
        codes_p[: codes.shape[0], :n] = codes
        codes_p[codes.shape[0]:, :] = 0x88  # (0|8)<<4|(0|8): decodes to q=8-8=0
        codes_p[:, n:] = 0x88
    return QTensor(
        codes=jnp.asarray(codes_p), scales=jnp.asarray(scales_p), shape=(k, n), qtype=qtype
    )

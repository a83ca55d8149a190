"""Native runtime bindings (ctypes over libgxt.so) with pure-Python fallback.

The framework's native layer — replacing the role of the reference's compiled
ggml/ggml-quants objects and C++ loaders (mobilevit/Makefile:13-17). The TPU
compute path is JAX/XLA/Pallas; this library accelerates the host-side
runtime: block quantization codecs and binary weight-format parsing. Built
on demand with the repo toolchain (``make``); every entry point has a numpy
fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libgxt.so")
_ABI = 3  # 3: +q4_k decode; 2: +q4_1/q5_0/q5_1 codecs
_lock = threading.RLock()  # re-entrant: _load() calls build_native(force=True) under it
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build_native(force: bool = False) -> bool:
    """Compile libgxt.so (idempotent). Returns True if the library is usable."""
    global _build_failed
    with _lock:
        if os.path.exists(_SO) and not force:
            return True
        if _build_failed and not force:
            return False
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s", "libgxt.so"],
                check=True, capture_output=True, timeout=120,
            )
            return os.path.exists(_SO)
        except Exception:
            _build_failed = True
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build_native():
        return None
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_SO)
            lib.gxt_abi_version.restype = ctypes.c_int
            if lib.gxt_abi_version() != _ABI:
                del lib  # stale build from an older checkout: rebuild in place
                subprocess.run(["make", "-C", _DIR, "-s", "clean"],
                               check=False, capture_output=True, timeout=60)
                if not build_native(force=True):
                    raise RuntimeError("libgxt ABI mismatch and rebuild failed")
                lib = ctypes.CDLL(_SO)
                lib.gxt_abi_version.restype = ctypes.c_int
                if lib.gxt_abi_version() != _ABI:
                    raise RuntimeError("libgxt ABI mismatch — run make clean && rebuild")
            _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


# ---------------------------------------------------------------------------
# Quant codecs
# ---------------------------------------------------------------------------

def quantize_q8_0(w: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native Q8_0: (codes int8 (Kp, N), scales f32 (Kp/32, N)) or None."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    kp = (k + 31) // 32 * 32
    codes = np.empty((kp, n), np.int8)
    scales = np.empty((kp // 32, n), np.float32)
    rc = lib.q8_0_quantize(_ptr(w), ctypes.c_int64(k), ctypes.c_int64(n),
                           _ptr(codes), _ptr(scales))
    if rc != 0:
        raise RuntimeError(f"q8_0_quantize failed rc={rc}")
    return codes, scales


def quantize_q4_0(w: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    kp = (k + 31) // 32 * 32
    codes = np.empty((kp // 2, n), np.uint8)
    scales = np.empty((kp // 32, n), np.float32)
    rc = lib.q4_0_quantize(_ptr(w), ctypes.c_int64(k), ctypes.c_int64(n),
                           _ptr(codes), _ptr(scales))
    if rc != 0:
        raise RuntimeError(f"q4_0_quantize failed rc={rc}")
    return codes, scales


def quantize_q4_1(w: np.ndarray):
    """Native Q4_1: (codes u8 (Kp/2, N), scales f32, mins f32) or None."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    kp = (k + 31) // 32 * 32
    codes = np.empty((kp // 2, n), np.uint8)
    scales = np.empty((kp // 32, n), np.float32)
    mins = np.empty((kp // 32, n), np.float32)
    rc = lib.q4_1_quantize(_ptr(w), ctypes.c_int64(k), ctypes.c_int64(n),
                           _ptr(codes), _ptr(scales), _ptr(mins))
    if rc != 0:
        raise RuntimeError(f"q4_1_quantize failed rc={rc}")
    return codes, scales, mins


def quantize_q5_0(w: np.ndarray):
    """Native Q5_0: (codes u8 (Kp/2, N), hibits u8 (Kp/8, N), scales) or None."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    kp = (k + 31) // 32 * 32
    codes = np.empty((kp // 2, n), np.uint8)
    hibits = np.empty((kp // 8, n), np.uint8)
    scales = np.empty((kp // 32, n), np.float32)
    rc = lib.q5_0_quantize(_ptr(w), ctypes.c_int64(k), ctypes.c_int64(n),
                           _ptr(codes), _ptr(hibits), _ptr(scales))
    if rc != 0:
        raise RuntimeError(f"q5_0_quantize failed rc={rc}")
    return codes, hibits, scales


def quantize_q5_1(w: np.ndarray):
    """Native Q5_1: (codes, hibits, scales, mins) or None."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    kp = (k + 31) // 32 * 32
    codes = np.empty((kp // 2, n), np.uint8)
    hibits = np.empty((kp // 8, n), np.uint8)
    scales = np.empty((kp // 32, n), np.float32)
    mins = np.empty((kp // 32, n), np.float32)
    rc = lib.q5_1_quantize(_ptr(w), ctypes.c_int64(k), ctypes.c_int64(n),
                           _ptr(codes), _ptr(hibits), _ptr(scales), _ptr(mins))
    if rc != 0:
        raise RuntimeError(f"q5_1_quantize failed rc={rc}")
    return codes, hibits, scales, mins


def dequantize(codes: np.ndarray, scales: np.ndarray, qtype: str,
               mins: Optional[np.ndarray] = None,
               hibits: Optional[np.ndarray] = None,
               supers: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = codes.shape[1]
    if qtype == "q4_k":
        # scales/mins are uint8 sub-block CODES; supers f32 stacked halves
        codes = np.ascontiguousarray(codes, np.uint8)
        sc = np.ascontiguousarray(scales, np.uint8)
        mc = np.ascontiguousarray(mins, np.uint8)
        sp = np.ascontiguousarray(supers, np.float32)
        kp = codes.shape[0] * 2
        ns = sp.shape[0] // 2
        out = np.empty((kp, n), np.float32)
        rc = lib.q4_k_dequantize(_ptr(codes), _ptr(sc), _ptr(mc), _ptr(sp),
                                 ctypes.c_int64(kp), ctypes.c_int64(n),
                                 ctypes.c_int64(ns), _ptr(out))
        if rc != 0:
            raise RuntimeError(f"q4_k_dequantize failed rc={rc}")
        return out
    scales = np.ascontiguousarray(scales, np.float32)
    if qtype == "q8_0":
        codes = np.ascontiguousarray(codes, np.int8)
        kp = codes.shape[0]
        out = np.empty((kp, n), np.float32)
        rc = lib.q8_0_dequantize(_ptr(codes), _ptr(scales),
                                 ctypes.c_int64(kp), ctypes.c_int64(n), _ptr(out))
    elif qtype == "q4_0":
        codes = np.ascontiguousarray(codes, np.uint8)
        kp = codes.shape[0] * 2
        out = np.empty((kp, n), np.float32)
        rc = lib.q4_0_dequantize(_ptr(codes), _ptr(scales),
                                 ctypes.c_int64(kp), ctypes.c_int64(n), _ptr(out))
    elif qtype == "q4_1":
        codes = np.ascontiguousarray(codes, np.uint8)
        mins = np.ascontiguousarray(mins, np.float32)
        kp = codes.shape[0] * 2
        out = np.empty((kp, n), np.float32)
        rc = lib.q4_1_dequantize(_ptr(codes), _ptr(scales), _ptr(mins),
                                 ctypes.c_int64(kp), ctypes.c_int64(n), _ptr(out))
    elif qtype == "q5_0":
        codes = np.ascontiguousarray(codes, np.uint8)
        hibits = np.ascontiguousarray(hibits, np.uint8)
        kp = codes.shape[0] * 2
        out = np.empty((kp, n), np.float32)
        rc = lib.q5_0_dequantize(_ptr(codes), _ptr(hibits), _ptr(scales),
                                 ctypes.c_int64(kp), ctypes.c_int64(n), _ptr(out))
    elif qtype == "q5_1":
        codes = np.ascontiguousarray(codes, np.uint8)
        hibits = np.ascontiguousarray(hibits, np.uint8)
        mins = np.ascontiguousarray(mins, np.float32)
        kp = codes.shape[0] * 2
        out = np.empty((kp, n), np.float32)
        rc = lib.q5_1_dequantize(_ptr(codes), _ptr(hibits), _ptr(scales), _ptr(mins),
                                 ctypes.c_int64(kp), ctypes.c_int64(n), _ptr(out))
    else:
        raise ValueError(qtype)
    if rc != 0:
        raise RuntimeError(f"{qtype}_dequantize failed rc={rc}")
    return out


def bilinear_resize_u8(img: np.ndarray, out_h: int, out_w: int, scale: float):
    """Native bilinear resample (reference-exact); None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    rc = lib.bilinear_resize_u8(
        _ptr(img), ctypes.c_int64(h), ctypes.c_int64(w), ctypes.c_int64(c),
        ctypes.c_int64(out_h), ctypes.c_int64(out_w), ctypes.c_float(scale), _ptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"bilinear_resize_u8 failed rc={rc}")
    return out


def png_unfilter(raw: np.ndarray, filters: np.ndarray, bpp: int):
    """Native PNG scanline unfilter: raw (H, stride) filtered bytes +
    per-row filter types -> reconstructed bytes. None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    filters = np.ascontiguousarray(filters, np.uint8)
    h, stride = raw.shape
    out = np.empty((h, stride), np.uint8)
    rc = lib.png_unfilter(
        _ptr(raw), ctypes.c_int64(h), ctypes.c_int64(stride), ctypes.c_int64(bpp),
        _ptr(filters), _ptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"png_unfilter failed rc={rc} (bad filter byte?)")
    return out


# ---------------------------------------------------------------------------
# Format parsers (index natively, bulk-read payloads with numpy)
# ---------------------------------------------------------------------------

_MAX_TENSORS = 4096


def read_named_tensors_native(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Native-index weight.ggml reader; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    lib.ggml_named_index.restype = ctypes.c_int64
    name_buf = ctypes.create_string_buffer(1 << 20)
    n_dims = np.zeros(_MAX_TENSORS, np.int32)
    dims = np.zeros(_MAX_TENSORS * 4, np.int32)
    offsets = np.zeros(_MAX_TENSORS, np.int64)
    count = lib.ggml_named_index(
        path.encode(), name_buf, ctypes.c_int64(len(name_buf)),
        _ptr(n_dims), _ptr(dims), _ptr(offsets), ctypes.c_int64(_MAX_TENSORS),
    )
    if count < 0:
        raise ValueError(f"{path}: native parse error {-count}")
    names = name_buf.raw.split(b"\0")[: count]
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        for i in range(count):
            shape = tuple(int(d) for d in dims[i * 4 : i * 4 + n_dims[i]])
            f.seek(int(offsets[i]))
            out[names[i].decode("ascii")] = np.fromfile(
                f, "<f4", count=int(np.prod(shape))
            ).reshape(shape)
    return out


def read_gru_bin_native(path: str) -> Optional[List[np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    lib.gru_bin_index.restype = ctypes.c_int64
    n_dims = np.zeros(_MAX_TENSORS, np.int32)
    dims = np.zeros(_MAX_TENSORS * 4, np.int32)
    offsets = np.zeros(_MAX_TENSORS, np.int64)
    count = lib.gru_bin_index(
        path.encode(), _ptr(n_dims), _ptr(dims), _ptr(offsets), ctypes.c_int64(_MAX_TENSORS)
    )
    if count < 0:
        raise ValueError(f"{path}: native parse error {-count}")
    out: List[np.ndarray] = []
    with open(path, "rb") as f:
        for i in range(count):
            shape = tuple(int(d) for d in dims[i * 4 : i * 4 + n_dims[i]])
            f.seek(int(offsets[i]))
            out.append(np.fromfile(f, "<f4", count=int(np.prod(shape))).reshape(shape))
    return out

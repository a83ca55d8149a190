"""Reader/writer for the reference's positional GRU weight file (``gru.bin``).

Format (writer: /root/reference/rnn_text_gen/rnn_text_generation.py:102-115;
reader: rnn_text_generation.cpp:117-147): per tensor, ``int32 n_dims``, then
the dims **in reversed order** ("because the order of dimensions are reversed
in GGML"), then raw little-endian float32 data, row-major in the original TF
shape. No names, no magic, no dtype tags — tensors are identified purely by
position:

  0. embeddings        (vocab, embed)   = (66, 256)
  1. cell kernel       (embed, 3*units) = (256, 3072)
  2. recurrent kernel  (units, 3*units) = (1024, 3072)
  3. cell bias         (2, 3*units)     = (2, 3072)
  4. dense kernel      (units, vocab)   = (1024, 66)
  5. dense bias        (vocab,)         = (66,)

Because this framework keeps TF's in-features-first layout throughout, the
raw data loads with no transposes (the reference instead pre-transposes three
kernels with a one-off ggml graph at load, .cpp:149-158).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, List, Optional

import jax.numpy as jnp
import numpy as np

from ggml_experiments_tpu.models.gru_textgen import GRUConfig, GRUTextGenParams
from ggml_experiments_tpu.ops.gru import GRUCellParams
from ggml_experiments_tpu.quant import quantize


def _read_tensor(f: BinaryIO) -> Optional[np.ndarray]:
    head = f.read(4)
    if len(head) == 0:
        return None
    if len(head) < 4:
        raise EOFError("truncated gru.bin record header")
    (n_dims,) = struct.unpack("<i", head)
    if not 0 < n_dims <= 4:
        raise ValueError(f"implausible gru.bin n_dims {n_dims}")
    body = f.read(4 * n_dims)
    if len(body) != 4 * n_dims:
        raise EOFError(f"truncated gru.bin dims ({len(body)}/{4 * n_dims} bytes)")
    dims = struct.unpack(f"<{n_dims}i", body)
    if any(d <= 0 for d in dims):
        raise ValueError(f"implausible gru.bin dims {dims}")
    shape = tuple(reversed(dims))  # file stores dims reversed
    count = int(np.prod(shape))
    data = np.fromfile(f, dtype="<f4", count=count)
    if data.size != count:
        raise EOFError(f"truncated gru.bin tensor: wanted {count} floats, got {data.size}")
    return data.reshape(shape)


def _write_tensor(f: BinaryIO, arr: np.ndarray) -> None:
    arr = np.ascontiguousarray(arr, dtype="<f4")
    f.write(struct.pack("<i", arr.ndim))
    for d in reversed(arr.shape):
        f.write(struct.pack("<i", d))
    arr.tofile(f)


def read_tensors(path: str) -> List[np.ndarray]:
    try:
        from ggml_experiments_tpu import runtime

        native = runtime.read_gru_bin_native(path)
        if native is not None:
            return native
    except ValueError:
        raise
    except Exception:
        pass
    return read_tensors_py(path)


def read_tensors_py(path: str) -> List[np.ndarray]:
    """Pure-Python reference parser (fallback + native-parity oracle)."""
    out = []
    with open(path, "rb") as f:
        while True:
            t = _read_tensor(f)
            if t is None:
                return out
            out.append(t)


def load_gru_params(
    path: str, *, qtype: Optional[str] = None, weights_dtype: Optional[str] = None
) -> GRUTextGenParams:
    """Load ``gru.bin`` into model params; optionally quantize the big kernels.

    ``qtype`` in {None} | QTYPES (q8_0/q4_0/q4_1/q5_0/q5_1): the
    cell/recurrent/dense kernels are
    block-quantized (weight-only); embeddings and biases stay float32, like
    ggml quantized models keep small tensors in high precision.
    ``weights_dtype="bfloat16"`` stores *unquantized* kernels in bf16 (half
    the HBM of f32; ignored for quantized kernels).
    """
    tensors = read_tensors(path)
    if len(tensors) != 6:
        raise ValueError(f"{path}: expected 6 tensors, found {len(tensors)}")
    emb, kernel, rec_kernel, bias, dense_k, dense_b = tensors
    u = rec_kernel.shape[0]
    if kernel.shape[1] != 3 * u or rec_kernel.shape[1] != 3 * u or bias.shape != (2, 3 * u):
        raise ValueError(
            f"{path}: inconsistent GRU shapes: kernel {kernel.shape}, "
            f"recurrent {rec_kernel.shape}, bias {bias.shape}"
        )

    def maybe_q(w):
        if qtype:
            return quantize(w, qtype)
        if weights_dtype:
            return jnp.asarray(w).astype(weights_dtype)
        return jnp.asarray(w)

    return GRUTextGenParams(
        embeddings=jnp.asarray(emb),
        cell=GRUCellParams(
            kernel=maybe_q(kernel),
            recurrent_kernel=maybe_q(rec_kernel),
            bias=jnp.asarray(bias),
        ),
        dense_kernel=maybe_q(dense_k),
        dense_bias=jnp.asarray(dense_b),
    )


def save_gru_params(path: str, params: GRUTextGenParams) -> None:
    """Write params in the reference's exact binary layout (QTensors are
    dequantized — the format is float32-only)."""

    def to_np(w):
        return np.asarray(w.dequantize() if hasattr(w, "dequantize") else w)

    with open(path, "wb") as f:
        _write_tensor(f, to_np(params.embeddings))
        _write_tensor(f, to_np(params.cell.kernel))
        _write_tensor(f, to_np(params.cell.recurrent_kernel))
        _write_tensor(f, to_np(params.cell.bias))
        _write_tensor(f, to_np(params.dense_kernel))
        _write_tensor(f, to_np(params.dense_bias))


def config_from_params(params: GRUTextGenParams) -> GRUConfig:
    v, e = params.embeddings.shape
    return GRUConfig(vocab_size=v, embed_dim=e, units=params.units)


def load_gru_checkpoint(path: str) -> GRUTextGenParams:
    """Load GRU params from a native .gxt checkpoint (float or quantized).

    Structure-free: rebuilds the params dataclass from the checkpoint's
    canonical key paths, so a quantize-CLI output serves directly.
    """
    from ggml_experiments_tpu.formats.checkpoint import load_arrays

    flat = load_arrays(path)

    def pick(*names):
        for n in names:
            if n in flat:
                return flat[n]
        raise KeyError(f"{path}: none of {names} present; keys: {sorted(flat)[:8]}...")

    return GRUTextGenParams(
        embeddings=pick("embeddings"),
        cell=GRUCellParams(
            kernel=pick("cell/kernel"),
            recurrent_kernel=pick("cell/recurrent_kernel"),
            bias=flat.get("cell/bias"),
        ),
        dense_kernel=pick("dense_kernel"),
        dense_bias=flat.get("dense_bias"),
    )


def load_gru_any(path: str, *, qtype=None) -> GRUTextGenParams:
    """Dispatch on extension: .gxt native checkpoint, else reference gru.bin."""
    if path.endswith(".gxt"):
        params = load_gru_checkpoint(path)
        if qtype is not None and not hasattr(params.cell.kernel, "qtype"):
            from ggml_experiments_tpu.quant import quantize

            params.cell.kernel = quantize(np.asarray(params.cell.kernel), qtype)
            params.cell.recurrent_kernel = quantize(
                np.asarray(params.cell.recurrent_kernel), qtype
            )
            params.dense_kernel = quantize(np.asarray(params.dense_kernel), qtype)
        return params
    return load_gru_params(path, qtype=qtype)

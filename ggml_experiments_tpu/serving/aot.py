"""Ahead-of-time program export for deployment (jax.export / StableHLO).

The reference's deployment story is a compiled C++ binary plus a weight file
(/root/reference/mobilevit/main.cpp:649-706 — build once, ship, run). The
TPU-native counterpart: serialize the traced, shape-specialized decode /
feature-extraction programs as portable StableHLO artifacts via ``jax.export``
and pair them with a GXT weight checkpoint. A serving host then needs only
the JAX runtime and the two files — no model-building code, no tracing, no
Python-side graph construction at startup.

Artifact container (``.gxa``): ``GXA1`` magic | uint64 header_len | JSON
header (kind, arg shapes, platforms, jax version) | the ``jax.export``
serialization blob. The params pytree rides as a *call argument*, so one
artifact serves any weight file with matching shapes/qtype.

QTensor and the framework's param dataclasses are registered with
``jax.export``'s pytree-serialization registry on import (the in-tree
pytree registration alone is not enough for serialized artifacts).
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

MAGIC = b"GXA1"

_registered = False


def _enc(obj):
    """JSON-encode pytree auxdata, keeping the tuple/list distinction."""
    if isinstance(obj, tuple):
        return {"t": "tuple", "v": [_enc(x) for x in obj]}
    if isinstance(obj, list):
        return {"t": "list", "v": [_enc(x) for x in obj]}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"t": "v", "v": obj}
    raise TypeError(f"unserializable auxdata {type(obj)}: {obj!r}")


def _dec(d):
    if d["t"] == "tuple":
        return tuple(_dec(x) for x in d["v"])
    if d["t"] == "list":
        return [_dec(x) for x in d["v"]]
    return d["v"]


def register_serializations() -> None:
    """Register QTensor + params dataclasses with jax.export (idempotent)."""
    global _registered
    if _registered:
        return
    from ggml_experiments_tpu.models.gru_textgen import GRUTextGenParams
    from ggml_experiments_tpu.models.mobilevit import (
        InvertedResidualParams,
        MobileViTBlockParams,
        MobileViTParams,
        TransformerLayerParams,
    )
    from ggml_experiments_tpu.ops.attention import AttentionParams
    from ggml_experiments_tpu.ops.conv import ConvBNAct, SpaceToDepthStem
    from ggml_experiments_tpu.ops.gru import GRUCellParams
    from ggml_experiments_tpu.ops.norm import FoldedBN
    from ggml_experiments_tpu.quant.qtensor import QTensor

    # NamedTuples inside param pytrees need their own registration path
    # (register_pytree_node_serialization rejects namedtuple classes).
    jax_export.register_namedtuple_serialization(
        FoldedBN, serialized_name="ggml_experiments_tpu.FoldedBN"
    )

    for cls in (
        QTensor,
        GRUTextGenParams,
        GRUCellParams,
        AttentionParams,
        ConvBNAct,
        SpaceToDepthStem,
        InvertedResidualParams,
        TransformerLayerParams,
        MobileViTBlockParams,
        MobileViTParams,
    ):
        jax_export.register_pytree_node_serialization(
            cls,
            serialized_name=f"ggml_experiments_tpu.{cls.__name__}",
            serialize_auxdata=lambda aux: json.dumps(_enc(aux)).encode(),
            deserialize_auxdata=lambda b: _dec(json.loads(b.decode())),
        )
    _registered = True


def save_artifact(path: str, blob: bytes, meta: Dict[str, Any]) -> None:
    header = json.dumps({"version": 1, "jax": jax.__version__, **meta}).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)


def load_artifact(path: str):
    """Read a ``.gxa`` file -> (meta dict, jax.export.Exported)."""
    register_serializations()
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a GXA1 AOT artifact")
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen))
        exported = jax_export.deserialize(f.read())
    return meta, exported


def export_gru_decode(
    params,
    *,
    batch: int,
    prompt_len: int,
    total_steps: int,
    path: Optional[str] = None,
    platforms: Optional[Tuple[str, ...]] = None,
    qtype: Optional[str] = None,
) -> bytes:
    """Export greedy batch decode at fixed (batch, prompt_len, total_steps).

    The exported program's signature is ``(params, prompt i32 (B, P),
    lengths i32 (B,)) -> tokens i32 (B, total_steps)`` — the scan-based
    counterpart of the reference's per-token loop (rnn_text_generation.cpp
    :266-314), frozen into one deployable program.
    """
    from ggml_experiments_tpu.models import gru_textgen

    register_serializations()
    jitted = jax.jit(gru_textgen.generate, static_argnames=("total_steps",))
    prompt = jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32)
    lengths = jax.ShapeDtypeStruct((batch,), jnp.int32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exp = jax_export.export(jitted, **kwargs)(
        params, prompt, lengths, total_steps=total_steps
    )
    blob = exp.serialize()
    if path:
        save_artifact(path, blob, {
            "kind": "gru-decode",
            "batch": batch, "prompt_len": prompt_len, "total_steps": total_steps,
            "platforms": list(exp.platforms), "qtype": qtype,
        })
    return blob


def export_mobilevit_features(
    params,
    *,
    batch: int,
    image_size: int,
    path: Optional[str] = None,
    platforms: Optional[Tuple[str, ...]] = None,
    qtype: Optional[str] = None,
) -> bytes:
    """Export feature extraction at a fixed batch: ``(params, images f32
    (B, S, S, 3)) -> features (B, S/32, S/32, C)`` — the deployable form of
    the reference's extract_features (main.cpp:604-646)."""
    from ggml_experiments_tpu.models.mobilevit import extract_features

    register_serializations()
    images = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exp = jax_export.export(jax.jit(extract_features), **kwargs)(params, images)
    blob = exp.serialize()
    if path:
        save_artifact(path, blob, {
            "kind": "mobilevit-features",
            "batch": batch, "image_size": image_size,
            "platforms": list(exp.platforms), "qtype": qtype,
        })
    return blob

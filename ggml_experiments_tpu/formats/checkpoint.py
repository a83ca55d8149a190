"""Native checkpoint container for float + block-quantized weight pytrees.

The reference has no inference checkpointing at all (SURVEY.md §5) — training
used Keras ``ModelCheckpoint`` and inference re-read ad-hoc binaries. This is
the framework-native store: one ``.gxt`` file holding an arbitrary pytree of
arrays and :class:`QTensor` leaves.

Layout:  ``GXT1`` magic | uint64 header_len | JSON header | 64-byte-aligned
raw little-endian tensor blobs. The header maps flattened pytree key-paths to
dtype/shape/offset (QTensor leaves expand to ``<path>.codes`` +
``<path>.scales`` with the logical shape and qtype recorded), so files are
self-describing, mmap-friendly, and diffable with a five-line script —
in the same spirit as safetensors, but quantization-aware.
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ggml_experiments_tpu.quant.qtensor import (
    QTensor,
    from_numpy_blocks,
    to_numpy_blocks,
)

MAGIC = b"GXT1"
ALIGN = 64

_DTYPES = {
    "float32": np.float32,
    "float16": np.float16,
    "bfloat16": None,  # handled via uint16 view
    "int8": np.int8,
    "uint8": np.uint8,
    "int32": np.int32,
    "int64": np.int64,   # train-state step counters
    "uint32": np.uint32,
    "bool": np.bool_,
}


def _keystr(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _np_for_write(arr) -> Tuple[np.ndarray, str]:
    a = np.asarray(arr)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def save(path: str, tree: Any, meta: Optional[Dict] = None) -> None:
    """Serialize a pytree of jax/np arrays and QTensors to ``path``.

    ``meta``: optional JSON-serializable dict stored in the header (model
    kind/config for self-describing checkpoints — read via :func:`read_meta`
    without touching tensor data).

    The write is ATOMIC (temp file + os.replace): checkpoints exist to
    survive crashes, so a crash mid-save must leave the previous good file
    intact rather than a truncated one."""
    leaves = jax.tree_util.tree_flatten_with_path(tree, is_leaf=lambda x: isinstance(x, QTensor))[0]
    entries: List[Dict] = []
    blobs: List[np.ndarray] = []

    def add(name: str, arr, extra=None):
        a, dtype = _np_for_write(arr)
        e = {"name": name, "dtype": dtype, "shape": list(a.shape)}
        if extra:
            e.update(extra)
        entries.append(e)
        blobs.append(np.ascontiguousarray(a))

    for kp, leaf in leaves:
        name = _keystr(kp)
        if isinstance(leaf, QTensor):
            # store LOGICAL-region planes (lane/K padding trimmed — vision
            # widths pad 144->256 lanes, 1.8x file bloat otherwise); load
            # re-pads via from_numpy_blocks. "packed": "logical" marks the
            # trimmed layout; pre-round-5 files without it load as-is.
            qmeta = {"qtype": leaf.qtype, "logical_shape": list(leaf.shape),
                     "packed": "logical"}
            planes = to_numpy_blocks(leaf)
            add(name + ".codes", planes[0], {"quant": qmeta})
            add(name + ".scales", planes[1], {"quant": qmeta})
            if leaf.qtype == "q4_k":
                add(name + ".mins", planes[2], {"quant": qmeta})
                # lossless: quantize() rounds supers to f16-representable
                # values before deriving the code grid (quant/kquant.py)
                add(name + ".supers", planes[3].astype(np.float16),
                    {"quant": qmeta})
            elif len(planes) == 4:
                if planes[2] is not None:
                    add(name + ".mins", planes[2], {"quant": qmeta})
                if planes[3] is not None:
                    add(name + ".hibits", planes[3], {"quant": qmeta})
        else:
            # (None never appears here: it is an empty pytree, not a leaf —
            # load_into templates re-supply structural Nones)
            add(name, leaf)

    # assign offsets
    off = 0
    for e, b in zip(entries, blobs):
        off = (off + ALIGN - 1) // ALIGN * ALIGN
        e["offset"] = off
        e["nbytes"] = int(b.nbytes)
        off += b.nbytes
    head = {"version": 1, "tensors": entries}
    if meta:
        head["meta"] = meta
    header = json.dumps(head).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        base = f.tell()
        for e, b in zip(entries, blobs):
            f.seek(base + e["offset"])
            f.write(b.tobytes())
    os.replace(tmp, path)


def read_meta(path: str) -> Dict:
    """Header metadata only (no tensor reads); {} when absent."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a GXT1 checkpoint")
        (hlen,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(hlen)).get("meta", {})


def load_arrays(path: str) -> Dict[str, Any]:
    """Load as a flat dict ``{keypath: array | QTensor | None}``."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a GXT1 checkpoint")
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = f.tell()
        raw: Dict[str, np.ndarray] = {}
        meta: Dict[str, Dict] = {}
        for e in header["tensors"]:
            if e["dtype"] == "none":
                raw[e["name"]] = None
                continue
            f.seek(base + e["offset"])
            buf = f.read(e["nbytes"])
            if e["dtype"] == "bfloat16":
                a = np.frombuffer(buf, np.uint16).reshape(e["shape"])
                arr = jnp.asarray(a.view(jnp.bfloat16))
            else:
                arr = np.frombuffer(buf, _DTYPES[e["dtype"]]).reshape(e["shape"])
            raw[e["name"]] = arr
            if "quant" in e:
                meta[e["name"]] = e["quant"]

    out: Dict[str, Any] = {}
    done = set()
    for name, arr in raw.items():
        if name in done:
            continue
        if name.endswith(".codes") and name in meta:
            stem = name[: -len(".codes")]
            q = meta[name]
            mins = raw.get(stem + ".mins")
            hibits = raw.get(stem + ".hibits")
            supers = raw.get(stem + ".supers")
            if q.get("packed") == "logical":
                out[stem] = from_numpy_blocks(
                    np.asarray(raw[stem + ".codes"]),
                    np.asarray(raw[stem + ".scales"]),
                    tuple(q["logical_shape"]), q["qtype"],
                    mins=None if mins is None else np.asarray(mins),
                    hibits=None if hibits is None else np.asarray(hibits),
                    supers=None if supers is None else np.asarray(supers),
                )
            else:  # pre-round-5 layout: planes stored padded, load directly
                out[stem] = QTensor(
                    codes=jnp.asarray(raw[stem + ".codes"]),
                    scales=jnp.asarray(raw[stem + ".scales"]),
                    shape=tuple(q["logical_shape"]),
                    qtype=q["qtype"],
                    mins=None if mins is None else jnp.asarray(mins),
                    hibits=None if hibits is None else jnp.asarray(hibits),
                    supers=None if supers is None else jnp.asarray(supers),
                )
            done.update({stem + ".scales", stem + ".mins", stem + ".hibits",
                         stem + ".supers"})
        elif (
            name.endswith((".scales", ".mins", ".hibits", ".supers")) and name in meta
        ):
            continue  # paired with .codes
        else:
            out[name] = arr if arr is None else jnp.asarray(arr)
    return out


def load_into(path: str, template: Any) -> Any:
    """Load a checkpoint into the structure of ``template`` (same pytree)."""
    flat = load_arrays(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(
        template, is_leaf=lambda x: isinstance(x, QTensor)
    )
    new_leaves = []
    for kp, leaf in leaves:
        name = _keystr(kp)
        if name not in flat:
            raise KeyError(f"checkpoint {path} missing tensor {name!r}")
        new_leaves.append(flat[name])
    return jax.tree_util.tree_unflatten(treedef, [l for l in new_leaves])


@dataclasses.dataclass
class CheckpointManager:
    """Best-by-metric checkpoint rotation — the Keras ``ModelCheckpoint``
    (save_best_only, monitor=loss) equivalent used by training/
    (reference: rnn_text_generation.py:84-89)."""

    path: str
    best: float = float("inf")
    mode: str = "min"

    def maybe_save(self, tree: Any, metric: float) -> bool:
        better = metric < self.best if self.mode == "min" else metric > self.best
        if better:
            self.best = metric
            save(self.path, tree)
        return better

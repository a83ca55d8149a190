"""Device mesh construction and named-axis conventions.

The reference has no distributed layer at all (SURVEY.md §2.3 — its sole
concurrency is ggml's pthread pool invoked with n_threads=1), so this layer is
designed fresh for TPU: a 2-D ``jax.sharding.Mesh`` with axes

* ``"data"``  — batch/data parallelism (DP); gradients all-reduce over it
* ``"model"`` — tensor parallelism (TP); weight shards + activation
  collectives ride ICI within a slice

Axis names are kept extensible (a ``"sequence"`` axis could be appended) but
PP/EP/CP have no workload in these models — SURVEY.md §2.3 scopes them out.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"
AXES = (DATA_AXIS, MODEL_AXIS)


def infer_mesh_shape(n_devices: int, max_model: int = 8) -> Tuple[int, int]:
    """(data, model) shape: prefer TP up to ``max_model`` then scale DP."""
    model = 1
    for cand in (2, 4, 8):
        if cand <= max_model and n_devices % cand == 0:
            model = cand
    return n_devices // model, model


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = AXES,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = infer_mesh_shape(len(devs))
    d, m = shape
    if d * m != len(devs):
        raise ValueError(f"mesh shape {shape} != {len(devs)} devices")
    return Mesh(np.asarray(devs).reshape(d, m), axis_names)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return named(mesh, DATA_AXIS)

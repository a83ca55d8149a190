"""Mesh, sharding rules, and SPMD placement (DP + TP over ICI/DCN)."""

from ggml_experiments_tpu.parallel import mesh, multihost, sharding
from ggml_experiments_tpu.parallel.mesh import (
    AXES,
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    infer_mesh_shape,
    make_mesh,
)
from ggml_experiments_tpu.parallel.sharding import (
    gru_param_specs,
    mobilevit_param_specs,
    place,
)

__all__ = [
    "mesh",
    "multihost",
    "sharding",
    "AXES",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "infer_mesh_shape",
    "make_mesh",
    "gru_param_specs",
    "mobilevit_param_specs",
    "place",
]

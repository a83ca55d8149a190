"""Op surface replacing the ggml ops the reference uses (SURVEY.md §2.2)."""

from ggml_experiments_tpu.ops.activations import get_activation, sigmoid, silu, tanh
from ggml_experiments_tpu.ops.attention import AttentionParams, multi_head_attention
from ggml_experiments_tpu.ops.conv import ConvBNAct, conv2d, depthwise_conv2d
from ggml_experiments_tpu.ops import sampling
from ggml_experiments_tpu.ops.fused_gru_decode import fused_gru_decode
from ggml_experiments_tpu.ops.gru import (
    GRUCellParams,
    gru_cell,
    gru_combine,
    gru_sequence,
    input_projection,
    recurrent_projection,
)
from ggml_experiments_tpu.ops.linear import embedding_lookup, linear, matmul
from ggml_experiments_tpu.ops.norm import FoldedBN, apply_folded_bn, fold_batchnorm, layer_norm
from ggml_experiments_tpu.ops.patches import fold, unfold

__all__ = [
    "get_activation",
    "sigmoid",
    "silu",
    "tanh",
    "AttentionParams",
    "multi_head_attention",
    "ConvBNAct",
    "conv2d",
    "depthwise_conv2d",
    "GRUCellParams",
    "fused_gru_decode",
    "sampling",
    "gru_cell",
    "gru_combine",
    "gru_sequence",
    "input_projection",
    "recurrent_projection",
    "embedding_lookup",
    "linear",
    "matmul",
    "FoldedBN",
    "apply_folded_bn",
    "fold_batchnorm",
    "layer_norm",
    "fold",
    "unfold",
]

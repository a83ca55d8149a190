"""Model definitions: GRU text generator and MobileViT-small."""

from ggml_experiments_tpu.models import gru_textgen, mobilevit
from ggml_experiments_tpu.models.gru_textgen import GRUConfig, GRUTextGenParams
from ggml_experiments_tpu.models.mobilevit import MobileViTConfig, MobileViTParams

__all__ = [
    "gru_textgen",
    "mobilevit",
    "GRUConfig",
    "GRUTextGenParams",
    "MobileViTConfig",
    "MobileViTParams",
]

"""Weight serialization: reference binary formats + native checkpoints."""

from ggml_experiments_tpu.formats import checkpoint, ggml_named, gru_bin

__all__ = ["checkpoint", "ggml_named", "gru_bin"]

"""Training: GRU char-LM trainer + data pipeline (reference L5 equivalent)."""

from ggml_experiments_tpu.training import data, gru_trainer
from ggml_experiments_tpu.training.gru_trainer import TrainConfig, train, train_from_text

__all__ = ["data", "gru_trainer", "TrainConfig", "train", "train_from_text"]

"""Tokenizer, image IO/preprocessing, and misc utilities."""

from ggml_experiments_tpu.utils.tokenizer import SHAKESPEARE_VOCAB, CharTokenizer
from ggml_experiments_tpu.utils import image

__all__ = ["SHAKESPEARE_VOCAB", "CharTokenizer", "image"]

"""Serving: continuous-batching decode engine."""

from ggml_experiments_tpu.serving.engine import DecodeEngine, EngineStats, Request

__all__ = ["DecodeEngine", "EngineStats", "Request"]

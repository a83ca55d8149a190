"""Serving: continuous-batching decode engine + HTTP front-end."""

from ggml_experiments_tpu.serving.engine import DecodeEngine, EngineStats, Request
from ggml_experiments_tpu.serving.http import HttpFrontend

__all__ = ["DecodeEngine", "EngineStats", "HttpFrontend", "Request"]

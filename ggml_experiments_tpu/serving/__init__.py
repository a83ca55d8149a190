"""Serving: continuous-batching decode + vision engines, HTTP front-end."""

from ggml_experiments_tpu.serving.engine import DecodeEngine, EngineStats, Request
from ggml_experiments_tpu.serving.http import HttpFrontend
from ggml_experiments_tpu.serving.vision import (
    VisionEngine,
    VisionRequest,
    VisionStats,
)

__all__ = [
    "DecodeEngine",
    "EngineStats",
    "HttpFrontend",
    "Request",
    "VisionEngine",
    "VisionRequest",
    "VisionStats",
]

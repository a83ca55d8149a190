"""Observability: structured metrics, profiler hooks, roofline accounting.

The reference's only observability is std::cout tracing and a single wall
clock around graph compute (SURVEY.md §5). Here: JSONL metrics streams for
the north-star numbers (tokens/s/chip, images/s/chip), a jax.profiler trace
wrapper, and per-kernel roofline accounting so "speed-of-light" claims are
checkable numbers, not vibes.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict, Optional, TextIO


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Peak numbers for roofline accounting."""

    name: str
    bf16_tflops: float
    f32_tflops: float
    hbm_gbps: float


# TPU v5e (v5 litepod) public peaks
TPU_V5E = ChipSpec(name="tpu_v5e", bf16_tflops=197.0, f32_tflops=49.0, hbm_gbps=819.0)


@dataclasses.dataclass
class RooflineReport:
    flops: float
    bytes: float
    seconds: float
    chip: ChipSpec

    @property
    def intensity(self) -> float:
        return self.flops / max(self.bytes, 1)

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def achieved_gbps(self) -> float:
        return self.bytes / self.seconds / 1e9

    def bound(self, compute_peak_tflops: Optional[float] = None) -> str:
        peak = compute_peak_tflops or self.chip.bf16_tflops
        t_compute = self.flops / (peak * 1e12)
        t_memory = self.bytes / (self.chip.hbm_gbps * 1e9)
        return "compute" if t_compute >= t_memory else "memory"

    def speed_of_light_fraction(self, compute_peak_tflops: Optional[float] = None) -> float:
        """Achieved / max-achievable given the kernel's arithmetic intensity."""
        peak = compute_peak_tflops or self.chip.bf16_tflops
        t_ideal = max(
            self.flops / (peak * 1e12), self.bytes / (self.chip.hbm_gbps * 1e9)
        )
        return t_ideal / self.seconds

    def as_dict(self) -> Dict:
        return {
            "achieved_tflops": round(self.achieved_tflops, 2),
            "achieved_gbps": round(self.achieved_gbps, 1),
            "intensity_flops_per_byte": round(self.intensity, 2),
            "bound": self.bound(),
            "speed_of_light_fraction": round(self.speed_of_light_fraction(), 3),
        }


def qmatmul_roofline(
    m: int, k: int, n: int, seconds: float, *, qtype: str = "q8_0", chip: ChipSpec = TPU_V5E
) -> RooflineReport:
    """Roofline for one fused dequant+matmul: weights move compressed."""
    from ggml_experiments_tpu.quant.qtensor import QTYPE_BITS

    wbytes = k * n * QTYPE_BITS[qtype] / 8 + (k // 32) * n * 4
    if qtype in ("q4_1", "q5_1"):
        wbytes += (k // 32) * n * 4  # per-block min plane
    bytes_ = m * k * 4 + wbytes + m * n * 4
    return RooflineReport(flops=2.0 * m * k * n, bytes=bytes_, seconds=seconds, chip=chip)


def gru_decode_roofline(
    batch: int, embed: int, units: int, vocab: int, seconds_per_step: float,
    *, qtype: str = "q8_0", chip: ChipSpec = TPU_V5E,
) -> RooflineReport:
    """Per-step roofline of projected decode (recurrent matmul + vocab head;
    the input projection is a table gather)."""
    from ggml_experiments_tpu.quant.qtensor import QTYPE_BITS

    flops = 2.0 * batch * (units * 3 * units + units * vocab)
    wbytes = (units * 3 * units + units * vocab) * QTYPE_BITS[qtype] / 8
    bytes_ = flops / 2 * 0 + wbytes + batch * units * 4 * 2
    return RooflineReport(flops=flops, bytes=bytes_, seconds=seconds_per_step, chip=chip)


def gru_training_roofline(
    batch: int, seq: int, embed: int, units: int, vocab: int, seconds_per_step: float,
    *, chip: ChipSpec = TPU_V5E,
) -> RooflineReport:
    """Per-train-step roofline (fwd + ~2x bwd matmul FLOPs, Adam update).

    Bytes: f32 params read + grad/moment/param writes (5 passes over ~P
    params) plus bf16 scan activations — a coarse floor; the step is
    compute-bound at any realistic batch, so the FLOP term dominates SoL.
    """
    p = embed * 3 * units + units * 3 * units + units * vocab + vocab * embed
    flops = 3 * 2.0 * batch * seq * (embed * 3 * units + units * 3 * units + units * vocab)
    bytes_ = 5 * p * 4 + batch * seq * units * 4 * 2
    return RooflineReport(flops=flops, bytes=bytes_, seconds=seconds_per_step, chip=chip)


class MetricsLogger:
    """Append-only JSONL metrics stream (stdout-safe: defaults to a file)."""

    def __init__(self, path_or_file="metrics.jsonl"):
        self._file: Optional[TextIO] = None
        if hasattr(path_or_file, "write"):
            self._file = path_or_file
        else:
            self._path = path_or_file
        self._t0 = time.time()

    def log(self, event: str, **fields) -> None:
        rec = {"t": round(time.time() - self._t0, 4), "event": event, **fields}
        line = json.dumps(rec)
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()
        else:
            with open(self._path, "a") as f:
                f.write(line + "\n")


@contextlib.contextmanager
def profiler_trace(logdir: str = "/tmp/gxt_trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()

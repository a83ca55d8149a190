"""Canonical benchmark timing protocol — ONE definition, shared by bench.py
and tools/perf_report.py so recorded numbers are round-over-round comparable.

Why pipelined: the TPU here sits behind a tunneled PJRT backend where a
single dispatch+sync round-trip is ~40 ms and ``block_until_ready`` returns
before remote execution finishes. Throughput is therefore measured by
launching ``reps`` async calls and forcing completion once with a scalar
host read; per-call time = wall / reps. The first timed round after a
compile still runs 2-5x slow (warm-up artifact) and run-to-run variance
through the tunnel is ~±30%, so we take the best of ``rounds`` rounds.

Why dispersion-aware (rev 4): round 2 recorded two measurements of the same
fused-decode program 2.4x apart (BENCH_r02 36.3 ms vs PERF.md 15.1 ms) with
no way to tell contamination from regression after the fact. Every stat now
carries the median and the max/min spread across rounds, and a run whose
spread exceeds ``drift_spread`` re-runs extra rounds (up to
``max_extra_rounds``) — so a contaminated round is visible in the recorded
artifact (spread >> 1) instead of silently poisoning the best-of aggregate.

Why median headline (rev 5): with confirmed 2-10x platform spread across
rounds, *best*-of-rounds is the statistic most flattered by drift — round 3
recorded a config whose best beat the alternative path while its median lost
to it (PERF.md fused B=1024). The headline aggregate is now the
median-of-rounds (robust to a contaminated round in either direction); the
best is kept as an auxiliary column, and routing decisions (decode()'s
fused/scan thresholds, the engine's tick choice) are validated against
medians (VERDICT r3 #4).

The protocol constants live in :data:`PROTOCOL` and are emitted into
bench.py's JSON line, so every recorded BENCH_r{N} declares the method it
was measured with.
"""

from __future__ import annotations

import dataclasses
import statistics
import time
from typing import Callable

import jax.numpy as jnp

# The pinned protocol. Change => bump "rev" so recorded artifacts are
# distinguishable.
#
# rev 3: reps/round 8 -> 24. The tunnel adds ~4 ms of per-dispatch overhead
# that a depth-8 pipeline only partially hides (measured: MobileViT B=128
# 19.8 ms/call at reps=8 vs 15.9 at reps=32, while the device profile says
# 14.8 ms); deep pipelining measures steady-state chip throughput — the
# production metric — rather than tunnel latency.
#
# rev 4: dispersion-aware. Median + spread recorded next to the best; spread
# > 1.5 across rounds triggers up to 4 extra rounds so drift is measured,
# not guessed (VERDICT r2 weak #2).
#
# rev 5: median-of-rounds IS the headline aggregate (best kept as auxiliary)
# — drift-robust under the platform's confirmed 2-10x round spread
# (VERDICT r3 #4).
PROTOCOL = {
    "rev": 5,
    "warmup_calls": 2,
    "reps_per_round": 24,
    "rounds": 4,
    "aggregate": "median-of-rounds (best+spread recorded as auxiliary; "
                 "spread > 1.5 adds up to 4 extra rounds)",
    "drift_spread": 1.5,
    "max_extra_rounds": 4,
    "completion": "scalar jnp.sum host read (pipelined; block_until_ready "
                  "returns early on the tunneled backend)",
}


@dataclasses.dataclass
class TimingStats:
    """Per-call seconds across protocol rounds."""

    best: float
    median: float
    worst: float
    rounds_run: int

    @property
    def headline(self) -> float:
        """The protocol's headline aggregate (rev 5: median-of-rounds)."""
        return self.median

    @property
    def spread(self) -> float:
        return self.worst / self.best if self.best else float("inf")

    @property
    def stable(self) -> bool:
        return self.spread <= PROTOCOL["drift_spread"]

    def asdict(self) -> dict:
        return {
            "best_ms": round(self.best * 1e3, 3),
            "median_ms": round(self.median * 1e3, 3),
            "spread": round(self.spread, 3),
            "rounds": self.rounds_run,
        }


def run_blocking(fn: Callable, *args, **kw) -> float:
    """Run and force completion with a scalar host read."""
    out = fn(*args, **kw)
    return float(jnp.sum(out))


def timeit_stats(
    fn: Callable,
    reps: int = PROTOCOL["reps_per_round"],
    rounds: int = PROTOCOL["rounds"],
    warmup: int = PROTOCOL["warmup_calls"],
) -> TimingStats:
    """Seconds-per-call statistics under the pinned protocol (module doc)."""
    for _ in range(warmup):
        run_blocking(fn)
    times = []
    max_rounds = rounds + PROTOCOL["max_extra_rounds"]
    while len(times) < rounds or (
        len(times) < max_rounds
        and max(times) / min(times) > PROTOCOL["drift_spread"]
    ):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        float(sum(jnp.sum(o) for o in outs))
        times.append((time.perf_counter() - t0) / reps)
    return TimingStats(
        best=min(times),
        median=statistics.median(times),
        worst=max(times),
        rounds_run=len(times),
    )


def timeit_pipelined(
    fn: Callable,
    reps: int = PROTOCOL["reps_per_round"],
    rounds: int = PROTOCOL["rounds"],
    warmup: int = PROTOCOL["warmup_calls"],
) -> float:
    """Headline seconds per call (rev 5: median-of-rounds) — the scalar
    interface for callers that don't need the full :class:`TimingStats`."""
    return timeit_stats(fn, reps=reps, rounds=rounds, warmup=warmup).headline

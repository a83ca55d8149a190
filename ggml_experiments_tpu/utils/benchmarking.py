"""Canonical benchmark timing protocol — ONE definition, shared by bench.py
and tools/perf_report.py so recorded numbers are round-over-round comparable.

Why pipelined: the TPU here sits behind a tunneled PJRT backend where a
single dispatch+sync round-trip is ~40 ms and ``block_until_ready`` returns
before remote execution finishes. Throughput is therefore measured by
launching ``reps`` async calls and forcing completion once with a scalar
host read; per-call time = wall / reps. The first timed round after a
compile still runs 2-5x slow (warm-up artifact) and run-to-run variance
through the tunnel is ~±30%, so we take the best of ``rounds`` rounds.

The protocol constants live in :data:`PROTOCOL` and are emitted into
bench.py's JSON line, so every recorded BENCH_r{N} declares the method it
was measured with.
"""

from __future__ import annotations

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
PROTOCOL = {
    "rev": 3,
    "warmup_calls": 2,
    "reps_per_round": 24,
    "rounds": 4,
    "aggregate": "best-of-rounds",
    "completion": "scalar jnp.sum host read (pipelined; block_until_ready "
                  "returns early on the tunneled backend)",
}


def run_blocking(fn: Callable, *args, **kw) -> float:
    """Run and force completion with a scalar host read."""
    out = fn(*args, **kw)
    return float(jnp.sum(out))


def timeit_pipelined(
    fn: Callable,
    reps: int = PROTOCOL["reps_per_round"],
    rounds: int = PROTOCOL["rounds"],
    warmup: int = PROTOCOL["warmup_calls"],
) -> float:
    """Seconds per call under the pinned protocol (see module docstring)."""
    for _ in range(warmup):
        run_blocking(fn)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        float(sum(jnp.sum(o) for o in outs))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best

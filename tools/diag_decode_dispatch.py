"""Diagnose the scan-vs-fused decode dispatch at a given (B, T).

VERDICT r2 weak #2: BENCH_r02 measured the fused kernel at 36.3 ms/call at
B=1024/T=256 while PERF.md (same pinned protocol) recorded 15.1 ms — a 2.4x
swing that either invalidates the pinned numbers (tunnel load) or is a real
regression. This tool measures both paths **interleaved** (scan, fused, scan,
fused, ...) so a drifting backend contaminates both equally, and reports
per-round dispersion, not just the best.

Usage:  python tools/diag_decode_dispatch.py [--batch 1024] [--steps 256]
        [--rounds 6] [--reps 24]
"""
from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--sweep", action="store_true",
                    help="measure a grid of (B, T) configs instead of one")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_gru_decode
    from ggml_experiments_tpu.ops.gru import GRUCellParams
    from ggml_experiments_tpu.quant import quantize

    rng = np.random.default_rng(0)
    v, e, u = 66, 256, 1024
    weights = [
        rng.standard_normal((v, e)).astype(np.float32) * 0.1,
        rng.standard_normal((e, 3 * u)).astype(np.float32) * 0.05,
        rng.standard_normal((u, 3 * u)).astype(np.float32) * 0.05,
        rng.standard_normal((2, 3 * u)).astype(np.float32) * 0.01,
        rng.standard_normal((u, v)).astype(np.float32) * 0.05,
        rng.standard_normal((v,)).astype(np.float32) * 0.01,
    ]
    params = gru_textgen.GRUTextGenParams(
        embeddings=jnp.asarray(weights[0]),
        cell=GRUCellParams(
            kernel=quantize(weights[1], "q8_0"),
            recurrent_kernel=quantize(weights[2], "q8_0"),
            bias=jnp.asarray(weights[3]),
        ),
        dense_kernel=quantize(weights[4], "q8_0"),
        dense_bias=jnp.asarray(weights[5]),
    )

    gen = jax.jit(gru_textgen.generate,
                  static_argnames=("total_steps", "compute_dtype"))
    print("params on device", flush=True)

    def measure(B: int, T: int) -> dict:
        prompt = jnp.asarray(rng.integers(0, v, (B, 8)), jnp.int32)
        lengths = jnp.full((B,), 8, jnp.int32)
        paths = {
            "fused": lambda: fused_gru_decode(params, prompt, lengths, T),
            "scan": lambda: gen(params, prompt, lengths, total_steps=T,
                                compute_dtype=jnp.bfloat16),
        }
        for name, fn in paths.items():
            t0 = time.perf_counter()
            print(f"B={B} T={T} {name}: compiling...", flush=True)
            float(jnp.sum(fn()))
            float(jnp.sum(fn()))
            print(f"B={B} T={T} {name}: warm "
                  f"({time.perf_counter() - t0:.0f}s incl. compile)", flush=True)
        per_round: dict = {k: [] for k in paths}
        for r in range(args.rounds):
            for name, fn in paths.items():
                t0 = time.perf_counter()
                outs = [fn() for _ in range(args.reps)]
                float(sum(jnp.sum(o) for o in outs))
                dt = (time.perf_counter() - t0) / args.reps
                per_round[name].append(dt)
                print(f"B={B} T={T} round {r} {name:5s}: {dt*1e3:7.2f} ms/call "
                      f"({B*T/dt/1e6:6.2f} M tok/s)", flush=True)
        summary = {}
        for name, ts in per_round.items():
            summary[name] = {
                "best_ms": round(min(ts) * 1e3, 2),
                "median_ms": round(statistics.median(ts) * 1e3, 2),
                "worst_ms": round(max(ts) * 1e3, 2),
                "spread": round(max(ts) / min(ts), 3),
                "best_mtok_s": round(B * T / min(ts) / 1e6, 2),
                "median_mtok_s": round(B * T / statistics.median(ts) / 1e6, 2),
            }
        return summary

    configs = ([(1024, 256), (2048, 256), (2048, 512), (512, 128)]
               if args.sweep else [(args.batch, args.steps)])
    results = {}
    for B, T in configs:
        results[f"B{B}_T{T}"] = measure(B, T)
    print(json.dumps({"reps": args.reps, "rounds": args.rounds,
                      "results": results}, indent=2))


if __name__ == "__main__":
    main()

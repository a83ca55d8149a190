"""Re-measure the fused-vs-scan decode crossover ON THIS MACHINE and commit
the routing thresholds decode() uses (VERDICT r4 #3).

Why this exists: the fused decode program at B=1024/T=256 measured 19.3 ms
in rounds 2-3 and 47.7 ms in round 4 with zero kernel changes, and the
sampled serving tick drifted 72-89 -> ~160 us/step between rounds — the
platform (compiler/runtime service) shifts under identical programs. Fixed
thresholds tuned on one day can therefore mis-route on another. This tool
re-runs the interleaved scan/fused sweep under the pinned benchmark
protocol, derives the smallest (B, T) where the fused kernel's MEDIAN beats
the scan's by the safety margin, and writes thresholds + the full evidence
to the calibration file (models/gru_textgen.dispatch_calibration_path());
decode() picks it up on next import. Delete the file to return to the
measured defaults (fused iff B >= 2048 and T >= 256).

Usage: python tools/recalibrate_decode.py [--margin 1.15] [--dry-run]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the sweep grid: candidate routing boundaries, smallest first
GRID_B = (512, 1024, 2048)
GRID_T = (128, 256, 512)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--margin", type=float, default=1.15,
                    help="fused must beat scan by this median ratio to route")
    ap.add_argument("--dry-run", action="store_true",
                    help="measure + print, do not write the calibration file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/ggml_experiments_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUCellParams
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_gru_decode
    from ggml_experiments_tpu.quant import quantize
    from ggml_experiments_tpu.utils.benchmarking import PROTOCOL, timeit_stats

    rng = np.random.default_rng(0)
    v, e, u = 66, 256, 1024
    w = [rng.standard_normal(s).astype(np.float32) * 0.08
         for s in [(v, e), (e, 3 * u), (u, 3 * u), (2, 3 * u), (u, v), (v,)]]
    params = gru_textgen.GRUTextGenParams(
        embeddings=jnp.asarray(w[0]),
        cell=GRUCellParams(kernel=quantize(w[1], "q8_0"),
                           recurrent_kernel=quantize(w[2], "q8_0"),
                           bias=jnp.asarray(w[3])),
        dense_kernel=quantize(w[4], "q8_0"),
        dense_bias=jnp.asarray(w[5]),
    )
    gen = jax.jit(gru_textgen.generate,
                  static_argnames=("total_steps", "compute_dtype"))

    evidence = {}
    for b in GRID_B:
        prompt = jnp.asarray(rng.integers(0, v, (b, 8)), np.int32)
        lengths = jnp.full((b,), 8, jnp.int32)
        for t in GRID_T:
            # INTERLEAVED rounds (scan then fused per protocol run) so a
            # platform slow-phase hits both paths equally
            st_scan = timeit_stats(lambda: gen(
                params, prompt, lengths, total_steps=t,
                compute_dtype=jnp.bfloat16))
            st_fused = timeit_stats(lambda: fused_gru_decode(
                params, prompt, lengths, t, compute_dtype=jnp.bfloat16))
            ratio = st_scan.headline / st_fused.headline
            evidence[f"B{b}_T{t}"] = {
                "scan_median_ms": round(st_scan.headline * 1e3, 3),
                "fused_median_ms": round(st_fused.headline * 1e3, 3),
                "scan_spread": round(st_scan.spread, 3),
                "fused_spread": round(st_fused.spread, 3),
                "fused_speedup": round(ratio, 3),
            }
            print(f"B={b} T={t}: scan {st_scan.headline*1e3:.1f}ms "
                  f"fused {st_fused.headline*1e3:.1f}ms "
                  f"(x{ratio:.2f})", flush=True)

    # smallest boundary where fused wins by the margin AT AND ABOVE it
    def wins(b, t):
        return all(
            evidence[f"B{bb}_T{tt}"]["fused_speedup"] >= args.margin
            for bb in GRID_B if bb >= b for tt in GRID_T if tt >= t
        )

    min_b, min_t = None, None
    for b in GRID_B:
        for t in GRID_T:
            if wins(b, t):
                min_b, min_t = b, t
                break
        if min_b is not None:
            break
    if min_b is None:
        # fused never reliably wins today: route everything to the scan by
        # setting an unreachable boundary (honest fail-safe, recorded)
        min_b, min_t = 1 << 30, 1 << 30

    record = {
        "min_b": min_b, "min_t": min_t,
        "margin": args.margin,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "backend": jax.default_backend(),
        "protocol_rev": PROTOCOL["rev"],
        "evidence": evidence,
    }
    print(json.dumps({"min_b": min_b, "min_t": min_t}))
    if args.dry_run:
        print(json.dumps(record, indent=1))
    if not args.dry_run:
        from ggml_experiments_tpu.models.gru_textgen import (
            dispatch_calibration_path,
        )

        path = dispatch_calibration_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Measure WHERE serving end-to-end time goes (VERDICT r3 #5).

Round 3 reported e2e serving at ~30% of the device tick rate and attributed
the gap to tunnel readback without a measured breakdown. This tool produces
one: for each (n_slots, fetch_depth) config it runs a full submit->drain
serving session with the engine's per-phase accumulators (EngineStats
.breakdown(): refill / dispatch / readback-wait / distribute / other) and
then measures the SAME tick program device-side (pipelined, no per-tick
readback) so e2e can be reported as a fraction of the device tick rate,
with the readback link rate in bytes/s.

    python tools/serving_breakdown.py                # TPU
    python tools/serving_breakdown.py --slots 1024 --depths 8,16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REQ_TOKENS = 292   # same request shape as bench.py's serving scenario
INNER = 128        # default; --inner overrides (bigger ticks amortize the
                   # per-tick tunnel readback latency)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_params():
    import jax.numpy as jnp
    import numpy as np

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.ops.gru import GRUCellParams
    from ggml_experiments_tpu.quant import quantize

    rng = np.random.default_rng(0)
    cfg = GRUConfig()
    v, e, u = cfg.vocab_size, cfg.embed_dim, cfg.units
    w = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    return gru_textgen.GRUTextGenParams(
        embeddings=jnp.asarray(w(v, e)),
        cell=GRUCellParams(
            kernel=quantize(w(e, 3 * u), "q8_0"),
            recurrent_kernel=quantize(w(u, 3 * u), "q8_0"),
            bias=jnp.asarray(w(2, 3 * u)),
        ),
        dense_kernel=quantize(w(u, v), "q8_0"),
        dense_bias=jnp.zeros((v,), jnp.float32),
    ), cfg


def device_tick_rate(params, n_slots):
    """Tokens/s of the bare fused tick, pipelined (no per-tick readback)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.serving.engine import init_state
    from ggml_experiments_tpu.utils.benchmarking import timeit_stats

    rng = np.random.default_rng(1)
    st = init_state(params, n_slots, max_prompt=16)
    state = st.__class__(
        h=st.h,
        prev=jnp.asarray(rng.integers(0, 66, n_slots), jnp.int32),
        pos=jnp.full((n_slots,), 16, jnp.int32),
        total=jnp.full((n_slots,), 10_000_000, jnp.int32),
        plen=jnp.full((n_slots,), 8, jnp.int32),
        prompt=jnp.asarray(rng.integers(0, 66, (n_slots, 16)), jnp.int32),
        temp=st.temp,
    )

    def run():
        nonlocal state
        state, toks = fused_slot_tick(params, state, INNER,
                                      compute_dtype=jnp.bfloat16)
        return toks

    state, toks = fused_slot_tick(params, state, INNER,
                                  compute_dtype=jnp.bfloat16)
    jax.block_until_ready(toks)
    stats = timeit_stats(run, reps=16)
    return {
        "tick_ms": round(stats.headline * 1e3, 3),
        "step_us": round(stats.headline / INNER * 1e6, 2),
        "tokens_per_s": round(n_slots * INNER / stats.headline, 0),
        "spread": round(stats.spread, 3),
    }


def e2e_session(params, n_slots, fetch_depth, fetch_async=False,
                temperature=0.0):
    import jax.numpy as jnp
    import numpy as np

    from ggml_experiments_tpu.serving import DecodeEngine

    rng = np.random.default_rng(2)
    eng = DecodeEngine(params, n_slots=n_slots, max_prompt=16,
                       inner_steps=INNER, compute_dtype=jnp.bfloat16,
                       fetch_depth=fetch_depth, fetch_async=fetch_async,
                       temperature=temperature, seed=3)
    # warm: compile + cache the tick program
    for _ in range(max(64, n_slots // 8)):
        eng.submit(rng.integers(0, 66, 8).astype(np.int32), 120,
                   temperature=temperature)
    eng.run_until_idle(timeout_s=2400)
    eng.stats = eng.stats.__class__()  # fresh accumulators for the timed run
    for _ in range(n_slots * 2):
        eng.submit(rng.integers(0, 66, 8).astype(np.int32), REQ_TOKENS,
                   temperature=temperature)
    t0 = time.perf_counter()
    eng.run_until_idle(timeout_s=2400)
    wall = time.perf_counter() - t0
    out = {
        "tokens": eng.stats.tokens_generated,
        "wall_s": round(wall, 3),
        "tokens_per_s": round(eng.stats.tokens_generated / wall, 0),
        "ticks": eng.stats.device_steps,
        "fetch_depth_final": eng.fetch_depth,
        "breakdown": eng.stats.breakdown(),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", default="1024,2048")
    ap.add_argument("--depths", default="8,16")
    ap.add_argument("--inner", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="submit sampled requests (sampled fused tick path)")
    args = ap.parse_args()
    global INNER
    INNER = args.inner

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    params, cfg = make_params()
    report = {"inner_steps": INNER, "req_tokens": REQ_TOKENS,
              "temperature": args.temperature, "configs": []}
    for n_slots in [int(s) for s in args.slots.split(",")]:
        dev = device_tick_rate(params, n_slots)
        log(f"device tick B={n_slots}: {dev}")
        for depth in [int(d) for d in args.depths.split(",")]:
            for fetch_async in (False, True):
                e2e = e2e_session(params, n_slots, depth, fetch_async,
                                  temperature=args.temperature)
                frac = e2e["tokens_per_s"] / dev["tokens_per_s"]
                row = {"n_slots": n_slots, "fetch_depth": depth,
                       "fetch_async": fetch_async, "device": dev, "e2e": e2e,
                       "e2e_fraction_of_device": round(frac, 3)}
                log(f"B={n_slots} depth={depth} async={fetch_async}: "
                    f"e2e {e2e['tokens_per_s']:,.0f} tok/s = {frac:.1%} of "
                    f"device; breakdown {e2e['breakdown']}")
                report["configs"].append(row)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Measure the Q4 *capacity* claim (VERDICT r2 #6): max serving slots per qtype.

STATUS r2 argued weight compression buys HBM/VMEM *capacity* (more slots),
not speed — decode at the reference shape is compute/overhead-bound, so
halving weight bytes can't make a step faster. This tool tests the claim
instead of asserting it:

* **fused tick** (`ops/fused_gru_decode.fused_slot_tick`): the whole serving
  step runs in one Pallas kernel whose VMEM must hold the dequantized
  weights, the int8/nibble codes *input*, the per-slot state AND the per-step
  (B, 3U) f32 gate intermediates. The gate buffers scale with B and the
  codes with the qtype — so the max B is a real, qtype-dependent VMEM
  boundary. We sweep B in 128-slot steps and bisect the compile boundary,
  then measure warm throughput at each qtype's own max.
* **scan tick** (`serving/engine._slot_scan`): weights stream from HBM per
  step; no VMEM cap, so "max slots" is bounded only by HBM state and the
  probe instead records the aggregate-throughput curve at large B (the
  compute-bound regime compression cannot help).
* **weight bytes**: the undisputed capacity number — device bytes per model
  replica per qtype (how many fine-tuned variants a chip can host).

Every (qtype, B) probe runs in a SUBPROCESS (``--single``) so a VMEM-OOM
compile error cannot poison the parent's TPU client; results stream to
stderr and the final summary is one JSON line on stdout.

    python tools/capacity_probe.py                  # full sweep (TPU)
    python tools/capacity_probe.py --single fused q8_0 2048   # one worker
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INNER = 128          # engine inner_steps at the serving shape
REPS = 24


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _make_params(qtype):
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
            kernel=quantize(w(e, 3 * u), qtype),
            recurrent_kernel=quantize(w(u, 3 * u), qtype),
            bias=jnp.asarray(w(2, 3 * u)),
        ),
        dense_kernel=quantize(w(u, v), qtype),
        dense_bias=jnp.zeros((v,), jnp.float32),
    ), cfg


def _full_state(params, n_slots, vocab):
    """All slots active mid-decode: the steady-state serving load."""
    import jax.numpy as jnp
    import numpy as np

    from ggml_experiments_tpu.serving.engine import init_state

    rng = np.random.default_rng(1)
    st = init_state(params, n_slots, max_prompt=16)
    return st.__class__(
        h=st.h,
        prev=jnp.asarray(rng.integers(0, vocab, n_slots), jnp.int32),
        pos=jnp.full((n_slots,), 16, jnp.int32),
        total=jnp.full((n_slots,), 10_000_000, jnp.int32),  # never finishes mid-probe
        plen=jnp.full((n_slots,), 8, jnp.int32),
        prompt=jnp.asarray(rng.integers(0, vocab, (n_slots, 16)), jnp.int32),
        temp=st.temp,
    )


def single(kind, qtype, n_slots):
    """Worker: run one (tick kind, qtype, B) config; print one JSON line."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ggml_experiments_tpu.utils.benchmarking import timeit_stats

    params, cfg = _make_params(qtype)
    state = _full_state(params, n_slots, cfg.vocab_size)

    if kind == "fused":
        from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick

        def tick(st):
            # slot_tile=0 pins the UNTILED kernel: this probe measures the
            # raw single-block VMEM boundary (auto would tile past it)
            return fused_slot_tick(params, st, INNER, compute_dtype=jnp.bfloat16,
                                   slot_tile=0)
    elif kind == "tiled":
        from ggml_experiments_tpu.ops.fused_gru_decode import (
            TICK_SLOT_TILE, fused_slot_tick,
        )

        def tick(st):
            return fused_slot_tick(params, st, INNER, compute_dtype=jnp.bfloat16,
                                   slot_tile=TICK_SLOT_TILE)
    else:
        import functools

        from ggml_experiments_tpu.serving.engine import _slot_scan

        scan = jax.jit(
            functools.partial(_slot_scan, compute_dtype=jnp.bfloat16,
                              enable_sampling=False, top_k=None, top_p=None),
            static_argnames=("inner_steps",), donate_argnames=("state",),
        )

        def tick(st):
            st2, toks, _valid = scan(params, st, np.int32(0), INNER)
            return st2, toks

    try:
        state, toks = tick(state)   # compile + first run (state donated)
        jax.block_until_ready(toks)
    except Exception as ex:
        print(json.dumps({"ok": False, "error": f"{type(ex).__name__}: {ex}"[:400]}))
        return 0

    # steady-state timing: re-run on fresh state (donation consumed the old)
    def run():
        nonlocal state
        state, toks = tick(state)
        return toks

    st = timeit_stats(run, reps=REPS)
    step_us = st.headline / INNER * 1e6   # rev 5: median-of-rounds
    print(json.dumps({
        "ok": True, "step_us": round(step_us, 2),
        "tokens_per_s": round(n_slots * INNER / st.headline, 0),
        "best_ms": round(st.best * 1e3, 3),
        "median_ms": round(st.median * 1e3, 3), "spread": round(st.spread, 3),
    }))
    return 0


def probe(kind, qtype, n_slots, timeout=1800):
    """One (kind, qtype, B) config in a subprocess.

    timeout default is 1800 s: round 3's two ">900 s wedges" (q8_0 fused
    B=2048/B=1024) were NOT hangs — the fused tick's first remote compile at
    B=2048 takes ~25 min through the tunnel's compile hop, after which the
    persistent .jax_cache makes re-runs take seconds (measured round 4:
    same config, cold 1517 s wall, warm 17 s; 89.2 us/step either way).
    ``wall_s`` in the result records compile+measure time so compile-bound
    configs are visible in the artifact.
    """
    import time

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    r = None
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", kind, qtype,
             str(n_slots)],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        out = json.loads(r.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired:
        out = {"ok": False, "error": f"worker timeout > {timeout}s"}
    except Exception:
        stderr = r.stderr if r is not None else "worker failed to launch"
        out = {"ok": False, "error": (stderr or "no output")[-400:]}
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    log(f"  {kind} {qtype} B={n_slots}: {out}")
    return out


def weight_bytes(qtype):
    import jax

    params, _ = _make_params(qtype)
    return sum(x.nbytes for x in jax.tree.leaves(params))


PARTIAL_PATH = "/tmp/capacity_partial.json"


def _save_partial(summary):
    """Stream the summary after every probe so a killed sweep loses nothing
    (advisor r3 finding: a parent timeout used to discard the whole run)."""
    try:
        with open(PARTIAL_PATH, "w") as f:
            json.dump(summary, f)
    except OSError:
        pass


def main():
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        return single(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]))

    # the sweep parent never touches the TPU (weight-byte math runs on CPU);
    # only the --single workers claim the chip, one at a time. The axon
    # sitecustomize force-sets jax_platforms at interpreter start, so the
    # env var alone is not enough — override the config too.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    summary = {"inner_steps": INNER, "probe_timeout_s": 1800,
               "fused": {}, "scan": {}, "routing": {}, "weight_bytes": {}}

    # Every distinct B is a fresh ~15-25 min remote compile (cached across
    # runs in .jax_cache), so the walk starts at each qtype's known-good
    # point and moves in 512-slot steps, bisecting the failure boundary to
    # 128 slots (the kernel's lane-padding quantum).
    for qt, start in (("q8_0", 2048), ("q4_0", 3584)):
        results = {}
        b = start
        lo, hi_fail = None, None
        while b <= 8192:
            r = probe("fused", qt, b)
            results[b] = r
            summary["fused"][qt] = {"sweep": {str(k): v for k, v in sorted(results.items())}}
            _save_partial(summary)
            if not r["ok"]:
                hi_fail = b
                break
            lo = b
            b += 512
        if lo is None:
            # the start config itself failed: walk down to find any good B
            b = start - 512
            while b >= 512:
                r = probe("fused", qt, b)
                results[b] = r
                _save_partial(summary)
                if r["ok"]:
                    lo = b
                    break
                hi_fail = b
                b -= 512
        if hi_fail is not None and lo is not None:
            while hi_fail - lo > 128:
                mid = (lo + hi_fail) // 2 // 128 * 128
                if mid in results:
                    break
                r = probe("fused", qt, mid)
                results[mid] = r
                if r["ok"]:
                    lo = mid
                else:
                    hi_fail = mid
                summary["fused"][qt]["sweep"] = {str(k): v for k, v in sorted(results.items())}
                _save_partial(summary)
        best = max((b for b, r in results.items() if r["ok"]), default=None)
        summary["fused"][qt] = {
            "max_slots": best,
            "at_max": results.get(best),
            "first_fail": hi_fail,
            "sweep": {str(k): v for k, v in sorted(results.items())},
        }
        _save_partial(summary)

    # scan tick: no VMEM cap; record the aggregate curve in the large-B regime
    for qt in ("q8_0", "q4_0", "q5_1"):
        summary["scan"][qt] = {}
        for b in (4096, 16384):
            summary["scan"][qt][str(b)] = probe("scan", qt, b)
            _save_partial(summary)

    # engine tick routing (scan vs fused at the auto-route thresholds,
    # engine.py n_slots >= 512): medians must justify the routing table
    for b in (512, 1024, 2048):
        summary["routing"][str(b)] = {}
        for kind in ("scan", "fused"):
            summary["routing"][str(b)][kind] = probe(kind, "q8_0", b)
            _save_partial(summary)

    for qt in ("q8_0", "q5_1", "q4_0"):
        summary["weight_bytes"][qt] = weight_bytes(qt)
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    cfg = GRUConfig()
    v, e, u = cfg.vocab_size, cfg.embed_dim, cfg.units
    summary["weight_bytes"]["f32"] = 4 * (v * e + e * 3 * u + u * 3 * u + 2 * 3 * u + u * v + v)
    _save_partial(summary)

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

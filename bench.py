"""Benchmark: GRU Q8_0 batched decode throughput on TPU vs single-thread CPU baseline.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "tokens/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is measured
here: a faithful single-threaded numpy implementation of the reference's
batch-1 token-by-token decode loop (rnn_text_generation.cpp:293-313 — ggml
with n_threads=1; BLAS-backed numpy is a generous stand-in for ggml's f32
CPU path). The headline is the framework's TPU path: the same model with
Q8_0 fused dequant+matmul kernels, decode as one lax.scan, batched.

Secondary metrics (MobileViT images/s, fp32 GRU, per-config breakdown) go to
stderr so stdout stays a single JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")  # baseline is single-thread like the reference

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# CPU baseline: reference-style batch-1 greedy decode, single thread, numpy
# ---------------------------------------------------------------------------

def cpu_baseline_tokens_per_s(weights, steps=200, batch=1):
    """Reference-style greedy decode loop in numpy, single thread.

    batch=1 is the faithful reference workload (rnn_text_generation.cpp runs
    ggml with n_threads=1, batch 1); larger ``batch`` gives the matched-batch
    CPU number so the TPU speedup can also be read at equal batch size."""
    emb, kernel, rec_kernel, bias, dense_k, dense_b = weights
    u = rec_kernel.shape[0]
    h = np.zeros((batch, u), np.float32)
    tok = np.zeros(batch, np.int64)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    t0 = time.perf_counter()
    for _ in range(steps):
        x = emb[tok]
        mx = x @ kernel + bias[0]
        mh = h @ rec_kernel + bias[1]
        z = sigmoid(mx[:, :u] + mh[:, :u])
        r = sigmoid(mx[:, u:2*u] + mh[:, u:2*u])
        hh = np.tanh(mx[:, 2*u:] + r * mh[:, 2*u:])
        h = z * h + (1 - z) * hh
        logits = h @ dense_k + dense_b
        tok = np.argmax(logits, axis=1)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def _tpu_backend_reachable(timeout_s: float = 240.0) -> bool:
    """Probe the (tunneled) TPU backend in a SUBPROCESS with a timeout.

    jax.devices() blocks forever inside the axon PJRT claim loop when the
    remote terminal is wedged (e.g. a prior client killed mid-remote-compile
    — observed 2026-08-18: hours-long outage). Probing in-process would hang
    this benchmark with it, so a throwaway subprocess takes the risk and the
    parent falls back to the CPU smoke configs, keeping the one-line JSON
    contract intact."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return out.returncode == 0 and out.stdout.strip() == "tpu"
    except subprocess.TimeoutExpired:
        log(f"TPU backend probe hung >{timeout_s:.0f}s (axon claim wedged?) "
            "— falling back to CPU smoke mode")
        return False
    except Exception as ex:  # pragma: no cover
        log(f"TPU backend probe failed: {type(ex).__name__}: {ex}")
        return False


def main():
    import jax

    if not _tpu_backend_reachable():
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # persistent compile cache: the axon remote-compile hop is expensive
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.ops.gru import GRUCellParams
    from ggml_experiments_tpu.quant import quantize

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        log("WARNING: no TPU detected — running reduced CPU configs (smoke mode)")

    # full-size reference model shapes (66 vocab / 256 embed / 1024 units),
    # random weights (the checkpoint is unfetchable; shapes determine perf)
    rng = np.random.default_rng(0)
    cfg = GRUConfig()
    v, e, u = cfg.vocab_size, cfg.embed_dim, cfg.units
    weights = [
        (rng.standard_normal((v, e)) * 0.05).astype(np.float32),
        (rng.standard_normal((e, 3 * u)) * 0.05).astype(np.float32),
        (rng.standard_normal((u, 3 * u)) * 0.05).astype(np.float32),
        (rng.standard_normal((2, 3 * u)) * 0.05).astype(np.float32),
        (rng.standard_normal((u, v)) * 0.05).astype(np.float32),
        np.zeros((v,), np.float32),
    ]

    baseline = cpu_baseline_tokens_per_s(weights, steps=200)
    log(f"cpu single-thread batch-1 baseline: {baseline:,.0f} tokens/s")
    # matched-batch CPU number (VERDICT r1 weak #8): same B=2048 the TPU
    # headline (large-batch fused) uses, still single-thread numpy — the
    # honest same-workload comparison alongside the reference-faithful
    # batch-1 loop above
    matched_batch = 2048 if on_tpu else 16
    baseline_matched = cpu_baseline_tokens_per_s(weights, steps=3, batch=matched_batch)
    log(f"cpu single-thread batch-{matched_batch} baseline: "
        f"{baseline_matched:,.0f} tokens/s")

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

    from ggml_experiments_tpu.ops.fused_gru_decode import fused_gru_decode
    from ggml_experiments_tpu.utils.benchmarking import (
        PROTOCOL, timeit_pipelined, timeit_stats,
    )

    steps = 256
    gen = jax.jit(gru_textgen.generate, static_argnames=("total_steps", "compute_dtype"))

    results_stats = {}

    def bench_decode(fn, batch, name, steps_=None, stats_key=None):
        steps_ = steps if steps_ is None else steps_
        prompt = jnp.asarray(rng.integers(0, v, (batch, 8)), jnp.int32)
        lengths = jnp.full((batch,), 8, jnp.int32)
        t0 = time.perf_counter()
        st = timeit_stats(lambda: fn(prompt, lengths, batch))
        tps = batch * steps_ / st.headline   # rev 5: median-of-rounds
        log(f"TPU q8_0 {name} decode: batch={batch} steps={steps_} "
            f"median {st.headline*1e3:.1f}ms/call -> {tps:,.0f} tokens/s/chip "
            f"({st.headline/steps_*1e6:.1f}us/step; best {st.best*1e3:.1f}ms, "
            f"spread {st.spread:.2f}x/{st.rounds_run}r; "
            f"incl. compile {time.perf_counter()-t0:.0f}s)")
        if stats_key:
            results_stats[stats_key] = st.asdict()
        return tps

    results = {}
    decode_batch = 1024 if on_tpu else 16
    if not on_tpu:
        steps = 32
    # (scan at B=256 reaches ~6M tok/s / 42us/step but its program misses the
    # persistent compile cache on this backend and costs ~5 min of remote
    # compile per run — B=1024 configs below cache reliably and are faster.)
    results["scan_bf16"] = bench_decode(
        lambda p, l, b: gen(params, p, l, total_steps=steps, compute_dtype=jnp.bfloat16),
        decode_batch, "scan bf16", stats_key="scan_bf16")
    try:
        results["fused_bf16"] = bench_decode(
            lambda p, l, b: fused_gru_decode(params, p, l, steps), decode_batch,
            "fused-kernel", stats_key="fused_bf16")
    except Exception as ex:
        log(f"fused decode skipped: {type(ex).__name__}: {ex}")
    if on_tpu:
        # the large-slot serving configuration: throughput keeps rising past
        # B=1024 (the per-step fixed overheads amortize over more lanes);
        # past the offline kernel's untiled VMEM boundary (2048 at T=512 —
        # B=3584 OOMs scoped VMEM) the kernel auto-tiles the batch dim at
        # per-tile throughput. The scan row at the same shape pins
        # decode()'s dispatch choice (fused iff B>=2048 AND T>=256,
        # models/gru_textgen.decode) inside the artifact.
        try:
            results["fused_bf16_B2048_T512"] = bench_decode(
                lambda p, l, b: fused_gru_decode(params, p, l, 512), 2048,
                "fused-kernel large-batch", steps_=512,
                stats_key="fused_bf16_B2048_T512")
        except Exception as ex:
            log(f"large-batch fused decode skipped: {type(ex).__name__}: {ex}")
        # own try block: the scan row must land even if the fused kernel
        # fails to compile (it pins decode()'s dispatch thresholds)
        try:
            results["scan_bf16_B2048_T512"] = bench_decode(
                lambda p, l, b: gen(params, p, l, total_steps=512,
                                    compute_dtype=jnp.bfloat16),
                2048, "scan large-batch", steps_=512,
                stats_key="scan_bf16_B2048_T512")
        except Exception as ex:
            log(f"large-batch scan decode skipped: {type(ex).__name__}: {ex}")
        # just past the untiled VMEM boundary (2048 at T=512 — the tick's
        # 3584/3712 boundaries don't transfer to the offline kernel, whose
        # B=3584/T=512 compile OOMs scoped VMEM at 110.38M): two 2048-tiles
        try:
            results["fused_bf16_B4096_T512_tiled"] = bench_decode(
                lambda p, l, b: fused_gru_decode(params, p, l, 512), 4096,
                "fused-kernel 2-tile", steps_=512,
                stats_key="fused_bf16_B4096_T512_tiled")
        except Exception as ex:
            log(f"2-tile fused decode skipped: {type(ex).__name__}: {ex}")
        # past the untiled VMEM boundary: the batch-tiled kernel (sequential
        # grid over 2048-slot tiles, weight scratch persists across tiles) —
        # the serving tick's twin measured 24.7M tok/s at B=8192 where the
        # scan path falls to 11.2M at B=4096 (docs/capacity_sweep_r4.json)
        try:
            results["fused_bf16_B8192_T512_tiled"] = bench_decode(
                lambda p, l, b: fused_gru_decode(params, p, l, 512), 8192,
                "fused-kernel tiled", steps_=512,
                stats_key="fused_bf16_B8192_T512_tiled")
        except Exception as ex:
            log(f"tiled fused decode skipped: {type(ex).__name__}: {ex}")
        # the q4_k super-block k-quant (round 5) at the same headline shape:
        # rides the kernel's dense-plane path; measured within 2% of q8_0
        # while holding the q8-class accuracy contract at 4.63 stored bits/w
        try:
            kq = gru_textgen.GRUTextGenParams(
                embeddings=jnp.asarray(weights[0]),
                cell=GRUCellParams(
                    kernel=quantize(weights[1], "q4_k"),
                    recurrent_kernel=quantize(weights[2], "q4_k"),
                    bias=jnp.asarray(weights[3]),
                ),
                dense_kernel=quantize(weights[4], "q4_k"),
                dense_bias=jnp.asarray(weights[5]),
            )
            results["fused_bf16_B8192_T512_tiled_q4k"] = bench_decode(
                lambda p, l, b: fused_gru_decode(kq, p, l, 512), 8192,
                "fused-kernel tiled q4_k", steps_=512,
                stats_key="fused_bf16_B8192_T512_tiled_q4k")
        except Exception as ex:
            log(f"q4_k tiled decode skipped: {type(ex).__name__}: {ex}")
    # headline stays q8_0 (the metric's name); the q4_k row is informational
    q8_results = {k: v for k, v in results.items() if "_q4k" not in k}
    tokens_per_s = max(q8_results.values())
    headline_config = max(q8_results, key=q8_results.get)
    log(f"headline config: {headline_config}")

    # routing/median consistency (protocol rev 5, VERDICT r3 #4): at each
    # shape measured on both paths, the path decode() routes to must also
    # win on the MEDIAN — a routing table justified only by best-of-rounds
    # is the drift failure mode PERF.md round 3 documented.
    def _median_ms(key):
        d = results_stats.get(key)
        return d["median_ms"] if d else None

    routing_check = {}
    for shape, routed, scan_key, fused_key in (
        ("B1024_T256", "scan", "scan_bf16", "fused_bf16"),
        ("B2048_T512", "fused", "scan_bf16_B2048_T512", "fused_bf16_B2048_T512"),
    ):
        ms, mf = _median_ms(scan_key), _median_ms(fused_key)
        if ms is None or mf is None:
            continue
        ok = (ms <= mf) if routed == "scan" else (mf <= ms)
        routing_check[shape] = {
            "routed": routed, "median_consistent": ok,
            "scan_median_ms": ms, "fused_median_ms": mf,
        }
        if not ok:
            log(f"WARNING: decode() routes {routed} at {shape} but the "
                f"median favours the other path (scan {ms}ms vs fused {mf}ms)")

    # q4_0 on the persistent kernel (VERDICT r1 item 6). Same per-step loop
    # as q8_0 after the one-time in-VMEM nibble unpack, so throughput matches
    # q8_0's (~18M tok/s); the q4 win is HBM capacity (weights at half the
    # bytes -> more serving slots), not speed — decode at B=1024 reads only
    # ~4 MB of weights per 80 us scan step, nowhere near bandwidth-bound.
    try:
        params4 = gru_textgen.GRUTextGenParams(
            embeddings=params.embeddings,
            cell=GRUCellParams(
                kernel=quantize(weights[1], "q4_0"),
                recurrent_kernel=quantize(weights[2], "q4_0"),
                bias=params.cell.bias,
            ),
            dense_kernel=quantize(weights[4], "q4_0"),
            dense_bias=params.dense_bias,
        )
        bench_decode(
            lambda p, l, b: fused_gru_decode(params4, p, l, steps),
            decode_batch, "q4_0 fused-kernel")
    except Exception as ex:
        log(f"q4_0 decode skipped: {type(ex).__name__}: {ex}")

    # secondary: MobileViT q8_0 images/s (plain XLA + fused-inverted-residual)
    try:
        from ggml_experiments_tpu.models.mobilevit import (
            MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
        )
        from ggml_experiments_tpu.utils.image import synthetic_test_image

        mv_cfg = MobileViTConfig()
        named = random_named_tensors(mv_cfg)
        feat_fn = jax.jit(extract_features, static_argnames=("compute_dtype",))
        # (the fused-inverted-residual variant is measured slower in-model —
        # 4.9k vs 7.7k img/s at B=128, see docs/STATUS.md — so the product
        # path and this bench stay on the plain XLA convs)
        # transformer-path ladder: xla-attn < flash attention < whole-layer
        # fused kernel (ops/fused_transformer_layer, 1.05-1.08x over flash
        # across batches). The HEADLINE img/s rows are the fused-layer
        # config, which meets the Δtop-1 <= 0.1% accuracy contract
        # (BASELINE.md; the bf16 route agrees with f32 on the trained
        # contract task). "+f8" rows store the early conv-stage activations
        # at 1 byte (f8_e5m2, _stamp_act_storage) — faster but OPT-IN and
        # OUTSIDE the contract: measured Δtop-1 vs bf16 is ~1-2% on the
        # trained tiny model (scope 'early'; 'stem12' halves the Δ, still
        # ~10x budget — VERDICT r3 #3), so f8 rows are labeled, never the
        # headline.
        for qt, attn, batches_ in (
            (("q8_0", "fused-layer", (32, 128, 512)),
             ("q8_0", "fused-layer+f8", (128, 512)),
             ("q8_0", "fused-layer+f8/stem12", (128,)),
             ("q8_0", "flash", (128,)),
             ("q8_0", "xla-attn", (128,)), ("q4_0", "fused-layer", (128,)))
            if on_tpu else (("q8_0", "xla-attn", (2,)),)
        ):
            mv = from_named_tensors(
                named, mv_cfg, qtype=qt,
                flash_attn=(attn == "flash"),
                fused_layer=attn.startswith("fused-layer"),
                act_storage="f8_e5m2" if "+f8" in attn else None,
                act_storage_scope="stem12" if attn.endswith("/stem12") else "early",
            )
            tag = (" [opt-in, outside the Δtop-1 contract]"
                   if "+f8" in attn else " [headline: contract-compliant]"
                   if attn == "fused-layer" and qt == "q8_0" else "")
            for mb in batches_:
                images = jnp.asarray(np.stack([synthetic_test_image(256)] * mb))
                sec = timeit_pipelined(
                    lambda: feat_fn(mv, images, compute_dtype=jnp.bfloat16)
                )
                log(f"TPU {qt} MobileViT bf16 ({attn}): batch={mb} "
                    f"{sec*1e3:.1f}ms/call -> {mb/sec:,.1f} images/s/chip{tag}")
    except Exception as ex:  # secondary metric must not break the headline
        log(f"mobilevit bench skipped: {type(ex).__name__}: {ex}")

    # secondary: continuous-batching serving, end-to-end wall (submit->drain).
    # 1024-slot sync is the historical config; 8192-slot async is the
    # at-scale config (tiled fused tick): measured 13.4M tok/s = 55% of the
    # device tick rate (tools/serving_breakdown.py round 4 — bigger ticks
    # amortize the per-tick tunnel readback latency, and the async reader
    # only wins once ticks are large enough to hide its GIL share)
    try:
        if on_tpu:
            from ggml_experiments_tpu.serving import DecodeEngine

            for n_slots, fetch_async in ((1024, False), (8192, True)):
                eng = DecodeEngine(params, n_slots=n_slots, max_prompt=16,
                                   inner_steps=128, compute_dtype=jnp.bfloat16,
                                   fetch_depth=8 if n_slots <= 1024 else 16,
                                   fetch_async=fetch_async)
                # warm the tick program (compile happens on the first tick;
                # the recorded number is the warm serving throughput)
                for i in range(max(64, n_slots // 8)):
                    eng.submit(rng.integers(0, v, 8).astype(np.int32), 120)
                eng.run_until_idle(timeout_s=1200)
                eng.stats.tokens_generated = 0
                eng.stats.device_steps = 0
                for i in range(2 * n_slots):
                    eng.submit(rng.integers(0, v, 8).astype(np.int32), 292)
                t0 = time.perf_counter()
                eng.run_until_idle(timeout_s=1200)
                wall = time.perf_counter() - t0
                log(f"TPU q8_0 serving ({n_slots} slots, inner 128, "
                    f"{'fused' if eng.use_fused_tick else 'scan'} tick, "
                    f"{'async' if fetch_async else 'sync'} fetch): "
                    f"{eng.stats.tokens_generated:,} tokens end-to-end "
                    f"{wall:.2f}s -> "
                    f"{eng.stats.tokens_generated/wall:,.0f} tokens/s/chip "
                    f"(incl host queueing + token readback)")
    except Exception as ex:
        log(f"serving bench skipped: {type(ex).__name__}: {ex}")

    # secondary: mixed-precision training step (fused Pallas fwd+bwd kernels,
    # ops/fused_gru_train.py — time loop on-core, custom VJP)
    try:
        if on_tpu:
            import optax

            from ggml_experiments_tpu.training.gru_trainer import loss_fn

            fparams = gru_textgen.init_params(cfg, jax.random.PRNGKey(0))
            opt = optax.adam(1e-3)
            opt_state = opt.init(fparams)

            @jax.jit
            def train_step(p, o, i, t):
                loss, grads = jax.value_and_grad(
                    lambda p_, i_, t_: loss_fn(p_, i_, t_, compute_dtype=jnp.bfloat16)
                )(p, i, t)
                upd, o = opt.update(grads, o, p)
                return optax.apply_updates(p, upd), o, loss

            tb, tt = 1024, 100
            ti = jnp.asarray(rng.integers(0, v, (tb, tt)), jnp.int32)
            tg = jnp.asarray(rng.integers(0, v, (tb, tt)), jnp.int32)
            train_step(fparams, opt_state, ti, tg)[2].block_until_ready()
            best = timeit_pipelined(lambda: train_step(fparams, opt_state, ti, tg)[2])
            log(f"TPU bf16 mixed-precision training (fused kernels): "
                f"batch={tb} seq={tt} {best*1e3:.1f}ms/step -> "
                f"{tb*tt/best/1e6:.2f} M tokens/s/chip")
    except Exception as ex:
        log(f"training bench skipped: {type(ex).__name__}: {ex}")

    record = {
        "metric": "gru_q8_0_decode_throughput",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tokens_per_s / baseline, 2),
        "vs_baseline_matched_batch": round(tokens_per_s / baseline_matched, 2),
        "headline_config": headline_config,
        "aggregate": "median-of-rounds (protocol rev 5; configs values are "
                     "medians, best_ms in configs_dispersion)",
        "configs": {k: round(v, 1) for k, v in results.items()},
        "configs_dispersion": results_stats,
        "routing_median_check": routing_check,
        "dispatch_thresholds": "decode() routes fused iff B >= 2048 and "
                               "T >= 256 (re-derived round 3)",
        "protocol": PROTOCOL,
        "backend": "tpu" if on_tpu else "cpu-smoke",
    }
    if not on_tpu:
        # degraded run (no reachable TPU): say so, and point at the most
        # recent REAL chip measurement so the smoke number can't be read
        # as a regression
        record["degraded"] = ("TPU backend unreachable - reduced CPU smoke "
                              "configs; see last_tpu_measurement")
        import glob as _glob
        prior = sorted(_glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        if prior:
            try:
                with open(prior[-1]) as f:
                    last = json.load(f)
                if "value" not in last:  # driver wrapper: metric JSON is the
                    for line in reversed(  # last JSON line of the "tail" log
                            str(last.get("tail", "")).splitlines()):
                        if line.startswith("{"):
                            last = json.loads(line)
                            break
                if last.get("value") is not None:
                    record["last_tpu_measurement"] = {
                        "from": os.path.basename(prior[-1]),
                        "value": last.get("value"),
                        "unit": last.get("unit"),
                    }
            except Exception:
                pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()

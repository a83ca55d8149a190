"""Generate a markdown performance report with roofline accounting.

Runs the same pipelined-timing methodology as bench.py across the main
configurations and renders utils/observability's roofline numbers, so
"speed-of-light fraction" is a recorded artifact rather than a claim.

    python tools/perf_report.py [out.md]     (runs on the default device)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(out_path="PERF.md"):
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ggml_experiments_tpu.models import gru_textgen
    from ggml_experiments_tpu.models.gru_textgen import GRUConfig
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
    )
    from ggml_experiments_tpu.ops.fused_gru_decode import fused_gru_decode
    from ggml_experiments_tpu.ops.gru import GRUCellParams
    from ggml_experiments_tpu.quant import quantize
    from ggml_experiments_tpu.utils.image import synthetic_test_image
    from ggml_experiments_tpu.utils.observability import gru_decode_roofline

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    cfg = GRUConfig()
    v, e, u = cfg.vocab_size, cfg.embed_dim, cfg.units
    params = gru_textgen.GRUTextGenParams(
        embeddings=jnp.asarray((rng.standard_normal((v, e)) * 0.05).astype(np.float32)),
        cell=GRUCellParams(
            kernel=quantize((rng.standard_normal((e, 3 * u)) * 0.05).astype(np.float32), "q8_0"),
            recurrent_kernel=quantize(
                (rng.standard_normal((u, 3 * u)) * 0.05).astype(np.float32), "q8_0"
            ),
            bias=jnp.asarray((rng.standard_normal((2, 3 * u)) * 0.05).astype(np.float32)),
        ),
        dense_kernel=quantize((rng.standard_normal((u, v)) * 0.05).astype(np.float32), "q8_0"),
        dense_bias=jnp.zeros((v,)),
    )

    from ggml_experiments_tpu.utils.benchmarking import PROTOCOL, timeit_pipelined as timeit

    lines = [
        "# Performance report",
        "",
        f"Device: `{dev}` ({dev.platform}); pinned pipelined protocol rev "
        f"{PROTOCOL['rev']}: {PROTOCOL['warmup_calls']} warmup, "
        f"{PROTOCOL['reps_per_round']} reps/round, best of {PROTOCOL['rounds']} rounds "
        "(utils/benchmarking.py — shared with bench.py).",
        "",
        "| Config | time/call | throughput | per-step | bound | SoL fraction |",
        "|---|---|---|---|---|---|",
    ]
    gen = jax.jit(gru_textgen.generate, static_argnames=("total_steps", "compute_dtype"))
    for name, batch, steps, fn in [
        ("GRU q8 scan bf16", 1024, 256,
         lambda p, l, t: gen(params, p, l, total_steps=t, compute_dtype=jnp.bfloat16)),
        ("GRU q8 fused kernel", 1024, 256,
         lambda p, l, t: fused_gru_decode(params, p, l, t)),
        ("GRU q8 fused kernel", 2048, 512,
         lambda p, l, t: fused_gru_decode(params, p, l, t)),
    ]:
        prompt = jnp.asarray(rng.integers(0, v, (batch, 8)), jnp.int32)
        lengths = jnp.full((batch,), 8, jnp.int32)
        best = timeit(lambda: fn(prompt, lengths, steps))
        per_step = best / steps
        r = gru_decode_roofline(batch, e, u, v, per_step)
        d = r.as_dict()
        lines.append(
            f"| {name} (B={batch}, T={steps}) | {best*1e3:.1f} ms | "
            f"{batch*steps/best:,.0f} tok/s | {per_step*1e6:.1f} us | "
            f"{d['bound']} | {d['speed_of_light_fraction']:.2f} |"
        )

    mv_cfg = MobileViTConfig()
    named = random_named_tensors(mv_cfg)
    feat = jax.jit(extract_features, static_argnames=("compute_dtype",))
    imgs = jnp.asarray(np.stack([synthetic_test_image(256)] * 128))
    # per-op roofline at B=128, bf16 activations: 512 GFLOP (2.6 ms of pure
    # MXU time) but 10.4 ms of unavoidable HBM activation traffic — the model
    # is bandwidth-bound, so SoL is measured against the memory floor. With
    # flash attention (ops/flash_attention) the (L, L) score/prob tensors
    # never touch HBM, removing ~1.3 ms of that floor.
    # the fused whole-layer kernel (ops/fused_transformer_layer) further
    # drops the per-layer LN/projection/FFN round trips: its floor is conv
    # traffic + one activation round trip per transformer layer (~7.9 ms)
    for name, flash, fused, floor_s in (
        ("MobileViT q8 bf16 (B=128)", False, False, 0.0104),
        ("MobileViT q8 bf16 + flash attn (B=128)", True, False, 0.0091),
        ("MobileViT q8 bf16 + fused layer (B=128)", False, True, 0.0079),
    ):
        mv = from_named_tensors(named, mv_cfg, qtype="q8_0", flash_attn=flash,
                                fused_layer=fused)
        best = timeit(lambda: feat(mv, imgs, compute_dtype=jnp.bfloat16))
        lines.append(
            f"| {name} | {best*1e3:.1f} ms | {128/best:,.0f} img/s | "
            f"{best/128*1e6:.0f} us/img | HBM bandwidth | "
            f"{floor_s/best:.2f} |"
        )
    # training rows (mixed precision vs the reference-matched f32 config)
    import optax

    from ggml_experiments_tpu.training.gru_trainer import make_train_step
    from ggml_experiments_tpu.utils.observability import TPU_V5E, gru_training_roofline

    fp = gru_textgen.init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    seq = 100
    for tname, tb, cd, peak in [
        ("GRU training f32 (reference config)", 64, jnp.float32, TPU_V5E.f32_tflops),
        ("GRU training bf16 mixed precision", 64, jnp.bfloat16, None),
        ("GRU training bf16 mixed precision", 1024, jnp.bfloat16, None),
    ]:
        tparams = jax.tree_util.tree_map(lambda a: a.copy(), fp)
        opt_state = opt.init(tparams)
        step_fn = make_train_step(opt, compute_dtype=cd)
        inp = jnp.asarray(rng.integers(0, v, (tb, seq)).astype(np.int32))
        tgt = jnp.asarray(rng.integers(0, v, (tb, seq)).astype(np.int32))

        def one_step():
            nonlocal tparams, opt_state
            tparams, opt_state, loss = step_fn(tparams, opt_state, inp, tgt)
            return loss

        best = timeit(one_step)
        r = gru_training_roofline(tb, seq, e, u, v, best)
        lines.append(
            f"| {tname} (B={tb}, T={seq}) | {best*1e3:.1f} ms | "
            f"{tb*seq/best:,.0f} tok/s | — | {r.bound(peak)} | "
            f"{r.speed_of_light_fraction(peak):.2f} |"
        )

    lines.append("")
    lines.append("SoL fraction = achieved / max-achievable given arithmetic intensity "
                 "(utils/observability.py; v5e peaks 197 TF bf16, 819 GB/s HBM). "
                 "MobileViT rows are measured against their HBM-traffic floors; "
                 "device-profile breakdowns and batch-scaling comparisons live "
                 "in docs/STATUS.md (tools/trace_report.py regenerates them).")
    out = "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main(*sys.argv[1:])

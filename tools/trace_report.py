"""Per-op device-time report for the two model forwards (run on the TPU).

Answers "where does the time go" below the level bench.py/perf_report.py see:
traces ``reps`` jitted calls with jax.profiler and prints the aggregated
top-op table (XLA fusions, Mosaic custom calls, layout copies) — the
device-side ground truth behind PERF.md's whole-call numbers.

    python tools/trace_report.py --model mobilevit --batch 128
    python tools/trace_report.py --model gru --batch 1024 --steps 256
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["gru", "mobilevit"], default="mobilevit")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=256, help="decode steps (gru)")
    ap.add_argument("--qtype", default="q8_0", choices=["q8_0", "q4_0", "none"])
    ap.add_argument("--act-storage", default=None,
                    choices=["f8_e5m2", "f8_e4m3", "bfloat16"],
                    help="sub-bf16 conv activation storage (mobilevit only)")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default=None, help="keep the raw trace here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    from ggml_experiments_tpu.utils.trace_report import format_report, trace_and_report

    qtype = None if args.qtype == "none" else args.qtype
    rng = np.random.default_rng(0)
    if args.model == "mobilevit":
        from ggml_experiments_tpu.models.mobilevit import (
            MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
        )
        from ggml_experiments_tpu.utils.image import synthetic_test_image

        cfg = MobileViTConfig()
        params = from_named_tensors(random_named_tensors(cfg), cfg, qtype=qtype,
                                    act_storage=args.act_storage)
        images = jnp.asarray(np.stack([synthetic_test_image(cfg.image_size)] * args.batch))
        fn = jax.jit(extract_features, static_argnames=("compute_dtype",))
        rows = trace_and_report(
            fn, params, images, reps=args.reps, logdir=args.logdir,
            compute_dtype=jnp.bfloat16,
        )
    else:
        from ggml_experiments_tpu.models import gru_textgen
        from ggml_experiments_tpu.models.gru_textgen import GRUConfig
        from ggml_experiments_tpu.ops.gru import GRUCellParams
        from ggml_experiments_tpu.quant import quantize

        cfg = GRUConfig()
        v, e, u = cfg.vocab_size, cfg.embed_dim, cfg.units

        def mk(shape):
            return (rng.standard_normal(shape) * 0.05).astype(np.float32)

        def w(a):
            return quantize(a, qtype) if qtype else jnp.asarray(a)

        params = gru_textgen.GRUTextGenParams(
            embeddings=jnp.asarray(mk((v, e))),
            cell=GRUCellParams(kernel=w(mk((e, 3 * u))),
                               recurrent_kernel=w(mk((u, 3 * u))),
                               bias=jnp.asarray(mk((2, 3 * u)))),
            dense_kernel=w(mk((u, v))),
            dense_bias=jnp.zeros((v,), jnp.float32),
        )
        prompt = jnp.asarray(rng.integers(0, v, (args.batch, 8)), jnp.int32)
        lengths = jnp.full((args.batch,), 8, jnp.int32)

        def fn(p, pr, ln):
            return gru_textgen.decode(p, pr, ln, args.steps)

        rows = trace_and_report(jax.jit(fn), params, prompt, lengths,
                                reps=args.reps, logdir=args.logdir)

    print(format_report(rows, top=args.top))
    return 0


if __name__ == "__main__":
    sys.exit(main())

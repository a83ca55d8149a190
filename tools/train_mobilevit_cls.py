"""Train + commit the synthetic-task MobileViT classifier (reference format).

Fine-tunes the WHOLE tiny MobileViT (training/image_task.py: gradients flow
through the traceable from_named_tensors assembly) on the deterministic
grating dataset and writes ``checkpoints/mobilevit_synth.ggml`` in the
reference weight.ggml format (formats/ggml_named.py) — so the trained vision
model loads through the standard loader with any qtype. Prints a JSON
report of held-out fp32/Q8_0/Q4_0 top-1 + agreement: the vision-side
Δtop-1 contract artifact (tests/test_trained_classifier.py pins it).

    python tools/train_mobilevit_cls.py              # tiny config (~2 min on chip)
    python tools/train_mobilevit_cls.py --full       # FULL 256px architecture
                                                     # (checkpoints/mobilevit_synth_full.ggml)
    python tools/train_mobilevit_cls.py --eval-only [--full]   # re-run the report
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "checkpoints", "mobilevit_synth.ggml")
OUT_FULL = os.path.join(REPO, "checkpoints", "mobilevit_synth_full.ggml")


def main() -> int:
    eval_only = "--eval-only" in sys.argv[1:]
    full = "--full" in sys.argv[1:]
    import jax

    # persistent compile cache: the per-qtype eval ladder is a fresh XLA
    # program each (the remote-compile hop makes cold evals minutes each)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from ggml_experiments_tpu.formats.ggml_named import write_named_tensors
    from ggml_experiments_tpu.models.mobilevit import (
        load_mobilevit, random_named_tensors,
    )
    from ggml_experiments_tpu.training.image_task import (
        CLS_SEED, FULL_AMP_FACTOR, HELDOUT_SEED, NUM_CLASSES, TINY_CLS_CONFIG,
        TRAIN_SEED, make_dataset, train_model,
    )

    from ggml_experiments_tpu.models.mobilevit import MobileViTConfig

    if full:
        # the real 256px/144-192-240/2-4-3 architecture, NUM_CLASSES head; the
        # 256px images are 16x the tiny pixels, so fewer but bigger samples.
        # lr measured: 1e-3 diverges at this depth (loss pinned at ln K),
        # 3e-4 converges. Task rev 2 (non-degenerate, VERDICT r2 #4) needs
        # more steps than the saturating rev-1 gratings did.
        # 2000 steps: at 900 the rev-3 task leaves the full model undertrained
        # (66.9% held-out, loss still falling); 2000 lands it in the 85-95%
        # band the contract targets
        cfg, out, n_train, n_test, steps, batch, lr = (
            MobileViTConfig(num_labels=NUM_CLASSES), OUT_FULL, 1600, 320, 2000, 32, 3e-4,
        )
        # task rev 4: the full-size contract runs at a lower canonical
        # contrast (image_task.FULL_AMP_FACTOR) so the wider architecture
        # lands below ceiling — train, curriculum AND eval all use it
        amp_factor = FULL_AMP_FACTOR
    else:
        amp_factor = 1.0
        # n_train 6400: the rev-3 task needs the larger sample to generalize
        # (the winning sweep point — sigma 0.35 / 44 classes / 93.0% — was
        # measured at 6400; see tools/sweep_image_task.py)
        cfg, out, n_train, n_test, steps, batch, lr = (
            TINY_CLS_CONFIG, OUT, 6400, 500, 1200, 100, 1e-3,
        )
    test_x, test_y = make_dataset(n_test, seed=HELDOUT_SEED,
                                  image_size=cfg.image_size,
                                  amp_factor=amp_factor)

    loss = None
    if not eval_only:
        named = random_named_tensors(cfg, seed=CLS_SEED, classifier=True)
        train_x, train_y = make_dataset(n_train, seed=TRAIN_SEED,
                                        image_size=cfg.image_size,
                                        amp_factor=amp_factor)
        if full:
            # contrast curriculum: from-scratch SGD at 256px is stuck at
            # chance below an ABSOLUTE grating contrast of ~4x (2000 steps
            # flat at ln 44 at absolute 1x AND 2x; breaks through at 4x),
            # and a trained model adapts down a 2x contrast step. The boost
            # schedule is therefore expressed in absolute contrast and
            # divided by amp_factor — rev 4's first run kept boost=4.0
            # *relative* to the lowered canonical (absolute 2.0) and never
            # left chance (loss pinned at ln 44 through every phase).
            boosts = [b / amp_factor for b in (4.0, 2.0, 1.0)
                      if b / amp_factor > 1.0]
            nph = len(boosts) + 1
            for phase, boost in enumerate(boosts, 1):
                warm_x, warm_y = make_dataset(n_train, seed=TRAIN_SEED,
                                              image_size=cfg.image_size,
                                              amp_boost=boost,
                                              amp_factor=amp_factor)
                print(f"curriculum phase {phase}/{nph}: amp_boost={boost}",
                      file=sys.stderr, flush=True)
                named, _ = train_model(named, warm_x, warm_y, config=cfg,
                                       steps=steps // 2, batch=batch, lr=lr)
            print(f"curriculum phase {nph}/{nph}: canonical contrast",
                  file=sys.stderr, flush=True)
        trained, loss = train_model(named, train_x, train_y, config=cfg,
                                    steps=steps, batch=batch, lr=lr)
        write_named_tensors(out, sorted(trained.items()))
        print(f"wrote {out} ({os.path.getsize(out)} bytes), final loss {loss:.4f}",
              file=sys.stderr)

    import jax
    import numpy as np

    from ggml_experiments_tpu.models.mobilevit import classify

    from ggml_experiments_tpu.training.image_task import FULL_TASK_REV, TASK_REV

    report = {"final_loss": loss,
              "task_rev": FULL_TASK_REV if full else TASK_REV,
              "amp_factor": amp_factor}
    preds, logits = {}, {}
    logit_fn = jax.jit(classify, static_argnames=("compute_dtype",))

    def run(p, compute_dtype=None):
        kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
        return np.concatenate(
            [np.asarray(logit_fn(p, test_x[i:i + 100], **kw))
             for i in range(0, len(test_x), 100)]
        )

    for qt in (None, "q8_0", "q4_0", "q4_1", "q5_0", "q5_1"):
        p = load_mobilevit(out, config=cfg, qtype=qt)
        logits[qt] = run(p)
        preds[qt] = logits[qt].argmax(-1)
        report[f"top1_{qt or 'f32'}"] = float((preds[qt] == test_y).mean())
    for qt in ("q8_0", "q4_0", "q4_1", "q5_0", "q5_1"):
        report[f"agreement_{qt}"] = float((preds[qt] == preds[None]).mean())
        report[f"dtop1_{qt}"] = report["top1_f32"] - report[f"top1_{qt}"]
        report[f"rel_logit_rmse_{qt}"] = float(
            np.sqrt(np.mean((logits[qt] - logits[None]) ** 2))
            / (np.sqrt(np.mean(logits[None] ** 2)) + 1e-12)
        )
    # sub-bf16 activation storage (VERDICT r2 #3): Δtop-1 vs the bf16-compute
    # baseline it substitutes for (models/mobilevit._stamp_act_storage)
    import jax.numpy as jnp

    base = load_mobilevit(out, config=cfg)
    pb = run(base, compute_dtype=jnp.bfloat16).argmax(-1)
    report["top1_bf16"] = float((pb == test_y).mean())
    # scope ladder (VERDICT r3 #3): narrower stamping trades HBM savings for
    # accuracy; 'early'-scope keys keep their original names, narrower
    # scopes get suffixed keys
    for store, scope in (("f8_e5m2", "early"), ("f8_e5m2", "stem12"),
                         ("f8_e5m2", "stem")):
        ps = load_mobilevit(out, config=cfg, act_storage=store,
                            act_storage_scope=scope)
        pf = run(ps, compute_dtype=jnp.bfloat16).argmax(-1)
        key = store if scope == "early" else f"{store}_{scope}"
        report[f"top1_{key}"] = float((pf == test_y).mean())
        report[f"dtop1_{key}_vs_bf16"] = report["top1_bf16"] - report[f"top1_{key}"]
        report[f"agreement_{key}_vs_bf16"] = float((pf == pb).mean())
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

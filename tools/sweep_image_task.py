"""Tune the image-task noise level so full-precision top-1 lands in 85-95%.

The Δtop-1 quantization contract (VERDICT r2 #4) needs a task where the
trained full-precision model is meaningfully below 100% — rev 1 saturated,
rev 2's sigma=0.5 was unlearnable (held-out = chance). This sweep trains the
tiny config at several noise levels and reports held-out accuracy; the
winner becomes ``image_task.NOISE_SIGMA``.

    python tools/sweep_image_task.py 0.15 0.25 0.35

``--eval-full F1 F2 ...`` instead EVALUATES the committed full-size
checkpoint across canonical-contrast factors (task rev 4's
image_task.FULL_AMP_FACTOR knob, VERDICT r3 #2): a cheap eval-only probe of
where the 256px task stops saturating, to pick the retrain contrast.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_full() -> int:
    if os.environ.get("GXT_CPU"):
        # the axon sitecustomize force-selects the TPU via jax.config at
        # interpreter start; env JAX_PLATFORMS alone is overridden. This
        # knob lets the eval sweep run on CPU while the chip is busy.
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ggml_experiments_tpu.models.mobilevit import load_mobilevit
    from ggml_experiments_tpu.training.image_task import (
        HELDOUT_SEED, make_dataset, top1,
    )

    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "checkpoints", "mobilevit_synth_full.ggml")
    factors = [float(a) for a in sys.argv[2:]] or [1.0, 0.7, 0.5, 0.35]
    n = int(os.environ.get("SWEEP_EVAL_N", "160"))
    params = load_mobilevit(ckpt, flash_attn=False, fused_layer=False)
    out = {}
    for f in factors:
        x, y = make_dataset(n, seed=HELDOUT_SEED, image_size=256, amp_factor=f)
        acc = float((top1(params, x, batch=32) == y).mean())
        out[str(f)] = acc
        print(f"amp_factor {f}: top-1 {acc:.3f}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--eval-full":
        return eval_full()
    import numpy as np

    from ggml_experiments_tpu.models.mobilevit import random_named_tensors
    from ggml_experiments_tpu.training.image_task import (
        CLS_SEED, HELDOUT_SEED, TINY_CLS_CONFIG, TRAIN_SEED, make_dataset,
        top1, train_model,
    )

    import dataclasses

    # args: "SIGMA" or "SIGMA:NUM_CLASSES" — the class count sets the angular
    # spacing (pi / 2 / nc), the graceful-difficulty knob where noise is a
    # cliff (sigma 0.46 -> 99.3%, sigma 0.5 -> chance)
    specs = []
    for a in sys.argv[1:]:
        sig, _, nc = a.partition(":")
        specs.append((float(sig), int(nc) if nc else 16))
    specs = specs or [(0.15, 16), (0.25, 16), (0.35, 16)]
    steps = int(os.environ.get("SWEEP_STEPS", "700"))
    n_train = int(os.environ.get("SWEEP_TRAIN", "6400"))
    out = {}
    for sig, nc in specs:
        cfg = dataclasses.replace(TINY_CLS_CONFIG, num_labels=nc)
        train_x, train_y = make_dataset(n_train, seed=TRAIN_SEED, noise=sig,
                                        num_classes=nc)
        test_x, test_y = make_dataset(400, seed=HELDOUT_SEED, noise=sig,
                                      num_classes=nc)
        named = random_named_tensors(cfg, seed=CLS_SEED, classifier=True)
        trained, loss = train_model(named, train_x, train_y, config=cfg,
                                    steps=steps, batch=100, lr=1e-3, log_every=0)
        from ggml_experiments_tpu.models.mobilevit import from_named_tensors

        p = from_named_tensors(trained, cfg)
        acc = float((top1(p, test_x) == test_y).mean())
        out[f"{sig}:{nc}"] = {"heldout_top1": acc, "final_loss": round(loss, 4)}
        print(f"sigma={sig} classes={nc}: held-out top-1 {acc:.3f}, "
              f"loss {loss:.4f}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

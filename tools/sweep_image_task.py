"""Tune the image-task noise level so full-precision top-1 lands in 85-95%.

The Δtop-1 quantization contract (VERDICT r2 #4) needs a task where the
trained full-precision model is meaningfully below 100% — rev 1 saturated,
rev 2's sigma=0.5 was unlearnable (held-out = chance). This sweep trains the
tiny config at several noise levels and reports held-out accuracy; the
winner becomes ``image_task.NOISE_SIGMA``.

    python tools/sweep_image_task.py 0.15 0.25 0.35
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
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

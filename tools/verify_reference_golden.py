"""One-command reproduction of the reference's published golden vector.

The reference's single external correctness anchor is the feature printout in
/root/reference/mobilevit/README.md:39-45: running apple/mobilevit-small on
the deterministic synthetic image (main.cpp:681-688) yields features of shape
(8, 8, 640) whose channel values at (i0=0, i1=0) start with
``3.48242, 4.40234, ...`` and end with ``..., 2.98828, 3.67578``.

This tool stages the whole check as one run, so the day network egress
exists the anchor lands for free:

    python tools/verify_reference_golden.py                 # download + verify
    python tools/verify_reference_golden.py --model /path   # local checkpoint
    python tools/verify_reference_golden.py --keep w.ggml   # also keep the export

Pipeline: HF download (torch port) -> convert to the reference weight.ggml
format (tools/convert_hf_mobilevit) -> load with the reference's f16-conv
policy (main.cpp:887 counterpart: conv_dtype='float16') -> synthetic 256px
image -> extract_features in f32 -> compare first/last 5 channels to the
README vector.

Exit 0 = anchor reproduced; 1 = mismatch; 2 = could not fetch the model.
The end-to-end path (including the CLI surface) is exercised offline by
tests/test_reference_golden_staging.py against a mock HF checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# README.md:44 (printed by print_features_d2, main.cpp:1225-1244, at f16-conv
# load policy): first and last 5 of the 640 channels at spatial (0, 0).
GOLDEN_FIRST5 = (3.48242, 4.40234, 4.73047, 1.98438, 3.5293)
GOLDEN_LAST5 = (4.39844, 4.08203, 2.45703, 2.98828, 3.67578)
GOLDEN_SHAPE = (8, 8, 640)


def compute_features(model_path: str, *, image_size: int = 256,
                     keep: str | None = None) -> np.ndarray:
    """HF checkpoint -> weight.ggml -> f16-conv load -> synthetic features."""
    import jax
    import jax.numpy as jnp

    from ggml_experiments_tpu.formats.ggml_named import (
        read_named_tensors, write_named_tensors,
    )
    from ggml_experiments_tpu.models.mobilevit import (
        extract_features, from_named_tensors, infer_config,
    )
    from ggml_experiments_tpu.utils.image import synthetic_test_image
    from tools.convert_hf_mobilevit import convert_torch

    from transformers import MobileViTModel

    model = MobileViTModel.from_pretrained(model_path).eval()
    tensors = convert_torch(model)
    del model

    with tempfile.TemporaryDirectory() as d:
        path = keep or os.path.join(d, "weight.ggml")
        write_named_tensors(path, tensors)
        print(f"converted -> {path} ({len(tensors)} tensors, "
              f"{os.path.getsize(path):,} bytes)")
        named = read_named_tensors(path)

    config = infer_config(named, image_size=image_size)
    # f16 convs = the reference's load policy (main.cpp:887); f32 everywhere
    # else, unfused/XLA attention for exact-parity numerics.
    params = from_named_tensors(named, config, conv_dtype="float16",
                                flash_attn=False, fused_layer=False)
    img = synthetic_test_image(image_size)
    feats = jax.jit(extract_features)(params, jnp.asarray(img)[None])
    return np.asarray(feats)[0]


def verify(feats: np.ndarray, *, atol: float) -> dict:
    got_first5 = feats[0, 0, :5].astype(np.float64)
    got_last5 = feats[0, 0, -5:].astype(np.float64)
    d_first = np.abs(got_first5 - np.array(GOLDEN_FIRST5))
    d_last = np.abs(got_last5 - np.array(GOLDEN_LAST5))
    return {
        "shape": list(feats.shape),
        "shape_ok": feats.shape == GOLDEN_SHAPE,
        "got_first5": [round(float(v), 5) for v in got_first5],
        "got_last5": [round(float(v), 5) for v in got_last5],
        "want_first5": list(GOLDEN_FIRST5),
        "want_last5": list(GOLDEN_LAST5),
        "max_abs_diff": float(max(d_first.max(), d_last.max())),
        "ok": bool(feats.shape == GOLDEN_SHAPE
                   and d_first.max() <= atol and d_last.max() <= atol),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="apple/mobilevit-small",
                    help="HF model id or local checkpoint dir")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--keep", default=None,
                    help="also keep the converted weight.ggml at this path")
    ap.add_argument("--atol", type=float, default=0.05,
                    help="per-channel tolerance vs the README vector "
                         "(it is printed from an f16-conv ggml run; "
                         "~2 decimals are meaningful)")
    ap.add_argument("--golden", default=None,
                    help="JSON {'first5': [...], 'last5': [...], 'shape': "
                         "[...]} overriding the README vector (used by the "
                         "offline mock test)")
    args = ap.parse_args(argv)

    if args.golden:
        g = json.loads(args.golden)
        global GOLDEN_FIRST5, GOLDEN_LAST5, GOLDEN_SHAPE
        GOLDEN_FIRST5 = tuple(g["first5"])
        GOLDEN_LAST5 = tuple(g["last5"])
        GOLDEN_SHAPE = tuple(g["shape"])

    try:
        feats = compute_features(args.model, image_size=args.image_size,
                                 keep=args.keep)
    except (OSError, ValueError) as ex:  # hub unreachable / model dir missing
        # (huggingface_hub raises HFValidationError (a ValueError) for a
        # nonexistent local path, OSError for a network/auth failure)
        print(f"could not load {args.model!r}: {ex}", file=sys.stderr)
        print("(egress to huggingface.co is required for the download path; "
              "pass --model <local-dir> to use a pre-downloaded checkpoint)",
              file=sys.stderr)
        return 2

    report = verify(feats, atol=args.atol)
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

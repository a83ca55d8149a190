"""Convert a HuggingFace MobileViT checkpoint to the reference weight.ggml format.

A working version of the reference's converter (convert-tf-to-ggml.py — which
as committed is missing its struct/numpy imports, SURVEY.md §2.1) that also
accepts the *torch* MobileViT port: torch state_dict tensors are renamed and
re-laid-out to the TF variable paths/shapes the format (and this framework's
loader) expects:

  torch conv weight (OC, IC, KH, KW)      -> TF (KH, KW, IC, OC)
  torch depthwise  (C, 1, KH, KW)         -> TF grouped (KH, KW, 1, C)
  torch linear weight (OUT, IN)           -> TF kernel (IN, OUT)
  module dots                             -> TF name path + ":0"

Usage:
  python tools/convert_hf_mobilevit.py apple/mobilevit-small weight.ggml
  python tools/convert_hf_mobilevit.py --backend tf apple/mobilevit-small weight.ggml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ggml_experiments_tpu.formats.ggml_named import write_named_tensors

TF_ROOT = {
    "MobileViTModel": "tf_mobile_vi_t_model",
    "MobileViTForImageClassification": "tf_mobile_vi_t_for_image_classification",
}


def torch_name_to_tf(name: str, root: str):
    """torch module path -> (root, TF path base, param kind).

    Dots become '/', EXCEPT ModuleList indices which TF renders as 'layer.N'
    (e.g. torch ``encoder.layer.2.transformer.layer.0`` -> TF
    ``encoder/layer.2/transformer/layer.0``).
    """
    n = name
    if n.endswith(".weight"):
        base, leaf = n[: -len(".weight")], "weight"
    elif n.endswith(".bias"):
        base, leaf = n[: -len(".bias")], "bias"
    elif n.endswith(".running_mean"):
        base, leaf = n[: -len(".running_mean")], "moving_mean"
    elif n.endswith(".running_var"):
        base, leaf = n[: -len(".running_var")], "moving_variance"
    else:
        base, leaf = n, ""
    parts = []
    for seg in base.split("."):
        if seg.isdigit() and parts:
            parts[-1] = f"{parts[-1]}.{seg}"
        else:
            parts.append(seg)
    return root, "/".join(parts), leaf


def convert_torch(model) -> list:
    root = TF_ROOT.get(type(model).__name__, "tf_mobile_vi_t_model")
    out = []
    sd = model.state_dict()
    for name, t in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        arr = t.detach().cpu().numpy().astype(np.float32)
        r, base, leaf = torch_name_to_tf(name, root)
        # bare MobileViTModel's params aren't nested under 'mobilevit.' in
        # torch, but TF nests the backbone either way
        if not base.startswith(("mobilevit", "classifier")):
            base = "mobilevit/" + base
        is_bn = "normalization" in base.split("/")[-1] or base.endswith("normalization")
        if leaf == "weight":
            if arr.ndim == 4:
                oc, icg, kh, kw = arr.shape
                arr = arr.transpose(2, 3, 1, 0)  # -> (KH, KW, IC/groups, OC)
                tf_leaf = "kernel"
            elif arr.ndim == 2:
                arr = arr.transpose(1, 0)        # torch (out,in) -> TF (in,out)
                tf_leaf = "kernel"
            elif is_bn:
                tf_leaf = "gamma"
            else:  # layernorm weight
                tf_leaf = "gamma"
        elif leaf == "bias":
            tf_leaf = "beta" if (is_bn or "layernorm" in base) else "bias"
        else:
            tf_leaf = leaf
        tf_name = f"{root}/{base}/{tf_leaf}:0"
        out.append((tf_name, arr))
    return out


def convert_tf(model) -> list:
    return [(w.name, w.numpy().astype(np.float32)) for w in model.weights]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF model id or local path (e.g. apple/mobilevit-small)")
    ap.add_argument("output", help="output weight.ggml path")
    ap.add_argument("--backend", choices=["torch", "tf"], default="torch")
    ap.add_argument("--classifier", action="store_true",
                    help="export MobileViTForImageClassification (with head)")
    args = ap.parse_args(argv)

    if args.backend == "torch":
        from transformers import MobileViTForImageClassification, MobileViTModel

        cls = MobileViTForImageClassification if args.classifier else MobileViTModel
        model = cls.from_pretrained(args.model)
        tensors = convert_torch(model)
    else:
        from transformers import TFMobileViTForImageClassification, TFMobileViTModel

        cls = TFMobileViTForImageClassification if args.classifier else TFMobileViTModel
        model = cls.from_pretrained(args.model, from_pt=False)
        tensors = convert_tf(model)

    write_named_tensors(args.output, tensors)
    print(f"wrote {args.output}: {len(tensors)} tensors, "
          f"{os.path.getsize(args.output):,} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Ad-hoc: measure MobileViT B=128 bf16 q8_0 with flash attention enabled
per-stage vs the XLA attention path. Run on the real TPU."""

import dataclasses
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from ggml_experiments_tpu.models.mobilevit import (
    MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
)
from ggml_experiments_tpu.utils.benchmarking import timeit_pipelined
from ggml_experiments_tpu.utils.image import synthetic_test_image


def set_flash(params, stages):
    """Return params with flash= enabled on the given stage attrs."""
    for name in stages:
        blk = getattr(params, name)
        new_layers = tuple(
            dataclasses.replace(
                tl, attention=dataclasses.replace(tl.attention, flash=True)
            )
            for tl in blk.transformer
        )
        params = dataclasses.replace(
            params, **{name: dataclasses.replace(blk, transformer=new_layers)}
        )
    return params


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = MobileViTConfig()
    named = random_named_tensors(cfg)
    # fused_layer off: this tool A/Bs flash vs XLA attention specifically
    base = from_named_tensors(named, cfg, qtype="q8_0", fused_layer=False)
    images = jnp.asarray(np.stack([synthetic_test_image(256)] * B))
    feat = jax.jit(functools.partial(extract_features, compute_dtype=jnp.bfloat16))

    variants = {
        "xla": base,
        "flash3": set_flash(base, ("layer_3",)),
        "flash34": set_flash(base, ("layer_3", "layer_4")),
        "flash345": set_flash(base, ("layer_3", "layer_4", "layer_5")),
    }
    r0 = None
    for name, p in variants.items():
        try:
            out = feat(p, images)
            if r0 is None:
                r0 = out
            else:
                err = float(jnp.max(jnp.abs(out - r0)))
                print(f"{name}: max|Δ| vs xla = {err:.4f}", flush=True)
            t = timeit_pipelined(lambda p=p: feat(p, images))
            print(f"{name}: {t*1e3:.2f} ms/call -> {B/t:,.0f} img/s", flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()

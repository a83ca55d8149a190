"""Probe: do fp8/int8 *activation storage* boundaries beat bf16 on v5e convs?

VERDICT r2 #3: MobileViT is activation-bandwidth-bound; bf16 storage is a
choice, not a law. This probe measures an inverted-residual-shaped conv chain
(expand 1x1 -> depthwise 3x3 -> reduce 1x1, the layer_2 shape that dominates
conv traffic) with every materialized boundary stored as bf16 / f8_e4m3 /
f8_e5m2 / int8(+static scale), compute in bf16 either way. If XLA fuses the
converts into the conv fusions, the fp8 rows should approach 2x on the
HBM-bound fraction; if it materializes separate convert fusions, they lose.

Usage: python tools/probe_act_storage.py [--batch 128] [--blocks 4]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ggml_experiments_tpu.utils.benchmarking import timeit_stats

    rng = np.random.default_rng(0)
    B, H, W, C, E = args.batch, 64, 64, 64, 256
    x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    k_exp = jnp.asarray(rng.standard_normal((1, 1, C, E)) * 0.05, jnp.bfloat16)
    k_dw = jnp.asarray(rng.standard_normal((3, 3, 1, E)) * 0.05, jnp.bfloat16)
    k_red = jnp.asarray(rng.standard_normal((1, 1, E, C)) * 0.05, jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, groups=1):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k, (1, 1),
            [(k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2],
            dimension_numbers=dn, feature_group_count=groups,
            preferred_element_type=jnp.bfloat16,
        )

    def block(x, store):
        y = jax.nn.silu(conv(x, k_exp))
        y = store(y)
        y = jax.nn.silu(conv(y.astype(jnp.bfloat16), k_dw, groups=E))
        y = store(y)
        y = conv(y.astype(jnp.bfloat16), k_red)
        return x + y

    def chain(store_name):
        if store_name == "bf16":
            store = lambda y: y
        elif store_name in ("f8_e4m3", "f8_e5m2"):
            dt = jnp.float8_e4m3fn if store_name == "f8_e4m3" else jnp.float8_e5m2
            store = lambda y: y.astype(dt)
        elif store_name == "int8":
            # static scale: activations here are O(1); production would fold
            # the scale into the next conv's weights / BN affine
            store = lambda y: jnp.clip(
                jnp.round(y.astype(jnp.float32) * 16.0), -127, 127
            ).astype(jnp.int8).astype(jnp.float32) * (1 / 16.0)
        else:
            raise ValueError(store_name)

        @jax.jit
        def fn(x):
            for _ in range(args.blocks):
                x = block(x, store).astype(jnp.bfloat16)
            return jnp.sum(x.astype(jnp.float32))

        return fn

    results = {}
    for name in ("bf16", "f8_e4m3", "f8_e5m2", "int8"):
        try:
            fn = chain(name)
            st = timeit_stats(lambda: fn(x0))
            per_block = st.best / args.blocks
            results[name] = {**st.asdict(),
                             "ms_per_block": round(per_block * 1e3, 3)}
            print(f"{name:8s}: {per_block*1e3:6.3f} ms/block "
                  f"(best {st.best*1e3:.2f} ms, spread {st.spread:.2f})",
                  flush=True)
        except Exception as ex:
            results[name] = {"error": f"{type(ex).__name__}: {ex}"}
            print(f"{name:8s}: FAILED {type(ex).__name__}: {ex}", flush=True)

    print(json.dumps({"batch": B, "blocks": args.blocks, "results": results}))


if __name__ == "__main__":
    main()

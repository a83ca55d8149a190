"""Whole-layer fused kernel (ops/fused_transformer_layer.py) vs the unfused
module path.

Covers every (L, C) the MobileViT stages produce, float and QTensor weights,
batch-sharded execution, and the end-to-end model with ``fused_layer=True``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu.models.mobilevit import TransformerLayerParams
from ggml_experiments_tpu.ops.attention import AttentionParams
from ggml_experiments_tpu.ops.fused_transformer_layer import fused_transformer_layer
from ggml_experiments_tpu.quant import quantize


def _layer(C, H, F, rng, qtype=None):
    def w(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.2)

    def mw(*s):
        a = w(*s)
        return quantize(np.asarray(a), qtype) if qtype else a

    att = AttentionParams(
        wq=mw(C, C), bq=w(C), wk=mw(C, C), bk=w(C), wv=mw(C, C), bv=w(C),
        wo=mw(C, C), bo=w(C), num_heads=H,
    )
    return TransformerLayerParams(
        ln_before_gamma=w(C) + 1.0, ln_before_beta=w(C),
        attention=att,
        ln_after_gamma=w(C) + 1.0, ln_after_beta=w(C),
        intermediate_kernel=mw(C, F), intermediate_bias=w(F),
        output_kernel=mw(F, C), output_bias=w(C),
        eps=1e-5,
    )


@pytest.mark.parametrize(
    "B,P,L,C,H,F",
    [
        (1, 2, 256, 144, 4, 288),  # layer_3 (L=256)
        (2, 4, 64, 192, 4, 384),   # layer_4
        (2, 4, 16, 240, 4, 480),   # layer_5
        (3, 1, 8, 16, 2, 32),      # minimum sublane tile, odd bp
    ],
)
def test_matches_unfused_layer(B, P, L, C, H, F):
    rng = np.random.default_rng(hash((B, P, L, C)) % 2**32)
    layer = _layer(C, H, F, rng)
    fused = dataclasses.replace(layer, fused=True)
    x = jnp.asarray(rng.standard_normal((B, P, L, C)).astype(np.float32))

    ref32 = np.asarray(layer(x))                           # f32 oracle
    ref16 = np.asarray(
        layer(x.astype(jnp.bfloat16), compute_dtype=jnp.bfloat16), np.float32
    )
    got = np.asarray(
        fused(x.astype(jnp.bfloat16), compute_dtype=jnp.bfloat16), np.float32
    )
    scale = np.abs(ref32).max()
    # the kernel must sit inside the unfused bf16 path's own error envelope
    assert np.abs(got - ref32).max() / scale <= np.abs(ref16 - ref32).max() / scale * 2.5
    np.testing.assert_allclose(got, ref16, atol=0.08 * scale, rtol=0.08)


def test_quantized_weights_match_unfused():
    rng = np.random.default_rng(7)
    layer = _layer(48, 4, 96, rng, qtype="q8_0")
    fused = dataclasses.replace(layer, fused=True)
    x = jnp.asarray(rng.standard_normal((4, 32, 48)), jnp.bfloat16)
    ref = np.asarray(layer(x, compute_dtype=jnp.bfloat16), np.float32)
    got = np.asarray(fused(x, compute_dtype=jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, ref, atol=0.08 * np.abs(ref).max(), rtol=0.08)


def test_f32_compute_stays_unfused():
    """f32 compute is the parity oracle — the fused flag must not reroute it."""
    rng = np.random.default_rng(3)
    layer = _layer(16, 2, 32, rng)
    fused = dataclasses.replace(layer, fused=True)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(fused(x)), np.asarray(layer(x)))


def test_odd_seq_len_falls_back():
    """L not a sublane multiple takes the unfused path instead of crashing."""
    rng = np.random.default_rng(4)
    layer = _layer(16, 2, 32, rng)
    fused = dataclasses.replace(layer, fused=True)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(fused(x, compute_dtype=jnp.bfloat16)),
        np.asarray(layer(x, compute_dtype=jnp.bfloat16)),
    )


def test_rejects_bad_heads():
    rng = np.random.default_rng(5)
    layer = _layer(50, 4, 100, rng)  # 50 % 4 != 0
    with pytest.raises(ValueError):
        fused_transformer_layer(layer, jnp.zeros((2, 8, 50), jnp.bfloat16))


def test_batch_sharding_stays_local():
    """DP-sharded x runs the kernel per-shard; output keeps the batch
    sharding instead of being gathered + replicated (the
    custom_partitioning rule in ops/fused_transformer_layer)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    if devs.size < 2:
        pytest.skip("needs the simulated multi-device mesh")
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(6)
    layer = _layer(48, 4, 96, rng)
    fused = dataclasses.replace(layer, fused=True)
    x = jnp.asarray(rng.standard_normal((devs.size * 2, 32, 48)), jnp.bfloat16)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    out = jax.jit(
        lambda t: fused(t, compute_dtype=jnp.bfloat16)
    )(xs)
    assert out.sharding.spec[0] == "data"
    ref = fused(x, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-2, rtol=1e-2
    )


def test_model_fused_layer_flag():
    """from_named_tensors(fused_layer=True) matches the unfused model
    end-to-end on the reduced config."""
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
    )

    cfg = MobileViTConfig(
        image_size=64, hidden_sizes=(16, 24, 32),
        neck_hidden_sizes=(8, 16, 16, 24, 32, 40, 64),
        num_transformer_layers=(1, 1, 1),
    )
    named = random_named_tensors(cfg, seed=3)
    base = from_named_tensors(named, cfg, flash_attn=False, fused_layer=False)
    fused = from_named_tensors(named, cfg, flash_attn=False, fused_layer=True)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    )
    ref = np.asarray(
        extract_features(base, img, compute_dtype=jnp.bfloat16), np.float32
    )
    got = np.asarray(
        extract_features(fused, img, compute_dtype=jnp.bfloat16), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=0.1 * np.abs(ref).max(), rtol=0.1)

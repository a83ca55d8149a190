"""Fused attention kernel (ops/flash_attention.py) vs the XLA einsum path.

Covers every (L, C) the MobileViT stages produce plus odd leading dims,
both compute dtypes, and the end-to-end model with ``flash_attn=True``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu.ops.attention import AttentionParams, multi_head_attention
from ggml_experiments_tpu.ops.flash_attention import flash_mha


def _params(C, H, rng):
    def w(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)

    return AttentionParams(
        wq=w(C, C), bq=w(C), wk=w(C, C), bk=w(C), wv=w(C, C), bv=w(C),
        wo=w(C, C), bo=w(C), num_heads=H,
    )


@pytest.mark.parametrize(
    "B,P,L,C,H",
    [
        (2, 4, 256, 144, 4),   # layer_3 (L=256)
        (2, 4, 64, 192, 4),    # layer_4
        (2, 4, 16, 240, 4),    # layer_5
        (3, 1, 32, 64, 2),     # odd leading/bp and small C
        (1, 1, 8, 16, 4),      # minimum sublane tile
    ],
)
def test_matches_xla_attention(B, P, L, C, H):
    rng = np.random.default_rng(hash((B, P, L, C, H)) % 2**32)
    p = _params(C, H, rng)
    pf = dataclasses.replace(p, flash=True)
    x = jnp.asarray(rng.standard_normal((B, P, L, C)).astype(np.float32))

    ref = multi_head_attention(p, x)
    out = multi_head_attention(pf, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    ref16 = multi_head_attention(p, x, compute_dtype=jnp.bfloat16).astype(jnp.float32)
    out16 = multi_head_attention(pf, x, compute_dtype=jnp.bfloat16).astype(jnp.float32)
    # both paths quantize to bf16; the kernel keeps scores in f32 so small
    # per-element differences vs the bf16-score XLA path are expected
    np.testing.assert_allclose(np.asarray(out16), np.asarray(ref16), atol=0.05, rtol=0.05)


def test_flash_mha_direct_3d():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((6, 32, 48)).astype(np.float32)) for _ in range(3)
    )
    out = flash_mha(q, k, v, 4, compute_dtype=jnp.float32)
    # naive oracle
    qh = np.asarray(q).reshape(6, 32, 4, 12)
    kh = np.asarray(k).reshape(6, 32, 4, 12)
    vh = np.asarray(v).reshape(6, 32, 4, 12)
    s = np.einsum("blhd,bmhd->bhlm", qh, kh) / np.sqrt(12.0)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhlm,bmhd->blhd", p, vh).reshape(6, 32, 48)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_rejects_bad_heads():
    q = jnp.zeros((2, 8, 50))
    with pytest.raises(ValueError):
        flash_mha(q, q, q, 4)


def test_batch_sharding_stays_local():
    """DP-sharded q/k/v run the kernel per-shard: the output keeps the
    batch sharding instead of being gathered + replicated (the
    custom_partitioning rule in ops/flash_attention)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    if devs.size < 2:
        pytest.skip("needs the simulated multi-device mesh")
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2 * devs.size, 4, 64, 48)).astype(np.float32))
    qs = jax.device_put(q, NamedSharding(mesh, P("data")))
    out = flash_mha(qs, qs, qs, 4, compute_dtype=jnp.float32)
    assert out.sharding.spec[0] == "data"
    ref = flash_mha(q, q, q, 4, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_model_flash_attn_flag():
    """from_named_tensors(flash_attn=True) matches the default path end-to-end."""
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors, random_named_tensors,
    )

    cfg = MobileViTConfig(
        image_size=64, hidden_sizes=(16, 24, 32),
        neck_hidden_sizes=(8, 16, 16, 24, 32, 40, 64),
        num_transformer_layers=(1, 1, 1),
    )
    named = random_named_tensors(cfg, seed=3)
    base = from_named_tensors(named, cfg)
    flash = from_named_tensors(named, cfg, flash_attn=True)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    )
    f0 = extract_features(base, x)
    f1 = extract_features(flash, x)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=2e-4, rtol=2e-4)


def test_flash_attn_auto_default():
    """flash_attn=None resolves by backend: off on CPU, on otherwise.

    (The test session runs on CPU, so the default assembles the XLA einsum
    path; explicit booleans are always honored.)"""
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, from_named_tensors, random_named_tensors,
    )

    cfg = MobileViTConfig(
        image_size=64, hidden_sizes=(16, 24, 32),
        neck_hidden_sizes=(8, 16, 16, 24, 32, 40, 64),
        num_transformer_layers=(1, 1, 1),
    )
    named = random_named_tensors(cfg, seed=3)
    auto = from_named_tensors(named, cfg)  # flash_attn=None
    assert jax.default_backend() == "cpu"
    assert auto.layer_3.transformer[0].attention.flash is False
    forced = from_named_tensors(named, cfg, flash_attn=True)
    assert forced.layer_3.transformer[0].attention.flash is True

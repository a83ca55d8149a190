"""Sub-bf16 activation storage for the MobileViT conv stages (VERDICT r2 #3).

Speed is measured on-chip (tools/probe_act_storage.py: f8_e5m2 1.40x on the
inverted-residual chain; 1.09x in-model at B=128 — see _stamp_act_storage's
docstring). These tests pin the semantics and the accuracy envelope:
the f32 route is untouched (parity oracle), the bf16+e5m2 features stay
within a bounded distance of the bf16 baseline on the trained full-size
checkpoint, and the classifier decision agrees with the bf16 route on the
trained tiny model.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu.models.mobilevit import (
    MobileViTConfig,
    _stamp_act_storage,
    extract_features,
    from_named_tensors,
    random_named_tensors,
)

CKPT_FULL = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                         "mobilevit_synth_full.ggml")
CKPT_TINY = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                         "mobilevit_synth.ggml")

TINY = MobileViTConfig(
    image_size=64, hidden_sizes=(16, 24, 32),
    neck_hidden_sizes=(8, 16, 16, 24, 32, 40, 64),
    num_transformer_layers=(1, 1, 1),
)


@pytest.fixture(scope="module")
def tiny_named():
    return random_named_tensors(TINY, seed=3)


def test_f32_route_untouched(tiny_named):
    """Storage policies only apply to the bf16 fast path: the f32 compute
    route (the numerics/parity oracle) is bit-identical with and without."""
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    base = from_named_tensors(tiny_named, TINY, flash_attn=False, fused_layer=False)
    f8 = from_named_tensors(tiny_named, TINY, flash_attn=False, fused_layer=False,
                            act_storage="f8_e5m2")
    a = np.asarray(extract_features(base, imgs, compute_dtype=jnp.float32))
    b = np.asarray(extract_features(f8, imgs, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_stamp_scopes(tiny_named):
    base = from_named_tensors(tiny_named, TINY, flash_attn=False, fused_layer=False)
    early = _stamp_act_storage(base, "f8_e5m2")  # default scope
    assert early.conv_stem.store == "f8_e5m2"
    assert early.layer_2[0].expand_1x1.store == "f8_e5m2"
    assert early.layer_3.downsampling.conv_3x3.store == "f8_e5m2"
    # boundaries feeding the transformer kernels / f32 output stay bf16
    assert early.layer_3.conv_kxk.store == "none"
    assert early.layer_3.fusion.store == "none"
    assert early.layer_4.downsampling.expand_1x1.store == "none"
    assert early.conv_1x1_exp.store == "none"
    full = _stamp_act_storage(base, "f8_e5m2", scope="all")
    assert full.layer_4.downsampling.expand_1x1.store == "f8_e5m2"
    assert full.layer_5.fusion.store == "f8_e5m2"
    assert full.layer_5.conv_kxk.store == "none"
    assert full.conv_1x1_exp.store == "none"
    # narrower scopes (VERDICT r3 #3): stem12 spares layer_3's downsampler,
    # stem additionally spares layer_2
    stem12 = _stamp_act_storage(base, "f8_e5m2", scope="stem12")
    assert stem12.conv_stem.store == "f8_e5m2"
    assert stem12.layer_2[0].expand_1x1.store == "f8_e5m2"
    assert stem12.layer_3.downsampling.conv_3x3.store == "none"
    stem = _stamp_act_storage(base, "f8_e5m2", scope="stem")
    assert stem.conv_stem.store == "f8_e5m2"
    assert stem.layer_1[0].conv_3x3.store == "f8_e5m2"
    assert stem.layer_2[0].expand_1x1.store == "none"
    assert stem.layer_3.downsampling.conv_3x3.store == "none"
    with pytest.raises(ValueError, match="unknown act_storage"):
        _stamp_act_storage(base, "int4")
    with pytest.raises(ValueError, match="scope"):
        _stamp_act_storage(base, "f8_e5m2", scope="some")


def test_e5m2_materializes_f8_boundaries(tiny_named):
    """The storage cast actually happens on the bf16 path (not elided)."""
    f8 = from_named_tensors(tiny_named, TINY, flash_attn=False, fused_layer=False,
                            act_storage="f8_e5m2")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    y = f8.conv_stem(x.astype(jnp.bfloat16), compute_dtype=jnp.bfloat16)
    assert y.dtype == jnp.float8_e5m2
    # and the f32 call leaves it f32
    y32 = f8.conv_stem(x, compute_dtype=jnp.float32)
    assert y32.dtype == jnp.float32


@pytest.mark.skipif(not os.path.exists(CKPT_FULL),
                    reason="trained full checkpoint not present")
def test_e5m2_feature_noise_bounded_on_trained_full():
    """rel RMSE of bf16+e5m2 features vs the bf16 baseline, trained full-size
    checkpoint: recorded 0.267 ('early') / 0.309 ('all') on the task-rev-3
    checkpoint (the rev-2-trained one measured 0.113/0.167 — feature noise is
    model-dependent; the lower-contrast-trained activations quantize worse in
    e5m2 while CLASSIFIER agreement stays 100%, the number that matters —
    tools/train_mobilevit_cls.py report). Bound with margin and keep 'early'
    strictly tighter than 'all'."""
    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from ggml_experiments_tpu.models.mobilevit import infer_config

    named = read_named_tensors(CKPT_FULL)
    cfg = infer_config(named, image_size=256)
    base = from_named_tensors(named, cfg, flash_attn=False, fused_layer=False)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 256, 256, 3)).clip(-3, 3),
        jnp.float32,
    )
    feat = jax.jit(extract_features, static_argnames=("compute_dtype",))
    a = np.asarray(feat(base, imgs, compute_dtype=jnp.bfloat16))
    rels = {}
    for scope in ("early", "all"):
        f8 = _stamp_act_storage(base, "f8_e5m2", scope=scope)
        b = np.asarray(feat(f8, imgs, compute_dtype=jnp.bfloat16))
        rels[scope] = float(np.linalg.norm(a - b) / np.linalg.norm(a))
    assert rels["early"] < 0.35, rels
    assert rels["early"] < rels["all"] < 0.45, rels


@pytest.mark.skipif(not os.path.exists(CKPT_TINY),
                    reason="trained tiny checkpoint not present")
def test_e5m2_classifier_agreement_on_trained_tiny():
    from ggml_experiments_tpu.models.mobilevit import load_mobilevit
    from ggml_experiments_tpu.training.image_task import (
        HELDOUT_SEED, TINY_CLS_CONFIG, make_dataset, top1,
    )

    images, _ = make_dataset(96, seed=HELDOUT_SEED, image_size=64)
    base = load_mobilevit(CKPT_TINY, config=TINY_CLS_CONFIG,
                          flash_attn=False, fused_layer=False)
    f8 = load_mobilevit(CKPT_TINY, config=TINY_CLS_CONFIG, act_storage="f8_e5m2",
                        flash_attn=False, fused_layer=False)
    pb = top1(base, images, compute_dtype=jnp.bfloat16)
    pf = top1(f8, images, compute_dtype=jnp.bfloat16)
    assert (pb == pf).mean() >= 0.9, float((pb == pf).mean())

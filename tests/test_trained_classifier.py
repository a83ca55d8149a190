"""Quantization Δ contract on the TRAINED vision model — non-degenerate.

Round-1 measured Δtop-1 on untrained random nets; round-2's trained task
saturated at 100% top-1 for f32 AND Q4_0, so Δtop-1 = 0 was uninformative
(VERDICT r2 #4). Task rev 3 (training/image_task.py: 44 orientation classes
at 2.05-degree spacing, sigma 0.35 noise, per-sample frequency/contrast
distractors) puts the trained model deliberately below ceiling, so
quantization moves a real decision boundary.

`checkpoints/mobilevit_synth.ggml`, 500 held-out images, TPU
(tools/train_mobilevit_cls.py, recorded 2026-08-19):

| qtype | top-1 | Δtop-1 | agreement | rel logit RMSE |
|---|---|---|---|---|
| f32  | 93.0% | —      | —     | —      |
| q8_0 | 93.0% | 0.0%   | 100%  | 0.0031 |
| q5_1 | 91.6% | 1.4%   | 98.2% | 0.019  |
| q5_0 | 91.2% | 1.8%   | 97.8% | 0.024  |
| q4_1 | 91.2% | 1.8%   | 95.8% | 0.041  |
| q4_0 | 88.4% | 4.6%   | 93.0% | 0.045  |

Q8_0 meets the BASELINE.md contract (Δtop-1 <= 0.1%) with accuracy below
99%, and the sub-byte formats now degrade monotonically with bit width —
the contract is live, not saturated. The tests below assert on a 120-image
slice (CPU CI) with margins for the smaller sample + CPU/TPU numerics.
"""

import os

import jax
import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "mobilevit_synth.ggml")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="trained checkpoint not present"
)


@pytest.fixture(scope="module")
def heldout():
    from ggml_experiments_tpu.training.image_task import HELDOUT_SEED, make_dataset

    # slice of the tool's 500-image held-out set, sized for CPU CI
    return make_dataset(120, seed=HELDOUT_SEED, image_size=64)


@pytest.fixture(scope="module")
def models():
    from ggml_experiments_tpu.models.mobilevit import load_mobilevit
    from ggml_experiments_tpu.training.image_task import TINY_CLS_CONFIG

    return {
        qt: load_mobilevit(CKPT, config=TINY_CLS_CONFIG, qtype=qt,
                           flash_attn=False, fused_layer=False)
        for qt in (None, "q8_0", "q4_0")
    }


def _logits(params, images):
    from ggml_experiments_tpu.models.mobilevit import classify

    fn = jax.jit(classify)
    return np.concatenate(
        [np.asarray(fn(params, images[i:i + 60])) for i in range(0, len(images), 60)]
    )


def test_trained_top1_and_quantization_delta(heldout, models):
    images, labels = heldout
    logits = {qt: _logits(p, images) for qt, p in models.items()}
    preds = {qt: lg.argmax(-1) for qt, lg in logits.items()}

    acc = {qt: (preds[qt] == labels).mean() for qt in preds}
    # genuinely trained AND genuinely below ceiling (non-degenerate):
    # the TPU-measured 500-image number is 93.0%
    assert 0.85 <= acc[None] <= 0.985, acc

    # Δtop-1 contract (BASELINE.md: <= 0.1%): Q8_0 measured Δ = 0 /
    # agreement 100% on 500 images; allow one flip on the 120-slice
    assert (preds["q8_0"] == preds[None]).mean() >= 0.99
    assert acc[None] - acc["q8_0"] <= 0.009

    # Q4_0 degrades visibly but boundedly — the informative regime
    assert (preds["q4_0"] == preds[None]).mean() >= 0.85
    assert acc[None] - acc["q4_0"] <= 0.10

    # logit fidelity orders the bit-widths
    ref = np.sqrt(np.mean(logits[None] ** 2))
    rel8 = np.sqrt(np.mean((logits["q8_0"] - logits[None]) ** 2)) / ref
    rel4 = np.sqrt(np.mean((logits["q4_0"] - logits[None]) ** 2)) / ref
    assert rel8 < 0.02, rel8
    assert rel4 < 0.15, rel4
    assert rel8 < rel4  # more bits => closer logits


def test_subbyte_formats_order_by_bitwidth(heldout):
    """q4_0 <= q4_1 <= ~q5_x <= q8_0 on prediction agreement with f32 —
    the monotone-degradation story measured on the TPU report, asserted
    loosely (rank, not values) on the CPU slice."""
    from ggml_experiments_tpu.models.mobilevit import load_mobilevit
    from ggml_experiments_tpu.training.image_task import TINY_CLS_CONFIG

    images, _ = heldout
    preds = {}
    for qt in (None, "q8_0", "q5_1", "q4_0"):
        p = load_mobilevit(CKPT, config=TINY_CLS_CONFIG, qtype=qt,
                           flash_attn=False, fused_layer=False)
        preds[qt] = _logits(p, images).argmax(-1)
    agree = {qt: (preds[qt] == preds[None]).mean() for qt in ("q8_0", "q5_1", "q4_0")}
    assert agree["q8_0"] >= agree["q5_1"] >= agree["q4_0"], agree
    assert agree["q4_0"] >= 0.80, agree


def test_calibrated_q4_k_m_vision_contract(heldout):
    """THE vision k-quant contract (VERDICT r4 #1): calibrated GPTQ q4_k
    (quant/calibration.py, `gxt quantize --qtype q4_k_m --calibrate`) on the
    trained checkpoint reaches f32 agreement ABOVE even RTN q8_0.

    Measured full-size (320 held-out, TPU, round 5): agreement 100.000%
    (zero flips), rel logit RMSE 0.0002 vs q8_0 RTN's 0.0015, at 4.85
    stored bits/weight over the quantized tensors. Asserted here on the
    tiny checkpoint + CI slice (measured: agreement 100%, relRMSE 0.0029
    vs q8_0's 0.0031)."""
    from ggml_experiments_tpu.models.mobilevit import load_mobilevit
    from ggml_experiments_tpu.quant import calibration
    from ggml_experiments_tpu.training.image_task import (
        TINY_CLS_CONFIG, make_dataset,
    )

    images, _ = heldout
    cal_x, _ = make_dataset(48, seed=4242, image_size=64)  # non-heldout seed
    pf = load_mobilevit(CKPT, config=TINY_CLS_CONFIG, qtype=None,
                        flash_attn=False, fused_layer=False)
    grams = calibration.collect_mobilevit_grams(pf, cal_x, batch=16)
    pq = load_mobilevit(CKPT, config=TINY_CLS_CONFIG, qtype=None,
                        flash_attn=False, fused_layer=False)
    pq = calibration.gptq_mobilevit_params(pq, grams)

    la, lb = _logits(pf, images), _logits(pq, images)
    agree = (la.argmax(-1) == lb.argmax(-1)).mean()
    assert agree >= 0.99, agree
    rel = np.sqrt(np.mean((lb - la) ** 2)) / np.sqrt(np.mean(la ** 2))
    assert rel < 0.01, rel  # q8_0 RTN measures 0.0031 on this slice

    q8 = load_mobilevit(CKPT, config=TINY_CLS_CONFIG, qtype="q8_0",
                        flash_attn=False, fused_layer=False)
    l8 = _logits(q8, images)
    rel8 = np.sqrt(np.mean((l8 - la) ** 2)) / np.sqrt(np.mean(la ** 2))
    assert rel <= rel8 * 1.5, (rel, rel8)  # 4-bit GPTQ ~ 8-bit RTN class


SHIPPED_KM = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints",
    "mobilevit_synth_full_q4km.gxt")
_FULL = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                     "mobilevit_synth_full.ggml")


@pytest.mark.skipif(not (os.path.exists(SHIPPED_KM) and os.path.exists(_FULL)),
                    reason="shipped calibrated vision checkpoint not present")
def test_shipped_vision_q4_k_m_checkpoint():
    """The committed calibrated vision artifact (CLI `quantize --qtype
    q4_k_m --calibrate task:1234` on the full-size checkpoint; measured
    100% agreement / rel RMSE 0.0002 on 320 images, TPU) loads through
    load_mobilevit and matches the f32 model on a CI-sized slice."""
    import jax

    from ggml_experiments_tpu.models.mobilevit import (
        classify, infer_config, load_mobilevit,
    )
    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from ggml_experiments_tpu.training.image_task import (
        FULL_AMP_FACTOR, HELDOUT_SEED, make_dataset,
    )

    pq = load_mobilevit(SHIPPED_KM, flash_attn=False, fused_layer=False)
    assert pq.layer_3.transformer[0].attention.wq.qtype == "q4_k"
    assert pq.classifier_kernel.qtype == "q8_0"
    named = read_named_tensors(_FULL)
    pf = load_mobilevit(_FULL, config=infer_config(named), qtype=None,
                        flash_attn=False, fused_layer=False)
    x, _ = make_dataset(16, seed=HELDOUT_SEED, image_size=256,
                        amp_factor=FULL_AMP_FACTOR)
    fn = jax.jit(classify)
    la = np.asarray(fn(pf, x))
    lb = np.asarray(fn(pq, x))
    assert (la.argmax(-1) == lb.argmax(-1)).all()
    rel = np.sqrt(np.mean((lb - la) ** 2)) / np.sqrt(np.mean(la ** 2))
    assert rel < 0.005, rel


def test_dataset_is_deterministic():
    from ggml_experiments_tpu.training.image_task import make_dataset

    a_img, a_lab = make_dataset(8, seed=99)
    b_img, b_lab = make_dataset(8, seed=99)
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_lab, b_lab)
    c_img, _ = make_dataset(8, seed=100)
    assert np.abs(a_img - c_img).max() > 0.01


def test_infer_config_roundtrip():
    """infer_config recovers the architecture from weight shapes alone —
    for the default full-size config AND the reduced trained one."""
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, infer_config, random_named_tensors,
    )
    from ggml_experiments_tpu.training.image_task import TINY_CLS_CONFIG

    for cfg in (MobileViTConfig(), TINY_CLS_CONFIG):
        named = random_named_tensors(cfg, seed=0, classifier=True)
        assert infer_config(named, image_size=cfg.image_size) == cfg


def test_classify_cli_on_trained_checkpoint(capsys):
    from ggml_experiments_tpu.cli import main

    rc = main(["classify", "--weights", CKPT, "--image-size", "64",
               "--qtype", "q8_0", "--top-k", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("class ") == 3 and "logit" in out


def test_eval_cli_reports_vision_contract(capsys):
    """`gxt eval` on the trained checkpoint prints feature deltas AND the
    classification contract (agreement / dtop-1)."""
    import json

    from ggml_experiments_tpu.cli import main

    rc = main(["eval", "--weights", CKPT, "--image-size", "64",
               "--qtype", "q8_0", "--batch", "16"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    # 64-image eval slice: allow one q8 flip; accuracy below ceiling
    assert rep["top1_agreement"] >= 0.98
    assert abs(rep["dtop1"]) <= 0.02
    assert rep["rel_rmse"] < 0.02
    assert rep["top1_f32"] <= 0.99  # the task is non-degenerate


FULL_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "mobilevit_synth_full.ggml"
)


@pytest.mark.skipif(not os.path.exists(FULL_CKPT),
                    reason="full-size trained checkpoint not present")
def test_full_size_trained_contract():
    """The FULL 256px architecture trained end-to-end in-repo: held-out
    top-1 and the q8 contract hold at the real model scale (small sample —
    the 320-image report lives in the tool / checkpoints/README.md)."""
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, infer_config, load_mobilevit,
    )
    from ggml_experiments_tpu.training.image_task import (
        FULL_AMP_FACTOR, HELDOUT_SEED, make_dataset,
    )

    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors

    named = read_named_tensors(FULL_CKPT)
    cfg = infer_config(named)
    # it really is the full-size architecture
    assert cfg.hidden_sizes == MobileViTConfig.hidden_sizes
    assert cfg.neck_hidden_sizes == MobileViTConfig.neck_hidden_sizes
    assert cfg.num_transformer_layers == MobileViTConfig.num_transformer_layers

    # rev-4 canonical contrast: the contrast the checkpoint was trained and
    # reported at (full-precision top-1 96.9% — below ceiling, so the q8
    # agreement bound sits on a live decision boundary)
    images, labels = make_dataset(16, seed=HELDOUT_SEED, image_size=256,
                                  amp_factor=FULL_AMP_FACTOR)
    logits = {}
    for qt in (None, "q8_0"):
        p = load_mobilevit(FULL_CKPT, config=cfg, qtype=qt,
                           flash_attn=False, fused_layer=False)
        logits[qt] = _logits(p, images)
    preds = {qt: lg.argmax(-1) for qt, lg in logits.items()}
    assert (preds[None] == labels).mean() >= 12 / 16
    assert (preds["q8_0"] == preds[None]).mean() >= 15 / 16
    ref = np.sqrt(np.mean(logits[None] ** 2))
    rel8 = np.sqrt(np.mean((logits["q8_0"] - logits[None]) ** 2)) / ref
    assert rel8 < 0.05, rel8

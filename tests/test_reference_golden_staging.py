"""End-to-end test of tools/verify_reference_golden.py against a mock HF
checkpoint (VERDICT r2 #8: egress to huggingface.co is blocked here, so the
download->convert->f16-load->synthetic-image->compare pipeline is proven
offline; the day egress exists, the real README anchor lands for free)."""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import verify_reference_golden  # noqa: E402

TINY_KW = dict(
    image_size=64, neck_hidden_sizes=[8, 16, 24, 32, 40, 48, 96],
    hidden_sizes=[24, 32, 40], num_attention_heads=4, expand_ratio=4.0,
    mlp_ratio=2.0, patch_size=2, conv_kernel_size=3, output_stride=32,
    layer_norm_eps=1e-5, qkv_bias=True, hidden_act="silu",
)


@pytest.fixture(scope="module")
def mock_hf_dir(tmp_path_factory):
    """A local directory with the exact layout from_pretrained expects."""
    from transformers import MobileViTConfig, MobileViTModel

    torch.manual_seed(7)
    model = MobileViTModel(MobileViTConfig(**TINY_KW)).eval()
    d = tmp_path_factory.mktemp("mock_mobilevit")
    model.save_pretrained(d)
    return str(d), model


def _torch_golden(model) -> dict:
    """The mock's ground truth, computed from torch directly."""
    from ggml_experiments_tpu.utils.image import synthetic_test_image

    img = synthetic_test_image(64)
    with torch.no_grad():
        feats = model(
            pixel_values=torch.tensor(img.transpose(2, 0, 1)[None])
        ).last_hidden_state.numpy().transpose(0, 2, 3, 1)[0]
    return {
        "first5": [float(v) for v in feats[0, 0, :5]],
        "last5": [float(v) for v in feats[0, 0, -5:]],
        "shape": list(feats.shape),
    }


def test_pipeline_reproduces_mock_golden(mock_hf_dir, tmp_path, capsys):
    d, model = mock_hf_dir
    golden = _torch_golden(model)
    keep = str(tmp_path / "weight.ggml")
    rc = verify_reference_golden.main([
        "--model", d, "--image-size", "64", "--keep", keep,
        "--golden", json.dumps(golden),
        # the script loads convs at f16 (the reference policy) while the
        # torch oracle runs f32, so the tolerance covers the f16 rounding
        "--atol", "0.02",
    ])
    report = json.loads("".join(capsys.readouterr().out.splitlines(True)[1:]))
    assert rc == 0, report
    assert report["ok"] and report["shape_ok"]
    assert report["max_abs_diff"] <= 0.02
    # the converted export was kept and is a valid reference-format file
    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    named = read_named_tensors(keep)
    assert any(k.endswith("conv_stem/convolution/kernel:0") for k in named)


def test_pipeline_detects_mismatch(mock_hf_dir, capsys):
    d, model = mock_hf_dir
    golden = _torch_golden(model)
    golden["first5"][0] += 1.0  # corrupt the expected vector
    rc = verify_reference_golden.main([
        "--model", d, "--image-size", "64",
        "--golden", json.dumps(golden), "--atol", "0.02",
    ])
    assert rc == 1
    report = json.loads("".join(capsys.readouterr().out.splitlines(True)[1:]))
    assert not report["ok"] and report["max_abs_diff"] >= 0.9


def test_unfetchable_model_exits_2(tmp_path, capsys):
    rc = verify_reference_golden.main(
        ["--model", str(tmp_path / "does-not-exist")])
    assert rc == 2

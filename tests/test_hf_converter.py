"""HF torch -> reference weight.ggml converter: name/layout/numeric parity.

(The TF-oracle path is covered by the committed fixtures; this test runs the
torch port end-to-end, seeded, and demands bit-exact feature parity.)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY_KW = dict(
    image_size=64, neck_hidden_sizes=[8, 16, 24, 32, 40, 48, 96],
    hidden_sizes=[24, 32, 40], num_attention_heads=4, expand_ratio=4.0,
    mlp_ratio=2.0, patch_size=2, conv_kernel_size=3, output_stride=32,
    layer_norm_eps=1e-5, qkv_bias=True, hidden_act="silu",
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import MobileViTConfig, MobileViTModel

    torch.manual_seed(3)
    return MobileViTModel(transformers.MobileViTConfig(**TINY_KW)).eval()


def test_converted_names_match_tf_export(torch_model):
    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from tools.convert_hf_mobilevit import convert_torch

    tensors = dict(convert_torch(torch_model))
    tf_names = set(read_named_tensors(
        os.path.join(os.path.dirname(__file__), "goldens", "mobilevit_tiny.ggml")
    ))
    assert set(tensors) == tf_names


def test_converted_model_bit_exact_vs_torch(torch_model, tmp_path):
    import jax.numpy as jnp

    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors, write_named_tensors
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors,
    )
    from ggml_experiments_tpu.utils.image import synthetic_test_image
    from tools.convert_hf_mobilevit import convert_torch

    path = str(tmp_path / "weight.ggml")
    write_named_tensors(path, convert_torch(torch_model))
    params = from_named_tensors(
        read_named_tensors(path),
        MobileViTConfig(image_size=64, neck_hidden_sizes=(8, 16, 24, 32, 40, 48, 96),
                        hidden_sizes=(24, 32, 40)),
    )
    img = synthetic_test_image(64)
    with torch.no_grad():
        want = torch_model(
            pixel_values=torch.tensor(img.transpose(2, 0, 1)[None])
        ).last_hidden_state.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(extract_features(params, jnp.asarray(img)[None]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

"""MobileViT feature extraction: the reference's mobilevit ./main flow.

    python examples/extract_features.py path/to/weight.ggml [image.jpg]

Without an image, uses the reference's deterministic synthetic golden input
(main.cpp:681-688) so the printed vector is directly comparable.
"""

import sys

import jax.numpy as jnp
import numpy as np

from ggml_experiments_tpu.models.mobilevit import (
    MobileViTConfig,
    extract_features,
    load_mobilevit,
)
from ggml_experiments_tpu.utils.image import load_and_preprocess, synthetic_test_image


def main(weights: str, image: str = None):
    config = MobileViTConfig()  # input resolution; architecture is inferred
    params = load_mobilevit(weights, qtype="q8_0")
    img = load_and_preprocess(image) if image else synthetic_test_image(config.image_size)
    feats = np.asarray(
        extract_features(params, jnp.asarray(img)[None], compute_dtype=jnp.bfloat16)
    )
    print("feature shape:", feats.shape)
    vec = feats[0, 0, 0]
    print("first 5:", vec[:5], " last 5:", vec[-5:])


if __name__ == "__main__":
    main(*sys.argv[1:])

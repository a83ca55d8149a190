"""ggml_experiments_tpu — a TPU-native quantized inference/training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GGML example
repo ``datduonguva/ggml-experiments`` (reference mounted at /root/reference):

* character-level GRU text generation (train + greedy decode), reference
  ``rnn_text_gen/rnn_text_generation.{py,cpp}``
* MobileViT-small image feature extraction / classification, reference
  ``mobilevit/main.cpp`` + ``mobilevit/convert-tf-to-ggml.py``
* GGML-style block weight-only quantization (Q8_0 / Q4_0 class) executed as
  fused dequant+matmul Pallas TPU kernels, replacing ``ggml-quants.c``
* binary weight formats compatible with the reference's ``gru.bin`` and
  ``weight.ggml`` files, plus a native checkpoint container
* multi-chip execution over a named-axis ``jax.sharding.Mesh`` (DP + TP),
  continuous-batching generation serving, replacing ggml's pthread pool with
  XLA collectives over ICI/DCN.

Layering (bottom-up): ``quant`` -> ``ops`` -> ``models`` -> ``parallel`` /
``serving`` / ``training``; ``formats`` and ``utils`` are used throughout.
"""

__version__ = "0.1.0"

from ggml_experiments_tpu import ops, quant  # noqa: F401

# heavier subpackages (models, formats, parallel, serving, training,
# evaluation, utils, runtime) import on demand to keep `import
# ggml_experiments_tpu` light; they are all regular submodules.

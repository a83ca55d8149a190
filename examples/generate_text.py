"""Text generation end-to-end: the reference's rnn_text_gen flow, batched.

Equivalent of building+running /root/reference/rnn_text_gen/rnn_text_generation.cpp:
load gru.bin -> encode prompt -> 200-step greedy decode -> print text.

    python examples/generate_text.py path/to/gru.bin "ROMEO: " "JULIET: "
"""

import sys

import jax.numpy as jnp

from ggml_experiments_tpu.formats.gru_bin import load_gru_any
from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.utils.tokenizer import CharTokenizer


def main(weights: str, *prompts: str):
    prompts = list(prompts) or ["ROMEO: "]
    params = load_gru_any(weights, qtype="q8_0")   # fused dequant+matmul path
    tok = CharTokenizer()
    ids, lengths = tok.encode_batch(prompts)
    out = gru_textgen.generate(
        params, jnp.asarray(ids), jnp.asarray(lengths), 200,
        compute_dtype=jnp.bfloat16,                # serving fast path
    )
    for row in out:
        print(tok.decode(int(t) for t in row))
        print("--------")


if __name__ == "__main__":
    main(*sys.argv[1:])

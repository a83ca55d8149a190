"""Continuous-batching text-generation service.

Fixed decode-slot pool on device; requests stream in from any thread and
share the chip without restarting the batch — the serving design the
reference's one-prompt main() can't express.

    python examples/serve_continuous.py path/to/gru.bin
"""

import sys

import jax.numpy as jnp

from ggml_experiments_tpu.formats.gru_bin import load_gru_any
from ggml_experiments_tpu.serving import DecodeEngine
from ggml_experiments_tpu.utils.tokenizer import CharTokenizer


def main(weights: str):
    params = load_gru_any(weights, qtype="q8_0")
    tok = CharTokenizer()
    engine = DecodeEngine(
        params, n_slots=32, max_prompt=64, inner_steps=16,
        compute_dtype=jnp.bfloat16,
    )
    engine.start()
    try:
        prompts = ["ROMEO: ", "KING HENRY ", "First Citizen:\n", "QUEEN: "]
        requests = [engine.submit(tok.encode(p), max_new_tokens=120) for p in prompts]
        for p, req in zip(prompts, requests):
            print(tok.decode(req.result(timeout=300)))
            print("--------")
        s = engine.stats
        print(f"{s.requests_completed} requests, {s.tokens_generated} tokens, "
              f"{s.tokens_per_s:,.0f} tokens/s device throughput")
    finally:
        engine.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

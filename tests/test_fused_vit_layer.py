"""Experimental fused ViT-layer kernel vs the composable layer (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu.ops.attention import AttentionParams
from ggml_experiments_tpu.models.mobilevit import TransformerLayerParams
from ggml_experiments_tpu.ops.fused_vit_layer import fused_transformer_layer


def _layer(rng, c, heads=4, mlp=2.0):
    mk = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.2).astype(np.float32))
    f = int(c * mlp)
    return TransformerLayerParams(
        ln_before_gamma=mk(c) + 1, ln_before_beta=mk(c),
        attention=AttentionParams(
            wq=mk(c, c), bq=mk(c), wk=mk(c, c), bk=mk(c), wv=mk(c, c), bv=mk(c),
            wo=mk(c, c), bo=mk(c), num_heads=heads,
        ),
        ln_after_gamma=mk(c) + 1, ln_after_beta=mk(c),
        intermediate_kernel=mk(c, f), intermediate_bias=mk(f),
        output_kernel=mk(f, c), output_bias=mk(c),
        eps=1e-5,
    )


@pytest.mark.parametrize("l,c", [(16, 144), (64, 192), (32, 240)])
def test_fused_layer_matches_reference(rng, l, c):
    p = _layer(rng, c)
    x = jnp.asarray((rng.standard_normal((3, 2, l, c)) * 0.5).astype(np.float32))
    want = np.asarray(p(x, compute_dtype=jnp.float32))
    got = np.asarray(fused_transformer_layer(p, x, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

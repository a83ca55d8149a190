"""Elementwise activations (VPU ops, fused into surrounding matmuls by XLA).

Replaces the reference's ggml elementwise surface: ``ggml_silu``, ``ggml_tanh``
and the sigmoid work-around ``silu(x)/x`` (NaN at x==0,
/root/reference/rnn_text_gen/rnn_text_generation.cpp:51-55) — here sigmoid is
the true logistic function, matching the TF model the reference mirrors.
"""

import jax
import jax.numpy as jnp


def silu(x):
    return jax.nn.silu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


ACTIVATIONS = {
    "silu": silu,
    "sigmoid": sigmoid,
    "tanh": tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    None: lambda x: x,
    "none": lambda x: x,
    "linear": lambda x: x,
}


def get_activation(name):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}") from None

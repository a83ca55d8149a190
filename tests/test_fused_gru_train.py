"""Fused GRU training kernels (ops/fused_gru_train) — interpret-mode parity.

The kernels' semantics contract: forward states match the lax.scan path at
bf16 tolerance, and the custom-VJP gradients match the f32 scan oracle's to
bf16-compute noise (the backward kernel rematerializes gates, so there is no
stored-activation drift to hide behind).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_experiments_tpu.ops.fused_gru_train import fused_gru_scan
from ggml_experiments_tpu.ops.gru import (
    GRUCellParams,
    gru_sequence_time_major,
    input_projection,
)


@pytest.fixture
def cell():
    rng = np.random.default_rng(7)
    e, u = 8, 16
    return GRUCellParams(
        kernel=jnp.asarray(rng.standard_normal((e, 3 * u)) * 0.3, jnp.float32),
        recurrent_kernel=jnp.asarray(rng.standard_normal((u, 3 * u)) * 0.3, jnp.float32),
        bias=jnp.asarray(rng.standard_normal((2, 3 * u)) * 0.3, jnp.float32),
    )


def _inputs(cell, t=6, b=4):
    rng = np.random.default_rng(3)
    e = cell.kernel.shape[0]
    u = cell.units
    xs = jnp.asarray(rng.standard_normal((t, b, e)), jnp.float32)
    h0 = jnp.zeros((b, u), jnp.float32)
    return xs, h0


def test_forward_matches_scan(cell):
    xs, h0 = _inputs(cell)
    ys_scan, hl_scan = gru_sequence_time_major(
        cell, xs, h0, compute_dtype=jnp.bfloat16, fused=False
    )
    mxs = input_projection(cell, xs, compute_dtype=jnp.bfloat16)
    ys = fused_gru_scan(
        mxs, h0.astype(jnp.bfloat16), cell.recurrent_kernel, cell.bias[1]
    )
    np.testing.assert_allclose(
        np.asarray(ys, np.float32), np.asarray(ys_scan, np.float32), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(ys[-1], np.float32), np.asarray(hl_scan, np.float32), atol=2e-2
    )


def test_gradients_match_f32_scan_oracle(cell):
    xs, h0 = _inputs(cell)

    def loss_scan(p, xs):
        ys, _ = gru_sequence_time_major(p, xs, h0, compute_dtype=jnp.float32, fused=False)
        return jnp.sum(jnp.sin(ys))

    def loss_fused(p, xs):
        mxs = input_projection(p, xs, compute_dtype=jnp.bfloat16)
        ys = fused_gru_scan(
            mxs, h0.astype(jnp.bfloat16), p.recurrent_kernel, p.bias[1]
        )
        return jnp.sum(jnp.sin(ys.astype(jnp.float32)))

    g_ref = jax.grad(loss_scan, argnums=(0, 1))(cell, xs)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(cell, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fus)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert rel < 3e-2, rel


def test_grad_through_h0_and_long_sequence(cell):
    xs, _ = _inputs(cell, t=12, b=2)
    rng = np.random.default_rng(11)
    h0 = jnp.asarray(rng.standard_normal((2, cell.units)) * 0.2, jnp.float32)

    def loss_fused(h0):
        mxs = input_projection(cell, xs, compute_dtype=jnp.bfloat16)
        ys = fused_gru_scan(
            mxs, h0.astype(jnp.bfloat16), cell.recurrent_kernel, cell.bias[1]
        )
        return jnp.mean(ys.astype(jnp.float32) ** 2)

    def loss_scan(h0):
        ys, _ = gru_sequence_time_major(
            cell, xs, h0, compute_dtype=jnp.float32, fused=False
        )
        return jnp.mean(ys ** 2)

    a = np.asarray(jax.grad(loss_scan)(h0), np.float64)
    b = np.asarray(jax.grad(loss_fused)(h0), np.float64)
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert rel < 3e-2, rel


def test_batch_tiling_path():
    """A config whose batch doesn't fit one tile still chains dh correctly."""
    from ggml_experiments_tpu.ops import fused_gru_train as fgt

    rng = np.random.default_rng(5)
    e, u, t, b = 4, 8, 5, 6
    cell = GRUCellParams(
        kernel=jnp.asarray(rng.standard_normal((e, 3 * u)) * 0.3, jnp.float32),
        recurrent_kernel=jnp.asarray(rng.standard_normal((u, 3 * u)) * 0.3, jnp.float32),
        bias=jnp.asarray(rng.standard_normal((2, 3 * u)) * 0.3, jnp.float32),
    )
    xs = jnp.asarray(rng.standard_normal((t, b, e)), jnp.float32)
    h0 = jnp.zeros((b, u), jnp.float32)
    mxs = input_projection(cell, xs, compute_dtype=jnp.bfloat16)

    def loss(wr, budget):
        old = fgt._VMEM_BUDGET
        fgt._VMEM_BUDGET = budget
        try:
            ys = fused_gru_scan(mxs, h0.astype(jnp.bfloat16), wr, cell.bias[1])
        finally:
            fgt._VMEM_BUDGET = old
        return jnp.sum(ys.astype(jnp.float32) ** 2)

    big = jax.grad(loss)(cell.recurrent_kernel, 1 << 30)
    # budget 0 forces bt=1: six batch tiles, dh re-zeroed per tile
    small = jax.grad(loss)(cell.recurrent_kernel, 0)
    np.testing.assert_allclose(
        np.asarray(big, np.float64), np.asarray(small, np.float64), rtol=1e-4, atol=1e-5
    )

"""Multi-chip SPMD tests on the simulated 8-device CPU mesh (SURVEY.md §4 (d)).

Validates: mesh construction, DP+TP placement of float and QTensor params,
sharded == single-device numerics for forward/decode, and the sharded train
step (the dryrun_multichip path in __graft_entry__.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ggml_experiments_tpu import quant
from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.models.gru_textgen import GRUConfig
from ggml_experiments_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    gru_param_specs,
    infer_mesh_shape,
    make_mesh,
    place,
)
from ggml_experiments_tpu.training.gru_trainer import make_train_step

CFG = GRUConfig(vocab_size=66, embed_dim=32, units=64)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh((2, 4))


@pytest.fixture(scope="module")
def params():
    return gru_textgen.init_params(CFG, jax.random.PRNGKey(0))


def test_infer_mesh_shape():
    assert infer_mesh_shape(8) == (1, 8)
    assert infer_mesh_shape(16) == (2, 8)
    assert infer_mesh_shape(2) == (1, 2)
    assert infer_mesh_shape(1) == (1, 1)


def test_make_mesh_bad_shape():
    with pytest.raises(ValueError, match="mesh shape"):
        make_mesh((3, 5))


def test_placed_params_shardings(mesh, params):
    placed = place(params, gru_param_specs(params), mesh)
    k = placed.cell.kernel
    assert k.sharding.spec == P(None, MODEL_AXIS)
    # each device holds 1/4 of the gate dim
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(32, 3 * 64 // 4)}
    assert placed.embeddings.sharding.spec == P()


def test_sharded_forward_matches_single_device(mesh, params):
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 12), 0, 66)
    logits_ref, _ = gru_textgen.forward_sequence(params, ids)
    placed = place(params, gru_param_specs(params), mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P(DATA_AXIS)))
    logits_sh, _ = jax.jit(gru_textgen.forward_sequence)(placed, ids_sh)
    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_ref), rtol=1e-5, atol=1e-5)


def test_sharded_decode_matches_single_device(mesh, params):
    prompt = jnp.asarray(np.tile(np.arange(5, dtype=np.int32), (8, 1)))
    lengths = jnp.full((8,), 5, jnp.int32)
    ref = np.asarray(gru_textgen.generate(params, prompt, lengths, 30))
    placed = place(params, gru_param_specs(params), mesh)
    got = np.asarray(
        jax.jit(gru_textgen.generate, static_argnames=("total_steps",))(
            placed,
            jax.device_put(prompt, NamedSharding(mesh, P(DATA_AXIS))),
            jax.device_put(lengths, NamedSharding(mesh, P(DATA_AXIS))),
            total_steps=30,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_quantized_params_shard_and_run(mesh):
    """QTensor codes+scales shard over the model axis and still match the
    unsharded fused kernel result."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 3 * 64)).astype(np.float32) * 0.1
    qt = quant.quantize(w, "q8_0")
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    ref = np.asarray(quant.qmatmul(x, qt))

    from ggml_experiments_tpu.parallel.sharding import qtensor_sharding

    qt_sh = qtensor_sharding(mesh, qt, P(None, MODEL_AXIS))
    assert qt_sh.codes.sharding.spec == P(None, MODEL_AXIS)
    got = np.asarray(quant.qmatmul(jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), qt_sh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sharded_train_step_runs_and_matches(mesh, params):
    """One DP+TP train step: loss finite, matches the unsharded step."""
    optimizer = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, 66, (8, 16)).astype(np.int32)
    targets = rng.integers(0, 66, (8, 16)).astype(np.int32)

    # single-device baseline
    step0 = make_train_step(optimizer, mesh=None)
    p0 = jax.tree_util.tree_map(lambda a: a.copy(), params)
    _, _, loss0 = step0(p0, optimizer.init(p0), jnp.asarray(inputs), jnp.asarray(targets))

    placed = place(params, gru_param_specs(params), mesh)
    opt_state = optimizer.init(placed)
    step = make_train_step(optimizer, mesh=mesh)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    new_params, _, loss = step(
        placed, opt_state, jax.device_put(jnp.asarray(inputs), sh),
        jax.device_put(jnp.asarray(targets), sh),
    )
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(loss0), rtol=1e-5)
    # params actually updated, still sharded
    assert new_params.cell.kernel.sharding.spec == P(None, MODEL_AXIS)


def test_mobilevit_tp_sharded_forward_matches(mesh):
    """MobileViT with Megatron-paired TP shardings over the 8-device mesh
    matches single-device features (BASELINE config 5: tensor-sharded
    MobileViT)."""
    import os

    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig,
        extract_features,
        from_named_tensors,
    )
    from ggml_experiments_tpu.parallel import mobilevit_param_specs

    gold_dir = os.path.join(os.path.dirname(__file__), "goldens")
    tensors = read_named_tensors(os.path.join(gold_dir, "mobilevit_tiny.ggml"))
    cfg = MobileViTConfig(
        image_size=64, neck_hidden_sizes=(8, 16, 24, 32, 40, 48, 96),
        hidden_sizes=(24, 32, 40),
    )
    mv = from_named_tensors(tensors, cfg)
    img = jnp.asarray(np.load(os.path.join(gold_dir, "mobilevit_tiny.npz"))["image"])[None]
    ref = np.asarray(extract_features(mv, img))

    placed = place(mv, mobilevit_param_specs(mv), mesh)
    qk = placed.layer_3.transformer[0].attention.wq
    assert qk.sharding.spec == P(None, MODEL_AXIS)
    imgs = jnp.tile(img, (8, 1, 1, 1))
    imgs_sh = jax.device_put(imgs, NamedSharding(mesh, P(DATA_AXIS)))
    got = np.asarray(jax.jit(extract_features)(placed, imgs_sh))
    for i in range(8):
        np.testing.assert_allclose(got[i], ref[0], rtol=2e-4, atol=2e-4)


def test_mobilevit_tp_quantized_sharded(mesh):
    """Quantized (QTensor) transformer kernels shard over the model axis and
    still run (fused kernel under SPMD, interpret mode on CPU)."""
    import os

    from ggml_experiments_tpu.formats.ggml_named import read_named_tensors
    from ggml_experiments_tpu.models.mobilevit import (
        MobileViTConfig, extract_features, from_named_tensors,
    )
    from ggml_experiments_tpu.parallel import mobilevit_param_specs

    gold_dir = os.path.join(os.path.dirname(__file__), "goldens")
    tensors = read_named_tensors(os.path.join(gold_dir, "mobilevit_tiny.ggml"))
    cfg = MobileViTConfig(
        image_size=64, neck_hidden_sizes=(8, 16, 24, 32, 40, 48, 96),
        hidden_sizes=(24, 32, 40),
    )
    mv = from_named_tensors(tensors, cfg, qtype="q8_0")
    ref = np.asarray(
        extract_features(
            mv, jnp.asarray(np.load(os.path.join(gold_dir, "mobilevit_tiny.npz"))["image"])[None]
        )
    )
    placed = place(mv, mobilevit_param_specs(mv), mesh)
    img = jnp.asarray(np.load(os.path.join(gold_dir, "mobilevit_tiny.npz"))["image"])[None]
    got = np.asarray(jax.jit(extract_features)(placed, img))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_qtensor_row_parallel_honored(mesh):
    """A legal row-parallel request (Kp divisible by 32*n_shards) shards the
    K dim for real — the Megatron pairing for the vocab head — and still
    computes the right numbers. An indivisible K falls back to column."""
    from ggml_experiments_tpu.parallel.sharding import qtensor_sharding

    rng = np.random.default_rng(1)
    w = rng.standard_normal((1024, 66)).astype(np.float32) * 0.1
    qt = quant.quantize(w, "q8_0")
    qt_sh = qtensor_sharding(mesh, qt, P(MODEL_AXIS, None))
    assert qt_sh.codes.sharding.spec == P(MODEL_AXIS, None)
    assert qt_sh.scales.sharding.spec == P(MODEL_AXIS, None)
    x = jnp.asarray(rng.standard_normal((8, 1024)).astype(np.float32))
    ref = np.asarray(quant.qmatmul(x, qt))
    got = np.asarray(quant.qmatmul(jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), qt_sh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # K=32 over a 4-way model axis -> 8 rows/shard, partial blocks: sanitize
    qt_small = quant.quantize(rng.standard_normal((32, 66)).astype(np.float32), "q8_0")
    qt_small_sh = qtensor_sharding(mesh, qt_small, P(MODEL_AXIS, None))
    assert qt_small_sh.codes.sharding.spec == P(None, MODEL_AXIS)


def test_qtensor_row_parallel_q4(mesh):
    """Q4_0 nibble-packed codes (Kp/2 rows) shard consistently with scales."""
    from ggml_experiments_tpu.parallel.sharding import qtensor_sharding

    rng = np.random.default_rng(2)
    w = rng.standard_normal((512, 128)).astype(np.float32) * 0.1
    qt = quant.quantize(w, "q4_0")
    qt_sh = qtensor_sharding(mesh, qt, P(MODEL_AXIS, None))
    assert qt_sh.codes.sharding.spec == P(MODEL_AXIS, None)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(quant.qmatmul(x, qt_sh)), np.asarray(quant.qmatmul(x, qt)),
        rtol=1e-5, atol=1e-5,
    )


def test_qmatmul_column_parallel_stays_local(mesh):
    """The Pallas qmatmul partitioning rule: under jit, a column-parallel
    QTensor runs the kernel on each device's local N slice (output sharded
    on the model axis) instead of XLA all-gathering the codes and running
    the kernel replicated."""
    import dataclasses

    rng = np.random.default_rng(3)
    w = (rng.standard_normal((512, 4096)) * 0.1).astype(np.float32)
    qt = quant.quantize(w, "q8_0")
    assert qt.shape[0] * qt.shape[1] > 1 << 20, "must take the Pallas path"
    qt_sh = dataclasses.replace(
        qt,
        codes=jax.device_put(qt.codes, NamedSharding(mesh, P(None, MODEL_AXIS))),
        scales=jax.device_put(qt.scales, NamedSharding(mesh, P(None, MODEL_AXIS))),
    )
    x = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))

    fn = jax.jit(lambda a, q: quant.qmatmul(a, q))
    out = fn(x, qt_sh)
    assert out.sharding.spec[-1] == MODEL_AXIS, out.sharding
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(quant.qmatmul(x, qt)), rtol=1e-4, atol=1e-4
    )


def test_fused_gru_train_batch_sharded(mesh):
    """The fused training kernels' DP rule: batch-sharded mxs/h0 run the
    kernels per shard (states come back batch-sharded) and the custom-VJP
    weight grads psum over the data axis — numerics match the unsharded
    call, and the forward output must actually BE sharded (no silent
    all-gather + replicated kernel)."""
    from ggml_experiments_tpu.ops.fused_gru_train import fused_gru_scan
    from ggml_experiments_tpu.ops.gru import input_projection

    rng = np.random.default_rng(9)
    t, b, e, u = 5, 16, 8, 16
    cell = gru_textgen.init_params(
        GRUConfig(vocab_size=66, embed_dim=e, units=u), jax.random.PRNGKey(1)
    ).cell
    xs = jnp.asarray(rng.standard_normal((t, b, e)), jnp.float32)
    h0 = jnp.zeros((b, u), jnp.bfloat16)
    mxs = input_projection(cell, xs, compute_dtype=jnp.bfloat16)

    def loss(mxs, h0, wr, brec):
        ys = fused_gru_scan(mxs, h0, wr, brec)
        return jnp.sum(ys.astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 2, 3)))
    ref_loss, ref_grads = grad_fn(mxs, h0, cell.recurrent_kernel, cell.bias[1])

    bsh = NamedSharding(mesh, P(None, DATA_AXIS, None))
    fwd = jax.jit(lambda m, h, w, br: fused_gru_scan(m, h, w, br))
    ys_sh = fwd(
        jax.device_put(mxs, bsh),
        jax.device_put(h0, NamedSharding(mesh, P(DATA_AXIS, None))),
        cell.recurrent_kernel,
        cell.bias[1],
    )
    assert ys_sh.sharding.spec[1] == DATA_AXIS, ys_sh.sharding
    sh_loss, sh_grads = grad_fn(
        jax.device_put(mxs, bsh),
        jax.device_put(h0, NamedSharding(mesh, P(DATA_AXIS, None))),
        cell.recurrent_kernel,
        cell.bias[1],
    )
    np.testing.assert_allclose(float(ref_loss), float(sh_loss), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(ref_grads),
                    jax.tree_util.tree_leaves(sh_grads)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(c, np.float32),
            rtol=1e-4, atol=1e-4,
        )


def test_fused_slot_tick_sharded_and_tiled(mesh):
    """The two tick grid features compose: slot-sharding over a mesh axis
    AND slot-tiling within each shard (the auto policy tiles from the LOCAL
    slot width, so a per-shard tile must reproduce the unsharded untiled
    tick token-for-token)."""
    import dataclasses

    from ggml_experiments_tpu.ops.fused_gru_decode import fused_slot_tick
    from ggml_experiments_tpu.serving.engine import init_state

    rng = np.random.default_rng(11)
    qp = gru_textgen.GRUTextGenParams(
        embeddings=jnp.asarray(rng.standard_normal((66, 32)) * 0.05, jnp.float32),
        cell=dataclasses.replace(
            gru_textgen.init_params(CFG, jax.random.PRNGKey(2)).cell,
            kernel=quant.quantize(rng.standard_normal((32, 192)).astype(np.float32), "q8_0"),
            recurrent_kernel=quant.quantize(
                rng.standard_normal((64, 192)).astype(np.float32), "q8_0"),
        ),
        dense_kernel=quant.quantize(
            rng.standard_normal((64, 66)).astype(np.float32), "q8_0"),
        dense_bias=jnp.zeros((66,), jnp.float32),
    )
    n_slots, max_prompt, inner = 512, 8, 16
    prompt = np.zeros((n_slots, max_prompt), np.int32)
    plen = np.zeros((n_slots,), np.int32)
    for i in range(n_slots):
        n = int(rng.integers(1, max_prompt))
        prompt[i, :n] = rng.integers(0, 66, n)
        plen[i] = n

    def fresh():
        return dataclasses.replace(
            init_state(qp, n_slots, max_prompt),
            prompt=jnp.asarray(prompt), plen=jnp.asarray(plen),
            total=jnp.full((n_slots,), 40, jnp.int32),
        )

    s_ref, toks_ref = fused_slot_tick(qp, fresh(), inner, slot_tile=0)
    s_st, toks_st = fused_slot_tick(
        qp, fresh(), inner, mesh=mesh, slot_axis=MODEL_AXIS, slot_tile=64,
    )
    np.testing.assert_array_equal(np.asarray(toks_st), np.asarray(toks_ref))
    np.testing.assert_allclose(np.asarray(s_st.h), np.asarray(s_ref.h),
                               atol=1e-5, rtol=1e-5)

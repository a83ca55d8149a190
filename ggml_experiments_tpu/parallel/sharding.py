"""Tensor-parallel sharding rules for the model param pytrees.

DP/TP placement per BASELINE.json's north star: weights tensor-sharded over
ICI (the ``model`` axis), batch over ``data``; XLA inserts the all-gathers /
reduce-scatters and overlaps them with compute via its latency-hiding
scheduler (SURVEY.md §5 "Distributed communication backend").

Rules (Megatron-style pairing so each block needs one collective):
* GRU: gate kernels column-parallel over ``model`` (the 3U gate dim);
  state stays replicated (it is all-gathered once per step, B×U is tiny);
  vocab head row-parallel (psum) — embeddings replicated.
* MobileViT transformer: Q/K/V + MLP-in column-parallel, attention-out +
  MLP-out row-parallel; convs/norms/biases replicated (they are small and
  conv channel counts here don't tile 128 lanes; SNIPPETS.md [3] uses the
  same policy).

QTensor leaves shard by the same logical spec applied to both codes and
scales (their row counts differ by the 32-block factor but the partitioned
axis layout is identical).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggml_experiments_tpu.models.gru_textgen import GRUTextGenParams
from ggml_experiments_tpu.models.mobilevit import MobileViTParams
from ggml_experiments_tpu.ops.attention import AttentionParams
from ggml_experiments_tpu.ops.gru import GRUCellParams
from ggml_experiments_tpu.quant.qtensor import BLOCK, QTensor
from ggml_experiments_tpu.parallel.mesh import MODEL_AXIS


def _is_leaf(x) -> bool:
    return isinstance(x, QTensor)


def spec_like(tree: Any, spec_tree: Any):
    """Zip a params pytree with a PartitionSpec pytree (specs broadcast onto
    QTensor leaves)."""
    return jax.tree_util.tree_map(lambda _, s: s, tree, spec_tree, is_leaf=_is_leaf)


def qtensor_sharding(mesh: Mesh, qt: QTensor, spec: P) -> QTensor:
    """Place a QTensor's codes+scales with a partition spec.

    Row-parallel (P('model', None)) shards the K dim. Block quantization
    ties K-tiles to scale rows (one scale row per 32 K rows), so it is only
    legal when every shard holds whole 32-row blocks: Kp % (32 * n_shards)
    == 0 — true for all this repo's row-parallel weights (e.g. the 1024-K
    vocab head on 2/4/8-way meshes). Q4_0 nibble-packs two K rows per codes
    row, so its codes shard at Kp/2 granularity (consistent: 32*n | Kp
    implies 16*n | Kp/2). When the divisibility fails, fall back to
    column-parallel P(None, 'model') (the N dim is lane-padded to 128 and
    always divides); XLA re-inserts the matching collective either way.
    """
    axes = [a for a in spec if a is not None] if spec else []
    if not axes:
        row = col = None
    else:
        row, col = (spec + (None, None))[:2]

    def _axis_size(name) -> int:
        names = (name,) if isinstance(name, str) else tuple(name)
        n = 1
        for a in names:
            n *= mesh.shape[a]
        return n

    # q4_k's supers plane is stacked halves (d rows then m rows): a row shard
    # would split the halves across devices, so q4_k always sanitizes to
    # column-parallel (N is lane-padded and always divides)
    if qt.qtype == "q4_k":
        row = None  # falls through to the column-parallel sanitization below
    if row is not None and qt.kp % (BLOCK * _axis_size(row)) == 0:
        eff = P(row, col)
    elif axes:
        eff = P(None, axes[0])  # sanitize to column-parallel
    else:
        eff = P()
    ns = NamedSharding(mesh, eff)
    return QTensor(
        codes=jax.device_put(qt.codes, ns),
        scales=jax.device_put(qt.scales, ns),
        shape=qt.shape,
        qtype=qt.qtype,
        mins=None if qt.mins is None else jax.device_put(qt.mins, ns),
        hibits=None if qt.hibits is None else jax.device_put(qt.hibits, ns),
        supers=None if qt.supers is None else jax.device_put(qt.supers, ns),
    )


def place(tree: Any, spec_tree: Any, mesh: Mesh):
    """device_put every leaf according to its PartitionSpec (QTensor-aware)."""

    def _place(leaf, spec):
        if leaf is None:
            return None
        if isinstance(leaf, QTensor):
            return qtensor_sharding(mesh, leaf, spec)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_place, tree, spec_tree, is_leaf=_is_leaf)


# ---------------------------------------------------------------------------
# GRU text generator
# ---------------------------------------------------------------------------


def gru_param_specs(params: GRUTextGenParams) -> GRUTextGenParams:
    """PartitionSpec tree shaped like GRUTextGenParams."""
    col = P(None, MODEL_AXIS)  # column-parallel: shard the 3U gate dim
    return GRUTextGenParams(
        embeddings=P(),                      # (V, E) tiny, replicated
        cell=GRUCellParams(
            kernel=col,                      # (E, 3U)
            recurrent_kernel=col,            # (U, 3U)
            bias=None if params.cell.bias is None else P(None, MODEL_AXIS),
        ),
        dense_kernel=P(MODEL_AXIS, None),    # (U, V) row-parallel -> psum
        dense_bias=None if params.dense_bias is None else P(),
    )


# ---------------------------------------------------------------------------
# MobileViT
# ---------------------------------------------------------------------------


def _attention_specs(p: AttentionParams) -> AttentionParams:
    col, row = P(None, MODEL_AXIS), P(MODEL_AXIS, None)
    return AttentionParams(
        wq=col, bq=P(MODEL_AXIS), wk=col, bk=P(MODEL_AXIS), wv=col, bv=P(MODEL_AXIS),
        wo=row, bo=P(),
        num_heads=p.num_heads,
    )


def mobilevit_param_specs(params: MobileViTParams) -> MobileViTParams:
    """PartitionSpec tree shaped like MobileViTParams (convs replicated,
    transformer dense kernels Megatron-paired over ``model``)."""
    rep = P()

    def conv_spec(c):
        return jax.tree_util.tree_map(lambda _: rep, c)

    def tl_spec(tl):
        return type(tl)(
            ln_before_gamma=rep,
            ln_before_beta=rep,
            attention=_attention_specs(tl.attention),
            ln_after_gamma=rep,
            ln_after_beta=rep,
            intermediate_kernel=P(None, MODEL_AXIS),
            intermediate_bias=P(MODEL_AXIS),
            output_kernel=P(MODEL_AXIS, None),
            output_bias=rep,
            eps=tl.eps,
        )

    def block_spec(b):
        return type(b)(
            downsampling=conv_spec(b.downsampling),
            conv_kxk=conv_spec(b.conv_kxk),
            conv_1x1=conv_spec(b.conv_1x1),
            transformer=tuple(tl_spec(t) for t in b.transformer),
            ln_gamma=rep,
            ln_beta=rep,
            conv_projection=conv_spec(b.conv_projection),
            fusion=conv_spec(b.fusion),
            patch_size=b.patch_size,
            eps=b.eps,
        )

    return MobileViTParams(
        conv_stem=conv_spec(params.conv_stem),
        layer_1=tuple(conv_spec(b) for b in params.layer_1),
        layer_2=tuple(conv_spec(b) for b in params.layer_2),
        layer_3=block_spec(params.layer_3),
        layer_4=block_spec(params.layer_4),
        layer_5=block_spec(params.layer_5),
        conv_1x1_exp=conv_spec(params.conv_1x1_exp),
        classifier_kernel=None if params.classifier_kernel is None else P(MODEL_AXIS, None),
        classifier_bias=None if params.classifier_bias is None else rep,
    )

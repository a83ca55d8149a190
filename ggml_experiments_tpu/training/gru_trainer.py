"""GRU language-model training: Adam + sparse CE, SPMD over a (data, model) mesh.

The JAX re-design of the reference's TF training path
(rnn_text_generation.py:79-99: compile(adam, SparseCategoricalCrossentropy
(from_logits=True)), fit with a best-by-loss ModelCheckpoint). Here the train
step is one jitted SPMD program: batch sharded over ``data``, gate kernels
tensor-sharded over ``model`` (parallel/sharding.py), gradients meaned by
XLA's psum over the data axis — no NCCL/MPI analog needed (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.models.gru_textgen import GRUConfig, GRUTextGenParams
from ggml_experiments_tpu.parallel import mesh as mesh_lib
from ggml_experiments_tpu.parallel.sharding import gru_param_specs, place
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3   # Keras adam default (reference :93)
    epochs: int = 20              # reference :92
    log_every: int = 50
    checkpoint_path: Optional[str] = None
    remat: bool = False           # jax.checkpoint the cell (long sequences)
    eval_every: int = 0           # >0: held-out ppl every N steps (needs eval data)
    # Exact crash-resume: ``resume_path`` holds the FULL train state
    # (params + Adam state + step); ``save_every > 0`` rewrites it every N
    # steps, and a train() started with an existing resume_path continues
    # bit-exactly where the interrupted run stopped (the reference's Keras
    # ModelCheckpoint is weights-only — a restart loses the optimizer).
    resume_path: Optional[str] = None
    save_every: int = 0
    # Mixed precision: bfloat16 runs the forward/backward matmuls single-pass
    # on the MXU and stores scan activations in bf16, while params, grads (at
    # the param boundary), Adam state and the CE loss all stay float32 — the
    # standard master-weights recipe. float32 matches the reference exactly.
    compute_dtype: Any = jnp.float32


def sparse_softmax_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean CE from logits — tf.losses.SparseCategoricalCrossentropy(from_logits=True).

    Logits are promoted to f32 so the log-sum-exp is full-precision even when
    the forward ran in bfloat16. The true-class logit is picked with a
    one-hot contraction, not ``take_along_axis``: on TPU the row gather
    lowers to a per-row dynamic-slice loop that costs more than the whole
    log-sum-exp (measured 1.3 ms/step of a 19 ms training step at
    B=1024/T=100; the one-hot multiply-reduce is one vectorized pass)."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    true_logit = jnp.sum(logits * onehot, axis=-1)
    return (lse - true_logit).mean()


def loss_fn(
    params: GRUTextGenParams, inputs: jax.Array, targets: jax.Array, *,
    remat: bool = False, compute_dtype=jnp.float32,
) -> jax.Array:
    # Run the forward time-major: only the tiny (B, T) int32 ids get
    # transposed, never the (T, B, 3U) projection / (T, B, U) states the
    # batch-major layout would shuffle (~840 MB/step at B=1024, T=100).
    # The mean CE is layout-invariant, so targets just transpose to match.
    logits_tm, _ = gru_textgen.forward_sequence(
        params, inputs.swapaxes(0, 1), remat=remat, compute_dtype=compute_dtype,
        time_major=True,
    )
    return sparse_softmax_cross_entropy(logits_tm, targets.swapaxes(0, 1))


def make_train_step(
    optimizer: optax.GradientTransformation,
    mesh=None,
    *,
    remat: bool = False,
    compute_dtype=jnp.float32,
) -> Callable:
    """Build the jitted (params, opt_state, inputs, targets) -> ... step.

    With a mesh, inputs/targets are expected sharded over ``data`` and params
    per ``gru_param_specs``; XLA derives gradient/optimizer shardings and
    inserts the cross-device collectives. ``compute_dtype=bfloat16`` is the
    mixed-precision fast path (see TrainConfig.compute_dtype).
    """

    def train_step(params, opt_state, inputs, targets):
        loss, grads = jax.value_and_grad(
            lambda p, i, t: loss_fn(p, i, t, remat=remat, compute_dtype=compute_dtype)
        )(params, inputs, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1))

    data_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    return jax.jit(
        train_step,
        donate_argnums=(0, 1),
        in_shardings=(None, None, data_sh, data_sh),  # params/opt keep their placement
    )


def train(
    params: GRUTextGenParams,
    batches: Iterable[Tuple[Any, Any]],
    cfg: TrainConfig = TrainConfig(),
    *,
    mesh=None,
    log: Callable[[dict], None] = None,
    eval_seqs=None,
) -> Tuple[GRUTextGenParams, list]:
    """Run the training loop over an iterable of (inputs, targets) batches.

    Returns (params, history). With ``cfg.checkpoint_path``, keeps the
    best-by-loss native checkpoint (formats/checkpoint.py), mirroring the
    reference's ModelCheckpoint(save_best_only, monitor='loss').

    ``eval_seqs`` ((B, T+1) int32 held-out windows) + ``cfg.eval_every`` add
    a validation perplexity to the history every N steps — the Keras
    validation_data analog the reference's script lacks.
    """
    import os

    import numpy as _np

    optimizer = optax.adam(cfg.learning_rate)
    if mesh is not None:
        params = place(params, gru_param_specs(params), mesh)
    opt_state = optimizer.init(params)
    start_step = 0
    resumed_best = None
    if cfg.resume_path and os.path.exists(cfg.resume_path):
        from ggml_experiments_tpu.formats.checkpoint import load_into

        state = load_into(cfg.resume_path, {
            "params": params, "opt_state": opt_state,
            "step": _np.zeros((), _np.int32),
            "best": _np.zeros((), _np.float32),
        })
        # clear mismatch error instead of a shape failure deep inside jit
        # (the stream itself cannot be validated — resume assumes the same
        # seeded corpus/batches, which skipping start_step relies on)
        for (kp, old), new in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_leaves(state["params"]),
        ):
            if old.shape != new.shape:
                raise ValueError(
                    f"resume checkpoint {cfg.resume_path} does not match this "
                    f"model: {jax.tree_util.keystr(kp)} is {new.shape}, "
                    f"expected {old.shape}"
                )
        params, opt_state = state["params"], state["opt_state"]
        start_step = int(state["step"]) + 1  # saved AFTER that step ran
        resumed_best = float(state["best"])
        if mesh is not None:
            params = place(params, gru_param_specs(params), mesh)
            # adam state's mu/nu mirror the param tree — re-place them with
            # the same specs (count stays replicated)
            inner, *rest = opt_state
            inner = inner._replace(
                mu=place(inner.mu, gru_param_specs(inner.mu), mesh),
                nu=place(inner.nu, gru_param_specs(inner.nu), mesh),
            )
            opt_state = (inner, *rest)
    step_fn = make_train_step(
        optimizer, mesh, remat=cfg.remat, compute_dtype=cfg.compute_dtype
    )

    manager = None
    if cfg.checkpoint_path:
        from ggml_experiments_tpu.formats.checkpoint import CheckpointManager

        manager = CheckpointManager(cfg.checkpoint_path)
        if resumed_best is not None:
            # best-by-loss must survive the crash too, or the first resumed
            # step would overwrite a better pre-crash checkpoint
            manager.best = resumed_best

    from ggml_experiments_tpu.training.prefetch import prefetch_to_device

    eval_fn = None
    if cfg.eval_every and eval_seqs is not None:
        ev = jnp.asarray(_np.asarray(eval_seqs, _np.int32))
        ev_in, ev_tg = ev[:, :-1], ev[:, 1:]

        @jax.jit
        def _val_ppl(p):
            logits, _ = gru_textgen.forward_sequence(p, ev_in)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, ev_tg[..., None], axis=-1)[..., 0]
            return jnp.exp(nll.mean())

        eval_fn = _val_ppl

    sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS)) if mesh is not None else None
    history = []
    t0 = time.time()
    if start_step:
        # the batch stream is deterministic (seeded); skip what the
        # interrupted run already consumed BEFORE prefetch transfers it
        import itertools

        batches = itertools.islice(batches, start_step, None)
    stream = prefetch_to_device(batches, sharding=sharding)
    for i, (inputs, targets) in enumerate(stream, start=start_step):
        params, opt_state, loss = step_fn(params, opt_state, inputs, targets)
        if cfg.resume_path and cfg.save_every and i % cfg.save_every == 0:
            from ggml_experiments_tpu.formats import checkpoint as _ckpt

            _ckpt.save(cfg.resume_path, {
                "params": params, "opt_state": opt_state,
                "step": _np.int32(i),
                "best": _np.float32(manager.best if manager is not None
                                    else _np.inf),
            })
        do_eval = eval_fn is not None and i % cfg.eval_every == 0
        if i % cfg.log_every == 0 or manager is not None or do_eval:
            loss_val = float(loss)
            rec = {"step": i, "loss": loss_val, "elapsed_s": time.time() - t0}
            if do_eval:
                rec["val_ppl"] = float(eval_fn(params))
            history.append(rec)
            if log is not None and i % cfg.log_every == 0:
                log(rec)
            if manager is not None:
                manager.maybe_save(params, loss_val)
    return params, history


def train_from_text(
    text: str,
    *,
    model_config: GRUConfig = GRUConfig(),
    train_config: TrainConfig = TrainConfig(),
    data_config=None,
    seed: int = 0,
    mesh=None,
    eval_text: Optional[str] = None,
    max_eval_windows: int = 32,
):
    """End-to-end: corpus text -> trained params (the reference script's
    top-to-bottom flow, rnn_text_generation.py). ``eval_text`` + a positive
    ``train_config.eval_every`` add held-out validation perplexity."""
    from ggml_experiments_tpu.training.data import DataConfig, batches as make_batches, make_examples
    from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

    data_config = data_config or DataConfig()
    tok = CharTokenizer()
    examples = make_examples(text, tok, data_config)
    params = gru_textgen.init_params(model_config, jax.random.PRNGKey(seed))
    stream = make_batches(examples, data_config, seed=seed, epochs=train_config.epochs)
    eval_seqs = None
    if eval_text is not None:
        eval_seqs = make_examples(eval_text, tok, data_config)[:max_eval_windows]
    params, history = train(params, stream, train_config, mesh=mesh, eval_seqs=eval_seqs)
    return params, history, tok

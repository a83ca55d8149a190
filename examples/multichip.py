"""DP+TP execution over a device mesh — works on real chips or simulated.

Shards the GRU gate kernels over the `model` axis (column-parallel), the
vocab head row-parallel, the batch over `data`, then runs a training step
and a sharded decode. On one host without a pod, simulate devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ggml_experiments_tpu.models import gru_textgen
from ggml_experiments_tpu.models.gru_textgen import GRUConfig
from ggml_experiments_tpu.parallel import (
    DATA_AXIS, gru_param_specs, infer_mesh_shape, make_mesh, place,
)
from ggml_experiments_tpu.parallel.multihost import initialize
from ggml_experiments_tpu.training.gru_trainer import make_train_step


def main():
    initialize()  # no-op single host; wires jax.distributed on pods
    n = len(jax.devices())
    mesh = make_mesh(infer_mesh_shape(n))
    print(f"{n} devices, mesh {dict(mesh.shape)}")

    params = gru_textgen.init_params(GRUConfig(embed_dim=64, units=128), jax.random.PRNGKey(0))
    params = place(params, gru_param_specs(params), mesh)
    print("cell.kernel sharding:", params.cell.kernel.sharding.spec)

    opt = optax.adam(1e-3)
    step = make_train_step(opt, mesh=mesh)
    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    batch = max(8, n)
    inputs = jax.device_put(jnp.asarray(rng.integers(0, 66, (batch, 32)), jnp.int32), sh)
    targets = jax.device_put(jnp.asarray(rng.integers(0, 66, (batch, 32)), jnp.int32), sh)
    params, _, loss = step(params, opt.init(params), inputs, targets)
    print("train step loss:", float(loss))

    toks = gru_textgen.generate(
        params,
        jax.device_put(jnp.zeros((batch, 4), jnp.int32), sh),
        jax.device_put(jnp.full((batch,), 4, jnp.int32), sh),
        32,
    )
    print("sharded decode:", toks.shape)


if __name__ == "__main__":
    main()

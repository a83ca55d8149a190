"""Multihost utilities (single-process degenerate behavior + host-data assembly)."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from ggml_experiments_tpu.parallel import make_mesh
from ggml_experiments_tpu.parallel.multihost import (
    global_array_from_host_data,
    host_local_batch_slice,
    initialize,
    is_primary,
    sync_hosts,
)


def test_single_process_degenerates():
    initialize()  # no-op single host
    assert jax.process_count() == 1
    assert is_primary()
    assert host_local_batch_slice(32) == slice(0, 32)
    sync_hosts()  # no-op, must not raise


def test_global_array_from_host_data():
    mesh = make_mesh((2, 4))
    data = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = global_array_from_host_data(mesh, P("data"), data)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), data)
    assert arr.sharding.spec == P("data")

"""Pallas remote-DMA halo kernel vs the ppermute path (SURVEY.md N2).

Runs on the 8-virtual-device CPU mesh via the Pallas TPU interpreter's
distributed simulation; the same kernel compiles for real slices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from srcdsp_tpu.dist import make_mesh, time_sharding
from srcdsp_tpu.kernels.halo_dma import halo_from_left_pallas


def test_halo_dma_matches_ppermute_semantics():
    mesh = make_mesh(time=8)
    rng = np.random.default_rng(0)
    halo = 64
    per = 512
    x = jnp.asarray(rng.standard_normal((2, 8 * per)).astype(np.float32))
    xs = jax.device_put(x, jax.NamedSharding(mesh, P(None, "time")))
    got = halo_from_left_pallas(xs, halo, mesh, interpret=True)
    # expected: shard p gets shard p-1's last `halo` columns; shard 0 zeros
    g = np.asarray(got).reshape(2, 8, halo)
    xv = np.asarray(x).reshape(2, 8, per)
    np.testing.assert_array_equal(g[:, 0], np.zeros((2, halo), np.float32))
    for p in range(1, 8):
        np.testing.assert_array_equal(g[:, p], xv[:, p - 1, per - halo:])

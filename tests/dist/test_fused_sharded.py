"""Distributed fused Pallas front-end == single-device kernel, bit-exact.

The Pallas kernel runs in interpret mode inside shard_map on the fake
8-device mesh — validating the composed kernel+collective pipeline without
TPU hardware (the same code compiles per-shard on real slices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from srcdsp_tpu.dist import make_mesh
from srcdsp_tpu.dist.fused import mix_fir_time_sharded
from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel, mix_fir_decim_pallas
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass


def test_fused_kernel_time_sharded_bit_exact():
    mesh = make_mesh(time=8)
    taps = lowpass(64, 0.2)
    k = make_mix_fir_kernel(taps, 2, out_tile=128, b_rows=2, interpret=True)
    word = int(freq_to_word(0.123))
    word0 = 7890
    shard_n = 2 * k.block_in()
    n = 8 * shard_n
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, n)).astype(np.float32)

    # single-device reference: kernel fed [zeros-hist | x]
    xpad = np.concatenate([np.zeros((2, k.hist), np.float32), x], axis=1)
    w0_pad = (word0 - k.hist * word) % (1 << 32)
    r_ref, i_ref = mix_fir_decim_pallas(k, w0_pad, word, jnp.asarray(xpad))

    xs = jax.device_put(jnp.asarray(x),
                        jax.NamedSharding(mesh, P(None, "time")))
    tail0 = jnp.zeros((2, k.hist), jnp.float32)
    # the sharded path's word0 convention: phase of x[..,0] itself; the
    # shard body subtracts hist internally
    new_tail, y = mix_fir_time_sharded(k, word0, word, tail0, xs, mesh)
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(r_ref[0]))
    np.testing.assert_array_equal(np.asarray(y[1]), np.asarray(i_ref[0]))
    np.testing.assert_array_equal(np.asarray(new_tail), x[:, n - k.hist:])


def test_fused_kernel_sharded_multibuffer_stream():
    """Two sharded buffers streamed with the carried tail == one-shot."""
    mesh = make_mesh(time=4)
    taps = lowpass(32, 0.2)
    k = make_mix_fir_kernel(taps, 2, out_tile=128, b_rows=2, interpret=True)
    word = int(freq_to_word(0.31))
    shard_n = k.block_in()
    n = 4 * shard_n
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2 * n)).astype(np.float32)

    xpad = np.concatenate([np.zeros((2, k.hist), np.float32), x], axis=1)
    w0_pad = (-k.hist * word) % (1 << 32)
    r_ref, i_ref = mix_fir_decim_pallas(k, w0_pad, word, jnp.asarray(xpad))

    tail = jnp.zeros((2, k.hist), jnp.float32)
    outs = []
    for b in range(2):
        xb = jax.device_put(jnp.asarray(x[:, b * n:(b + 1) * n]),
                            jax.NamedSharding(mesh, P(None, "time")))
        tail, y = mix_fir_time_sharded(k, (b * n * word) % (1 << 32), word,
                                       tail, xb, mesh)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_array_equal(got[0], np.asarray(r_ref[0]))
    np.testing.assert_array_equal(got[1], np.asarray(i_ref[0]))

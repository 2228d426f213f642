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


def test_fftconv_time_sharded_bit_exact():
    """Time-sharded fused OS filter == single-device kernel, bit-exact,
    incl. 2-buffer streaming with the carried tail."""
    from srcdsp_tpu.dist.fused import fftconv_time_sharded
    from srcdsp_tpu.kernels.fftconv_pallas import (
        fftconv_pallas, make_fftconv_kernel)

    mesh = make_mesh(time=4)
    taps = lowpass(200, 0.1)
    cch = 2
    k = make_fftconv_kernel(taps, 2048, num_channels=cch, b_frames=2,
                            interpret=True)
    shard_n = k.block_in()
    n = 4 * shard_n
    rng = np.random.default_rng(2)
    x = rng.standard_normal((cch, 2, 2 * n)).astype(np.float32)

    pad = np.zeros((cch, 2, k.overlap), np.float32)
    r_ref, i_ref = fftconv_pallas(
        k, jnp.asarray(np.concatenate([pad, x], axis=-1)))

    sh = jax.NamedSharding(mesh, P(None, None, "time"))
    tail = jnp.zeros((cch, 2, k.overlap), jnp.float32)
    rs, is_ = [], []
    for b in range(2):
        xb = jax.device_put(jnp.asarray(x[:, :, b * n:(b + 1) * n]), sh)
        tail, yr, yi = fftconv_time_sharded(k, tail, xb, mesh)
        rs.append(np.asarray(yr))
        is_.append(np.asarray(yi))
    np.testing.assert_array_equal(np.concatenate(rs, axis=-1),
                                  np.asarray(r_ref))
    np.testing.assert_array_equal(np.concatenate(is_, axis=-1),
                                  np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(tail), x[:, :, -k.overlap:])

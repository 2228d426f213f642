"""Halo-FUSED mix+FIR kernel (remote DMA inside the pallas_call) vs the
single-device kernel and the ppermute+kernel path — bit-exact on the fake
mesh via the Pallas interpreter's distributed simulation."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.dist import make_mesh
from srcdsp_tpu.dist.fused import mix_fir_time_sharded
from srcdsp_tpu.kernels.halo_fused import (
    make_halo_fused_kernel, mix_fir_halo_sharded)
from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel, mix_fir_decim_pallas
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass


def test_halo_fused_matches_single_device():
    mesh = make_mesh(time=4)
    taps = lowpass(64, 0.2)
    decim = 2
    kf = make_halo_fused_kernel(taps, decim, out_tile=128, b_rows=2,
                                interpret=True)
    k1 = make_mix_fir_kernel(taps, decim, out_tile=128, b_rows=2,
                             interpret=True)
    word = int(freq_to_word(0.123))
    shard_n = 2 * 2 * 128 * decim          # 2 blocks of (b_rows*OT*M)
    n = 4 * shard_n
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, n)).astype(np.float32)

    xpad = np.concatenate([np.zeros((2, k1.hist), np.float32), x], axis=1)
    r_ref, i_ref = mix_fir_decim_pallas(
        k1, (-k1.hist * word) % (1 << 32), word, jnp.asarray(xpad))

    xs = jax.device_put(jnp.asarray(x),
                        jax.NamedSharding(mesh, jax.P(None, "time")))
    tail0 = jnp.zeros((2, kf.hist), jnp.float32)
    new_tail, y = mix_fir_halo_sharded(kf, 0, word, tail0, xs, mesh)
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(r_ref[0]))
    np.testing.assert_array_equal(np.asarray(y[1]), np.asarray(i_ref[0]))
    np.testing.assert_array_equal(np.asarray(new_tail), x[:, n - kf.hist:])


def test_halo_fused_multibuffer_matches_ppermute_path():
    """Two streamed buffers: the in-kernel-DMA path == the ppermute path
    (dist.fused), both bit-exact."""
    mesh = make_mesh(time=4)
    taps = lowpass(32, 0.25)
    decim = 2
    kf = make_halo_fused_kernel(taps, decim, out_tile=128, b_rows=2,
                                interpret=True)
    kp = make_mix_fir_kernel(taps, decim, out_tile=128, b_rows=2,
                             interpret=True)
    word = int(freq_to_word(0.31))
    shard_n = 2 * 128 * decim
    n = 4 * shard_n
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2 * n)).astype(np.float32)

    sh = jax.NamedSharding(mesh, jax.P(None, "time"))
    tail_a = jnp.zeros((2, kf.hist), jnp.float32)
    tail_b = jnp.zeros((2, kp.hist), jnp.float32)
    got_a, got_b = [], []
    for b in range(2):
        xb = jax.device_put(jnp.asarray(x[:, b * n:(b + 1) * n]), sh)
        w0 = (b * n * word) % (1 << 32)
        tail_a, ya = mix_fir_halo_sharded(kf, w0, word, tail_a, xb, mesh)
        tail_b, yb = mix_fir_time_sharded(kp, w0, word, tail_b, xb, mesh)
        got_a.append(np.asarray(ya))
        got_b.append(np.asarray(yb))
    np.testing.assert_array_equal(np.concatenate(got_a, axis=-1),
                                  np.concatenate(got_b, axis=-1))
    np.testing.assert_array_equal(np.asarray(tail_a), np.asarray(tail_b))

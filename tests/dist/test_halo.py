"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4.2).

conftest.py forces XLA_FLAGS=--xla_force_host_platform_device_count=8, so
these run in CI with no TPU; the same code paths run on real slices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from srcdsp_tpu.chains.channelizer import channelize_full, design_prototype
from srcdsp_tpu.dist import (
    channel_sharding, channelize_time_sharded, fir_time_sharded, make_mesh,
    time_sharding,
)
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import complex_awgn


@pytest.fixture(scope="module")
def devices8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 fake devices"
    return jax.devices()[:8]


def test_fir_time_sharded_bit_exact(devices8):
    """Halo-exchange FIR over 8 time shards == single-device FIR, bit-exact."""
    mesh = make_mesh(time=8)
    taps = jnp.asarray(lowpass(64, 0.1))
    x = complex_awgn(jax.random.PRNGKey(0), (8 * 1024,))
    xs = jax.device_put(x, time_sharding(mesh))
    y_dist = fir_time_sharded(taps, xs, mesh)
    y_ref = fir_full(taps, x)
    np.testing.assert_array_equal(np.asarray(y_dist), np.asarray(y_ref))


def test_fir_time_sharded_decimating(devices8):
    mesh = make_mesh(time=4)
    taps = jnp.asarray(lowpass(32, 0.1))
    x = complex_awgn(jax.random.PRNGKey(1), (4 * 512,))
    xs = jax.device_put(x, time_sharding(mesh))
    y_dist = fir_time_sharded(taps, xs, mesh, decim=4)
    y_ref = fir_full(taps, x, decim=4)
    np.testing.assert_array_equal(np.asarray(y_dist), np.asarray(y_ref))


def test_fir_time_sharded_multichannel(devices8):
    """2 channel-shards x 4 time-shards on one mesh."""
    mesh = make_mesh(time=4, channel=2)
    taps = jnp.asarray(lowpass(16, 0.2))
    x = complex_awgn(jax.random.PRNGKey(2), (2, 4 * 256))
    sh = jax.NamedSharding(mesh, P("channel", "time"))
    xs = jax.device_put(x, sh)
    # shard_map in fir_time_sharded only maps the time axis; the channel
    # axis rides along as a leading batch dim of each shard.
    y_ref = fir_full(taps, x)
    import functools
    from srcdsp_tpu.dist.halo import _fir_shard
    f = jax.shard_map(
        functools.partial(_fir_shard, taps, decim=1, axis_name="time"),
        mesh=mesh, in_specs=(P("channel", "time"),), out_specs=P("channel", "time"))
    y_dist = f(xs)
    np.testing.assert_array_equal(np.asarray(y_dist), np.asarray(y_ref))


def test_channelizer_time_sharded_matches_full(devices8):
    """Time-sharded channelizer + all_to_all == channelize_full, bit-exact."""
    m, p = 16, 8
    mesh = make_mesh(time=p)
    h = design_prototype(m, taps_per_phase=4)
    x = complex_awgn(jax.random.PRNGKey(3), (p * m * 32,))
    xs = jax.device_put(x, time_sharding(mesh))
    y_dist = channelize_time_sharded(h, xs, m, mesh)
    y_ref = channelize_full(h, x, m)
    np.testing.assert_array_equal(np.asarray(y_dist), np.asarray(y_ref))


def test_channel_sharded_demod_runs(devices8):
    """Channel-parallel FSK demod: pure sharding, no collectives."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone
    mesh = make_mesh(channel=8)
    nch, nsym, decim, sps, dev = 8, 64, 4, 8, 0.05
    bits = random_bits(jax.random.PRNGKey(4), (nch, nsym))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = bb * tone(bb.shape[-1], 0.11)
    params = make_fsk_params(0.11, 64, 0.03, decim, sps, dev)
    state = fsk_init(params, channel_shape=(nch,))
    sh = channel_sharding(mesh, ndim=2)
    xs = jax.device_put(x, sh)
    state = jax.device_put(state, jax.NamedSharding(mesh, P()))
    st, (rx, soft) = jax.jit(fsk_apply)(params, state, xs)
    # decode still works under sharding
    assert rx.shape == (nch, nsym)


def test_fir_time_sharded_stream_multibuffer(devices8):
    """Streaming buffers through the sharded FIR == one-device streaming."""
    from srcdsp_tpu.dist.halo import fir_time_sharded_stream
    mesh = make_mesh(time=8)
    taps = jnp.asarray(lowpass(48, 0.12))
    x = complex_awgn(jax.random.PRNGKey(9), (4 * 8 * 256,))
    ref = fir_full(taps, x)
    tail = jnp.zeros(47, jnp.complex64)
    outs = []
    nbuf = 4
    n = x.shape[-1] // nbuf
    for b in range(nbuf):
        xb = jax.device_put(x[b * n:(b + 1) * n], time_sharding(mesh))
        tail, y = fir_time_sharded_stream(taps, tail, xb, mesh)
        outs.append(y)
    got = jnp.concatenate(outs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_channelizer_os2_time_sharded_matches_full(devices8):
    from srcdsp_tpu.chains.channelizer import channelize_os2_full
    from srcdsp_tpu.dist.channelize import channelize_os2_time_sharded
    m, p = 16, 8
    mesh = make_mesh(time=p)
    h = design_prototype(m, taps_per_phase=4)
    x = complex_awgn(jax.random.PRNGKey(12), (p * m * 16,))
    xs = jax.device_put(x, time_sharding(mesh))
    y_dist = channelize_os2_time_sharded(h, xs, m, mesh)
    y_ref = channelize_os2_full(h, x, m)
    np.testing.assert_array_equal(np.asarray(y_dist), np.asarray(y_ref))


@pytest.mark.slow
def test_streaming_distributed_pipeline(devices8):
    """Production-shaped integration: multi-buffer streaming through the
    time-sharded halo FIR and the all_to_all channelizer, with carried
    inter-buffer state — bit-identical to a single-device one-shot run."""
    from srcdsp_tpu.chains.channelizer import channelize_full
    from srcdsp_tpu.dist.channelize import channelize_time_sharded_stream
    from srcdsp_tpu.dist.halo import fir_time_sharded_stream
    mesh = make_mesh(time=8)
    m = 16
    pre = jnp.asarray(lowpass(48, 0.45))
    proto = design_prototype(m, taps_per_phase=4)
    from srcdsp_tpu.chains.channelizer import pad_prototype
    tproto = int(pad_prototype(proto, m).shape[0])
    x = complex_awgn(jax.random.PRNGKey(21), (4 * 8 * m * 16,))
    # single-device reference: FIR then channelize, both from rest
    ref = channelize_full(proto, fir_full(pre, x), m)
    # distributed streaming in 4 buffers
    tail_f = jnp.zeros(47, jnp.complex64)
    tail_c = jnp.zeros(tproto - 1, jnp.complex64)
    outs = []
    n = x.shape[-1] // 4
    for b in range(4):
        xb = jax.device_put(x[b * n:(b + 1) * n], time_sharding(mesh))
        tail_f, y = fir_time_sharded_stream(pre, tail_f, xb, mesh)
        tail_c, banks = channelize_time_sharded_stream(proto, tail_c, y, m, mesh)
        outs.append(banks)
    got = jnp.concatenate(outs, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

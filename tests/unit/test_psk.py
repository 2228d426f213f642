"""PSK demod chain tests (SURVEY.md C9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.psk import (
    constellation_offset, diff_decode, diff_encode, make_psk_params,
    psk_apply, psk_init, psk_slice,
)
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.resample import resample_full
from srcdsp_tpu.testing.signals import complex_awgn, psk_symbols, tone


def _tx(key, nsym, order, decim, sps, center, channel_shape=(), snr_db=None):
    """Pulse-shape differential-encoded random symbols and mix to `center`."""
    in_sps = decim * sps
    kd, kn = jax.random.split(jax.random.PRNGKey(key))
    data_idx = jax.random.randint(kd, (*channel_shape, nsym), 0, order)
    tx_idx = diff_encode(data_idx, order)
    off = constellation_offset(order)
    sym = jnp.exp(1j * TWO_PI * (tx_idx.astype(jnp.float32) + off) / order)
    params = make_psk_params(center, decim=decim, sps=sps, order=order)
    x = resample_full(params.taps, sym.astype(jnp.complex64), up=in_sps, down=1)
    x = x * tone(x.shape[-1], center)
    if snr_db is not None:
        # SNR defined on the pulse-shaped signal power
        p = float(jnp.mean(jnp.abs(x) ** 2))
        x = x + complex_awgn(kn, x.shape, power=p * 10 ** (-snr_db / 10))
    return data_idx, params, x


def _ser_diff(data_idx, rx_idx, order, settle=20):
    """Symbol error rate after differential decode, best over small lags."""
    d = np.asarray(diff_decode(jnp.asarray(rx_idx), order))
    b = np.asarray(data_idx)
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(b.shape[-1] - bs, d.shape[-1] - rs)
        if n <= 0:
            continue
        err = np.mean(b[..., bs:bs + n] != d[..., rs:rs + n])
        best = min(best, float(err))
    return best


@pytest.mark.parametrize("order", [2, 4, 8])
def test_psk_clean_ser_zero(order):
    nsym, decim, sps = 512, 2, 4
    data, params, x = _tx(1, nsym, order, decim, sps, center=0.17)
    state = psk_init(params)
    state, (rx, soft) = jax.jit(psk_apply)(params, state, x)
    assert _ser_diff(data, rx, order) == 0.0


def test_psk_noisy_qpsk():
    data, params, x = _tx(2, 1024, 4, 2, 4, center=0.17, snr_db=20.0)
    state = psk_init(params)
    state, (rx, _) = jax.jit(psk_apply)(params, state, x)
    assert _ser_diff(data, rx, 4) < 0.01


def test_psk_multichannel_vmap():
    nch, order = 16, 4
    data, params, x = _tx(3, 256, order, 2, 4, center=0.17, channel_shape=(nch,))
    state = psk_init(params, channel_shape=(nch,))
    state, (rx, _) = jax.jit(psk_apply)(params, state, x)
    errs = [_ser_diff(data[c], rx[c], order) for c in range(nch)]
    assert max(errs) == 0.0


def test_psk_streaming_blocks():
    """Block-streamed demod matches one-shot after carrier/timing settle."""
    order, decim, sps = 4, 2, 4
    data, params, x = _tx(4, 512, order, decim, sps, center=0.17)
    # one-shot
    st = psk_init(params)
    _, (rx1, _) = psk_apply(params, st, x)
    # 4 blocks
    st = psk_init(params)
    outs = []
    n = x.shape[-1] // 4
    for i in range(4):
        st, (rx, _) = psk_apply(params, st, x[..., i * n:(i + 1) * n])
        outs.append(rx)
    rx4 = jnp.concatenate(outs, axis=-1)
    assert _ser_diff(data, rx4, order) < 0.01
    assert _ser_diff(data, rx1, order) == 0.0


def test_slice_and_diff_roundtrip():
    order = 4
    idx = jnp.asarray([0, 1, 3, 2, 2, 0, 1])
    assert np.array_equal(np.asarray(diff_decode(diff_encode(idx, order), order)),
                          np.asarray(idx))
    off = constellation_offset(order)
    pts = jnp.exp(1j * TWO_PI * (idx.astype(jnp.float32) + off) / order)
    assert np.array_equal(np.asarray(psk_slice(pts, order, off)), np.asarray(idx))


def test_psk_demod_stream_scan():
    from srcdsp_tpu.chains.psk import psk_demod_stream
    order, decim, sps = 4, 2, 4
    data, params, x = _tx(9, 512, order, decim, sps, center=0.17)
    idx, soft = psk_demod_stream(params, x, block=x.shape[-1] // 4)
    assert _ser_diff(data, idx, order) < 0.01

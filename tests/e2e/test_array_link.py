"""Array -> demod composition: MVDR beamforming feeding the PSK chain.

A desired QPSK burst and a strong co-channel interferer arrive from
different directions at an 8-element ULA. A single element cannot
demodulate (interferer 6 dB above signal, same band); MVDR pointed at the
desired direction nulls the interferer and the standard chains.psk
receiver then runs SER 0 — the spatial layer composing with the temporal
chains, end to end."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.array import beamform, mvdr_weights, sample_covariance, \
    ula_steering
from srcdsp_tpu.chains.psk import (
    diff_decode, diff_encode, make_psk_params, psk_apply, psk_init,
)
from srcdsp_tpu.chains.tx import linear_tx_apply, linear_tx_init, \
    make_linear_tx, psk_map


def _ser(data, rx, order, settle=20):
    from srcdsp_tpu.metrics import ser
    d = np.asarray(diff_decode(jnp.asarray(rx), order))
    rate, _lag, _n = ser(np.asarray(data)[settle:], d[settle:], max_lag=16)
    return rate


def test_mvdr_beamformer_enables_demod():
    order, decim, sps, center = 4, 2, 4, 0.12
    rng = np.random.default_rng(0)

    rxp = make_psk_params(center, decim=decim, sps=sps, order=order)
    txp = make_linear_tx(center, rxp.taps, sps=decim * sps)

    data = jnp.asarray(rng.integers(0, order, 512))
    _, sig = linear_tx_apply(txp, linear_tx_init(txp),
                             psk_map(diff_encode(data, order), order))
    jam_data = jnp.asarray(rng.integers(0, order, 512))
    _, jam = linear_tx_apply(txp, linear_tx_init(txp),
                             psk_map(jam_data, order))

    e = 8
    a = np.asarray(ula_steering(e, 0.5, jnp.asarray([-0.4, 0.5])))
    x = (a[0][:, None] * np.asarray(sig)[None, :]
         + 2.0 * a[1][:, None] * np.asarray(jam)[None, :])   # +6 dB jammer
    x += 0.02 * (rng.standard_normal(x.shape)
                 + 1j * rng.standard_normal(x.shape))
    x = jnp.asarray(x.astype(np.complex64))

    # single element: hopeless (co-channel interferer dominates)
    _, (rx1, _) = jax.jit(psk_apply)(rxp, psk_init(rxp), x[0])
    assert _ser(data, rx1, order) > 0.1

    # MVDR toward the desired direction, then the SAME demod chain
    r = sample_covariance(x, loading=1e-3)
    w = mvdr_weights(r, jnp.asarray(a[0].astype(np.complex64)))
    y = beamform(w, x)
    _, (rx2, _) = jax.jit(psk_apply)(rxp, psk_init(rxp), y)
    assert _ser(data, rx2, order) == 0.0

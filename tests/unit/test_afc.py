"""Band-edge AFC (ops/afc.py): wide-range acquisition + Doppler ramp."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.psk import make_psk_params, diff_decode, diff_encode
from srcdsp_tpu.chains.tx import linear_tx_apply, linear_tx_init, \
    make_linear_tx, psk_map
from srcdsp_tpu.ops.afc import afc_apply, afc_init, make_afc
from srcdsp_tpu.testing.signals import np_tone


def _qpsk(nsym, sps, seed=0):
    rng = np.random.default_rng(seed)
    data = jnp.asarray(rng.integers(0, 4, nsym))
    rxp = make_psk_params(0.0, decim=1, sps=sps, order=4)
    txp = make_linear_tx(0.0, rxp.taps, sps=sps)
    _, x = linear_tx_apply(txp, linear_tx_init(txp),
                           psk_map(diff_encode(data, 4), 4))
    return data, rxp, np.asarray(x)


def test_acquires_large_cfo():
    """CFO = 0.3 symbol rates — ~2.4x beyond the QPSK Costas/V&V range
    (Rs/8): the AFC converges within a few blocks and the standard PSK
    chain then demodulates the tail SER 0."""
    sps = 8
    nsym = 4096
    data, rxp, x = _qpsk(nsym, sps)
    cfo = 0.3 / sps
    x = x * np_tone(x.size, cfo)

    afc = make_afc(symbol_rate=1.0 / sps)   # default gain 0.1
    st = afc_init(afc)
    blocks = np.split(x, 16)
    ys, freqs = [], []
    for blk in blocks:
        st, (y, f) = afc_apply(afc, st, jnp.asarray(blk.astype(np.complex64)))
        ys.append(np.asarray(y))
        freqs.append(float(f))
    freqs.append(float(st.freq))
    # converged estimate within 2% of the symbol rate
    assert abs(freqs[-1] - cfo) < 0.02 / sps, (freqs[-1], cfo)
    # acquire-then-FREEZE handoff (per-block frequency steps kink the
    # carrier at seams; after lock you derotate with the fixed estimate
    # and let the chain's V&V track the small residual): demod the
    # second half with the final estimate -> SER 0
    half = x[x.size // 2:]
    tail = half * np.asarray(np_tone(half.size, -freqs[-1]))
    # residual CFO (~0.2% Rs) ramps the phase across a long call: the
    # closed-loop tracker (chains.tracking) is the right consumer
    from srcdsp_tpu.chains.tracking import psk_track_apply, psk_track_init
    _, (rx, _) = jax.jit(psk_track_apply)(
        rxp, psk_track_init(rxp), jnp.asarray(tail.astype(np.complex64)))
    d = np.asarray(diff_decode(rx, 4))
    want = np.asarray(data)[nsym // 2:]
    best = min(float(np.mean(want[24:24 + 1500] != d[24 + lag:24 + lag + 1500]))
               for lag in range(0, 17))
    assert best == 0.0, best


def test_tracks_doppler_ramp():
    """A slow CFO ramp: the per-block estimate follows it."""
    sps = 8
    nsym = 8192
    _, _, x = _qpsk(nsym, sps, seed=1)
    n = x.size
    k = np.arange(n)
    ramp = 0.05 / sps + 0.1 / sps * k / n           # 0.05 -> 0.15 Rs
    ph = np.cumsum(ramp)
    x = x * np.exp(2j * np.pi * ph).astype(np.complex64)

    afc = make_afc(symbol_rate=1.0 / sps, gain=0.15)
    st = afc_init(afc)
    est = []
    blocks = np.split(x, 32)
    mid = []
    for i, blk in enumerate(blocks):
        st, (y, f) = afc_apply(afc, st, jnp.asarray(blk.astype(np.complex64)))
        est.append(float(st.freq))
        mid.append(ramp[(i * len(blk)) + len(blk) // 2])
    est = np.asarray(est)
    mid = np.asarray(mid)
    # after acquisition, the estimate follows the ramp within Rs/25
    err = np.abs(est[8:] - mid[8:])
    assert err.max() < 0.02 / sps * 2.0, err.max()

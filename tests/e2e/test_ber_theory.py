"""Noise performance vs theory (SURVEY.md §4.2 accuracy tier).

Clean-signal tests prove plumbing; these prove DSP quality: measured error
rates at a given Es/N0 must sit near the textbook curves (loose factor-of-2
bands — synchronizer losses are real but small).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erfc

from srcdsp_tpu.chains.psk import (
    constellation_offset, diff_decode, diff_encode, make_psk_params,
    psk_apply, psk_init,
)
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.resample import resample_full
from srcdsp_tpu.testing.signals import complex_awgn


def _qfunc(x):
    return 0.5 * erfc(x / np.sqrt(2.0))


def test_qpsk_ser_tracks_theory():
    """QPSK through the full chain at Es/N0 = 10 dB.

    Theory (coherent QPSK): SER = 2Q(sqrt(Es/N0)) - Q^2. Differential
    decoding doubles errors (isolated symbol errors corrupt two diffs);
    allow [0.5x, 4x] of 2*SER_theory.
    """
    order, sps, nsym = 4, 4, 20000
    esn0_db = 10.0
    key = jax.random.PRNGKey(0)
    kd, kn = jax.random.split(key)
    data = jax.random.randint(kd, (nsym,), 0, order)
    tx = diff_encode(data, order)
    off = constellation_offset(order)
    sym = jnp.exp(1j * TWO_PI * (tx.astype(jnp.float32) + off) / order)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    x = resample_full(params.taps, sym.astype(jnp.complex64), up=sps, down=1)
    # Es measured at matched-filter output symbol instants on clean signal
    clean_mf = fir_full(params.taps, x)
    es = float(jnp.mean(jnp.abs(clean_mf[::sps]) ** 2))
    # AWGN with per-sample power N0; after the unit-energy matched filter the
    # noise variance at the symbol instant is N0, so Es/N0 is set directly.
    n0 = es / (10 ** (esn0_db / 10))
    x = x + complex_awgn(kn, x.shape, power=n0)
    st = psk_init(params)
    _, (rx, _) = jax.jit(psk_apply)(params, st, x)
    d = np.asarray(diff_decode(rx, order))
    b = np.asarray(data)
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = 32 + max(lag, 0), 32 + max(-lag, 0)
        n = min(len(b) - bs, len(d) - rs)
        best = min(best, float(np.mean(b[bs:bs + n] != d[rs:rs + n])))
    q = _qfunc(np.sqrt(10 ** (esn0_db / 10)))
    ser_coh = 2 * q - q * q
    ser_diff_theory = 2 * ser_coh
    assert 0.3 * ser_diff_theory < best < 4 * ser_diff_theory, (
        f"measured SER {best:.4f}, diff-QPSK theory {ser_diff_theory:.4f}")


def test_fsk_ber_improves_with_snr():
    """Monotonic sanity: BER at 8 dB >> BER at 16 dB >> ~0 at 24 dB."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    params = make_fsk_params(center, 64, 0.03, decim, sps, dev)
    bits = random_bits(jax.random.PRNGKey(1), (4096,))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    clean = bb * tone(bb.shape[-1], center)
    bers = []
    for i, snr_db in enumerate((8.0, 16.0, 24.0)):
        x = clean + complex_awgn(jax.random.PRNGKey(10 + i), clean.shape,
                                 power=10 ** (-snr_db / 10))
        st = fsk_init(params)
        _, (rx, _) = jax.jit(fsk_apply)(params, st, x)
        b, r = np.asarray(bits), np.asarray(rx)
        best = 1.0
        for lag in range(-16, 17):
            bs, rs = 32 + max(lag, 0), 32 + max(-lag, 0)
            n = min(len(b) - bs, len(r) - rs)
            best = min(best, float(np.mean(b[bs:bs + n] != r[rs:rs + n])))
        bers.append(best)
    assert bers[0] > 3 * bers[1] or bers[1] == 0.0
    assert bers[2] < 1e-3

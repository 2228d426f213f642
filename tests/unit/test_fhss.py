"""FHSS (chains/fhss.py): hop/dehop exactness, blind acquisition, and a
hopped CPFSK link through the FSK chain."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.fhss import fhss_acquire, fhss_dehop, fhss_hop, \
    make_fhss_params
from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
from srcdsp_tpu.metrics import align_sequences
from srcdsp_tpu.testing.signals import complex_awgn, fsk_baseband


def _params(hop_len=256):
    freqs = np.asarray([-0.35, -0.2, -0.05, 0.1, 0.25, 0.4])
    seq = np.asarray([0, 3, 1, 5, 2, 4, 0, 5, 3, 2, 4, 1])
    return make_fhss_params(freqs, seq, hop_len)


def test_hop_dehop_roundtrip_exact():
    p = _params()
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16 * 256) + 1j * rng.standard_normal(16 * 256)
         ).astype(np.complex64)
    y = fhss_hop(p, jnp.asarray(x), seq_phase=5)
    z = np.asarray(fhss_dehop(p, y, seq_phase=5))
    np.testing.assert_allclose(z, x, atol=1e-5)


def test_hop_moves_energy_to_sequence_frequencies():
    p = _params()
    x = jnp.ones(4 * 256, jnp.complex64)        # DC baseband
    y = np.asarray(fhss_hop(p, x))
    for k in range(4):
        seg = y[k * 256:(k + 1) * 256]
        f = np.fft.fftfreq(256)
        peak = f[np.argmax(np.abs(np.fft.fft(seg)))]
        np.testing.assert_allclose(peak, p.freqs[p.seq[k]], atol=1 / 256)


def test_blind_acquisition():
    """Random hop-boundary offset and sequence phase in noise: acquisition
    recovers both (offset to L/coarse granularity, here exact because the
    true offset lies on the coarse grid)."""
    p = _params()
    rng = np.random.default_rng(1)
    nseg = 40
    bb = (rng.standard_normal(nseg * 256) / 4
          + 1j * rng.standard_normal(nseg * 256) / 4 + 1.0
          ).astype(np.complex64)                # DC-heavy baseband
    y = np.asarray(fhss_hop(p, jnp.asarray(bb), seq_phase=7))
    off_true = 3 * 256 // 8
    cap = np.concatenate([
        0.2 * (rng.standard_normal(off_true)
               + 1j * rng.standard_normal(off_true)), y]).astype(np.complex64)
    cap += np.asarray(complex_awgn(jax.random.PRNGKey(2),
                                   (cap.size,), 0.05))
    off, ph = fhss_acquire(p, jnp.asarray(cap), coarse=8)
    # a hop boundary sits at off_true + m*L; acquisition may lock one hop
    # later — accept any boundary-consistent (offset, phase) pair
    assert (off - off_true) % 256 == 0, (off, off_true)
    shift = (off - off_true) // 256
    assert ph == (7 + shift) % p.seq.size, (ph, shift)


def test_hopped_cpfsk_link():
    """CPFSK inside the hops: dehop -> chains.fsk demodulates BER 0."""
    p = _params(hop_len=512)
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 512)
    bb = fsk_baseband(jnp.asarray(bits), 16, 0.02)      # 16 samples/bit
    y = fhss_hop(p, bb, seq_phase=2)
    y = y + complex_awgn(jax.random.PRNGKey(4), y.shape, 0.01)
    z = fhss_dehop(p, y, seq_phase=2)
    fp = make_fsk_params(0.0, 64, 0.05, 2, 8, dev=0.04)
    _, (got, _) = jax.jit(fsk_apply)(fp, fsk_init(fp), z)
    _, a, b = align_sequences(bits, np.asarray(got), max_lag=24)
    assert a.size > 450
    assert float(np.mean(a[8:] != b[8:])) == 0.0

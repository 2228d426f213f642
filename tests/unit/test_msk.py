"""Coherent MSK/GMSK via the LS-identified Laurent pulse (chains/msk.py)."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.msk import laurent_c0, msk_coherent_demod, \
    pseudo_symbols
from srcdsp_tpu.metrics import align_sequences
from srcdsp_tpu.testing.signals import gmsk_baseband


def test_pseudo_symbols_differential_relation():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 64)
    a = pseudo_symbols(bits)
    assert set(np.unique(a)) <= {-1.0, 1.0}
    np.testing.assert_allclose(a[1:] * a[:-1], 2.0 * bits[1:] - 1.0)


def test_ls_pulse_reconstructs_msk():
    """The identified pulse + pseudo-symbols reproduce the derotated MSK
    waveform to float precision (the decomposition is exact for MSK)."""
    sps = 8
    c0 = laurent_c0(sps, bt=None, c_span=2, nsym=128, seed=1)
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 64)
    x = gmsk_baseband(bits, sps, bt=None).astype(np.complex128)
    z = x * np.exp(-1j * np.pi * np.arange(x.size) / (2 * sps))
    a = pseudo_symbols(bits)
    rec = np.zeros(x.size + 2 * sps, np.complex128)
    for k in range(64):
        rec[k * sps:k * sps + 2 * sps] += a[k] * c0
    err = np.abs(rec[2 * sps:x.size] - z[2 * sps:]).max()
    assert err < 1e-5, err


def test_clean_roundtrip_msk_and_gmsk():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 512)
    for bt, cs in ((None, 2), (0.3, 4), (0.5, 3)):
        x = gmsk_baseband(bits, 8, bt=bt)
        c0 = laurent_c0(8, bt=bt, c_span=cs)
        bh, soft = msk_coherent_demod(jnp.asarray(x), 8, c0)
        _, a, b = align_sequences(bits, np.asarray(bh), max_lag=8)
        assert float(np.mean(a[4:-4] != b[4:-4])) == 0.0, bt


def test_noisy_near_theory():
    """6 dB Eb/N0: MSK within 1.7x of differential-BPSK theory (measured
    0.9x); GMSK BT=0.3 within 2.5x — the discriminator path reads ~0.26
    BER at this Eb/N0 (its regime is high SNR)."""
    sps = 8
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 16384)
    ebn0_db = 6.0
    th = 2 * 0.5 * math.erfc(math.sqrt(10 ** (ebn0_db / 10)))
    for bt, cs, mult in ((None, 2, 1.7), (0.3, 4, 2.5)):
        x = gmsk_baseband(bits, sps, bt=bt).astype(np.complex128)
        pn = sps / 10 ** (ebn0_db / 10)
        nz = np.sqrt(pn / 2) * (rng.standard_normal(x.size)
                                + 1j * rng.standard_normal(x.size))
        y = jnp.asarray((x + nz).astype(np.complex64))
        bh, _ = msk_coherent_demod(y, sps, laurent_c0(sps, bt=bt, c_span=cs))
        _, a, b = align_sequences(bits, np.asarray(bh), max_lag=8)
        ber = float(np.mean(a[4:-4] != b[4:-4]))
        assert 0.0 < ber < mult * th, (bt, ber, th)


def test_gmsk_burst_acquisition_and_coherent_demod():
    """Unsynchronized noisy capture: framesync correlates against the
    modulated preamble waveform to find the burst start, then the
    coherent Laurent receiver demodulates the payload — the acquisition
    composition the module docstring prescribes."""
    from srcdsp_tpu.chains.framesync import (
        frame_sync_apply, frame_sync_init, make_frame_sync_params,
        peak_indices, peak_to_burst_start)

    sps, bt = 8, 0.3
    rng = np.random.default_rng(9)
    # APERIODIC preamble (a repeated pattern puts correlation sidelobes
    # at every period and the first threshold crossing can win)
    pre_bits = np.random.default_rng(42).integers(0, 2, 32)
    payload = rng.integers(0, 2, 256)
    burst = gmsk_baseband(np.concatenate([pre_bits, payload]), sps, bt=bt)
    cap = np.concatenate([
        np.zeros(613, np.complex64), np.asarray(burst),
        np.zeros(200, np.complex64)])
    cap = cap + (0.1 * (np.random.default_rng(10).standard_normal(cap.size)
                 + 1j * np.random.default_rng(11).standard_normal(cap.size))
                 ).astype(np.complex64)

    pre_wave = gmsk_baseband(pre_bits, sps, bt=bt)
    p = make_frame_sync_params(jnp.asarray(pre_wave), threshold=0.5)
    _, (score, mask, first) = frame_sync_apply(p, frame_sync_init(p),
                                               jnp.asarray(cap))
    hits = peak_indices([np.asarray(mask)], [np.asarray(first)])
    assert len(hits) >= 1
    start = peak_to_burst_start(hits[0], pre_wave.shape[-1])
    assert abs(start - 613) <= 1, start

    c0 = laurent_c0(sps, bt=bt, c_span=4)
    bh, _ = msk_coherent_demod(jnp.asarray(cap[start:]), sps, c0)
    want = np.concatenate([pre_bits, payload])
    _, a, b = align_sequences(want, np.asarray(bh), max_lag=8)
    ber = float(np.mean(a[8:-8] != b[8:-8]))
    assert ber == 0.0, ber

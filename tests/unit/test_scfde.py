"""SC-FDE (chains/scfde.py): MMSE equalization over multipath, PAPR
advantage vs OFDM."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.qam import qam_constellation, qam_slice
from srcdsp_tpu.chains.scfde import make_scfde_spec, scfde_rx, scfde_tx
from srcdsp_tpu.testing.channel import add_noise_snr, multipath_apply


def _frame(key, spec, nblk, order=16):
    idx = jax.random.randint(key, (nblk, spec.n), 0, order)
    pts = qam_constellation(order)[idx]
    return idx, scfde_tx(spec, pts)


def test_flat_channel_exact():
    spec = make_scfde_spec(128, 16)
    idx, tx = _frame(jax.random.PRNGKey(0), spec, 4)
    eq, h = scfde_rx(spec, tx, snr=1e6)
    np.testing.assert_allclose(np.asarray(h), 1.0, atol=1e-4)
    got = qam_slice(eq, 16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(idx))


def test_multipath_mmse_recovers():
    """A channel that closes the raw eye (direct slicing fails hard);
    SC-FDE MMSE equalization restores SER 0 at 25 dB."""
    spec = make_scfde_spec(256, 32)
    idx, tx = _frame(jax.random.PRNGKey(1), spec, 8)
    h = jnp.asarray([1.0, 0.0, 0.62j, 0.0, -0.35, 0.21j], jnp.complex64)
    rx = multipath_apply(h, tx)
    rx = add_noise_snr(jax.random.PRNGKey(2), rx, 25.0)
    # raw slicing on the unequalized (CP-stripped) payload fails
    l = spec.n + spec.cp
    raw = rx[l:].reshape(8, l)[:, spec.cp:]
    raw_ser = float(np.mean(np.asarray(qam_slice(raw, 16))
                            != np.asarray(idx)))
    assert raw_ser > 0.2, raw_ser
    eq, hest = scfde_rx(spec, rx, snr=10 ** 2.5)
    got = np.asarray(qam_slice(eq, 16))
    ser = float(np.mean(got != np.asarray(idx)))
    assert ser < 0.003, ser            # >100x below the raw eye (MMSE
                                       # residual at 25 dB 16-QAM, not 0)
    # channel estimate matches the true frequency response
    want = np.fft.fft(np.asarray(h), spec.n)
    np.testing.assert_allclose(np.asarray(hest), want, atol=0.2)


def test_papr_advantage_over_ofdm():
    """The point of SC-FDE: same one-tap equalization, ~2+ dB lower PAPR
    than OFDM carrying the same QAM load."""
    from srcdsp_tpu.chains.ofdm import make_ofdm_spec, ofdm_modulate

    key = jax.random.PRNGKey(3)
    spec = make_scfde_spec(256, 32)
    _, tx_sc = _frame(key, spec, 16)
    ospec = make_ofdm_spec(256, 32, 200, 16)
    idx = jax.random.randint(key, (16, 200), 0, 16)
    tx_of = ofdm_modulate(ospec, qam_constellation(16)[idx])

    def papr_db(x):
        p = np.abs(np.asarray(x)) ** 2
        return 10 * np.log10(np.max(p) / np.mean(p))

    assert papr_db(tx_sc) < papr_db(tx_of) - 2.0, \
        (papr_db(tx_sc), papr_db(tx_of))


def test_mmse_beats_zf_at_spectral_null():
    """A near-null channel: ZF (huge snr) amplifies noise at the null,
    MMSE keeps more symbols correct."""
    spec = make_scfde_spec(256, 32)
    idx, tx = _frame(jax.random.PRNGKey(4), spec, 8)
    h = jnp.asarray([0.71, 0.0, 0.0, 0.0, 0.70], jnp.complex64)  # deep ripple
    rx = add_noise_snr(jax.random.PRNGKey(5), multipath_apply(h, tx), 18.0)
    eq_m, _ = scfde_rx(spec, rx, snr=10 ** 1.8)
    eq_z, _ = scfde_rx(spec, rx, snr=1e9)
    e_m = np.mean(np.asarray(qam_slice(eq_m, 16)) != np.asarray(idx))
    e_z = np.mean(np.asarray(qam_slice(eq_z, 16)) != np.asarray(idx))
    assert e_m < e_z, (e_m, e_z)


def test_full_acquisition_with_framesync():
    """Unsynchronized capture: the Zadoff-Chu pilot (a CAZAC = ideal
    correlator preamble) is found by chains.framesync, and the frame
    equalizes from the detected start — the acquisition composition the
    module docstring prescribes."""
    from srcdsp_tpu.chains.framesync import (
        frame_sync_apply, frame_sync_init, make_frame_sync_params,
        peak_indices)

    spec = make_scfde_spec(256, 32)
    idx, tx = _frame(jax.random.PRNGKey(6), spec, 6)
    rng = np.random.default_rng(7)
    sig = np.concatenate([
        0.05 * (rng.standard_normal(777) + 1j * rng.standard_normal(777)),
        np.asarray(tx),
        0.05 * (rng.standard_normal(300) + 1j * rng.standard_normal(300)),
    ]).astype(np.complex64)
    sig = np.asarray(add_noise_snr(jax.random.PRNGKey(8),
                                   jnp.asarray(sig), 22.0))
    # correlate against the pilot block (without CP) to find its start
    p = make_frame_sync_params(spec.pilot, threshold=0.5)
    _, (score, mask, first) = frame_sync_apply(p, frame_sync_init(p),
                                               jnp.asarray(sig))
    hits = peak_indices([np.asarray(mask)], [np.asarray(first)])
    assert len(hits) >= 1
    pilot_start = hits[0] - (spec.pilot.shape[-1] - 1)
    frame_start = pilot_start - spec.cp          # back up over the CP
    assert abs(frame_start - 777) <= 1, frame_start
    eq, _ = scfde_rx(spec, jnp.asarray(sig[frame_start:]), snr=10 ** 2.2)
    got = np.asarray(qam_slice(eq[:6], 16))
    ser = float(np.mean(got != np.asarray(idx)))
    assert ser < 0.005, ser

"""MIMO detection (mimo.py): ZF/MMSE/ML over 2x2 channels."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.qam import qam_constellation
from srcdsp_tpu.demap import psk_points
from srcdsp_tpu.mimo import make_ml_lattice, ml_detect, mmse_detect, \
    zf_detect


def _scene(order=4, nt=2, nr=2, n=2048, snr_db=18.0, cond=1.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = (np.asarray(psk_points(order)) if order in (2, 4, 8)
           else np.asarray(qam_constellation(order)))
    idx = rng.integers(0, pts.size, (nt, n))
    s = pts[idx]
    h = (rng.standard_normal((nr, nt)) + 1j * rng.standard_normal((nr, nt))
         ) / np.sqrt(2)
    if cond != 1.0:                      # squeeze the smaller singular value
        u_, sv, vt = np.linalg.svd(h)
        sv[-1] /= cond
        h = (u_ * sv) @ vt
    y = h @ s
    sigma = np.sqrt(np.mean(np.abs(y) ** 2) / 10 ** (snr_db / 10) / 2)
    y = y + sigma * (rng.standard_normal(y.shape)
                     + 1j * rng.standard_normal(y.shape))
    return (pts, idx, jnp.asarray(h.astype(np.complex64)),
            jnp.asarray(y.astype(np.complex64)), 10 ** (snr_db / 10))


def _slice(pts, xhat):
    d = np.abs(np.asarray(xhat)[..., None] - pts)
    return np.argmin(d, axis=-1)


def test_clean_exact_all_detectors():
    pts, idx, h, y, snr = _scene(order=16, snr_db=80.0)
    np.testing.assert_array_equal(_slice(pts, zf_detect(h, y)), idx)
    np.testing.assert_array_equal(_slice(pts, mmse_detect(h, y, snr)), idx)
    cands, cidx = make_ml_lattice(pts, 2)
    np.testing.assert_array_equal(np.asarray(ml_detect(h, y, cands, cidx)),
                                  idx)


def test_ml_beats_mmse_beats_zf_on_bad_channel():
    """An ill-conditioned 2x2 channel at 14 dB: the detector ordering
    ML <= MMSE <= ZF in SER, with strict gaps."""
    pts, idx, h, y, snr = _scene(order=4, snr_db=14.0, cond=8.0, seed=1)
    ser_zf = float(np.mean(_slice(pts, zf_detect(h, y)) != idx))
    ser_mmse = float(np.mean(_slice(pts, mmse_detect(h, y, snr)) != idx))
    cands, cidx = make_ml_lattice(pts, 2)
    ser_ml = float(np.mean(np.asarray(ml_detect(h, y, cands, cidx)) != idx))
    assert ser_ml <= ser_mmse <= ser_zf, (ser_ml, ser_mmse, ser_zf)
    assert ser_ml < 0.5 * ser_zf, (ser_ml, ser_zf)
    assert ser_zf > 0.01                 # the channel is genuinely hard


def test_per_subcarrier_vmap():
    """MIMO-OFDM form: vmap ML over per-bin channels."""
    pts = np.asarray(psk_points(4))
    cands, cidx = make_ml_lattice(pts, 2)
    rng = np.random.default_rng(2)
    nbins = 16
    hs = (rng.standard_normal((nbins, 2, 2))
          + 1j * rng.standard_normal((nbins, 2, 2))).astype(np.complex64)
    idx = rng.integers(0, 4, (nbins, 2, 64))
    ys = np.einsum("brt,btn->brn", hs, pts[idx]).astype(np.complex64)
    f = jax.vmap(lambda h, y: ml_detect(h, y, cands, cidx))
    got = np.asarray(f(jnp.asarray(hs), jnp.asarray(ys)))
    np.testing.assert_array_equal(got, idx)

"""MIMO-OFDM composition: 2x2 spatial multiplexing over per-antenna
multipath, time-orthogonal pilots for the per-bin channel estimate,
vmapped exact-ML detection per subcarrier — mimo.py composing with
chains/ofdm.py the way a real 802.11n-style receiver does."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.ofdm import make_ofdm_spec, ofdm_fft, ofdm_modulate
from srcdsp_tpu.chains.qam import qam_constellation
from srcdsp_tpu.mimo import make_ml_lattice, ml_detect
from srcdsp_tpu.testing.channel import add_noise_snr, multipath_apply


def test_2x2_mimo_ofdm_link():
    spec = make_ofdm_spec(64, 16, 52, 16)
    rng = np.random.default_rng(0)
    nsym, nt, nr = 12, 2, 2
    pts = qam_constellation(16)

    # data grids per tx antenna + time-orthogonal pilot symbols
    idx = rng.integers(0, 16, (nt, nsym, spec.active.size))
    pilot = np.exp(1j * 2 * np.pi * rng.integers(0, 4, spec.active.size)
                   / 4).astype(np.complex64)
    tx = []
    for t in range(nt):
        sym = np.asarray(pts)[idx[t]]
        p1 = pilot if t == 0 else np.zeros_like(pilot)
        p2 = pilot if t == 1 else np.zeros_like(pilot)
        grid = jnp.asarray(np.concatenate([p1[None], p2[None], sym]))
        tx.append(np.asarray(ofdm_modulate(spec, grid)))

    # 2x2 multipath: each (rx, tx) pair its own short channel
    chans = [[np.asarray([1.0, 0.4 - 0.2j, 0.15j], np.complex64),
              np.asarray([0.6j, 0.3, 0.1], np.complex64)],
             [np.asarray([0.7, -0.25j, 0.1], np.complex64),
              np.asarray([0.9 - 0.3j, 0.2, -0.1j], np.complex64)]]
    rx = []
    for r in range(nr):
        y = sum(np.asarray(multipath_apply(jnp.asarray(chans[r][t]),
                                           jnp.asarray(tx[t])))
                for t in range(nt))
        y = np.asarray(add_noise_snr(jax.random.PRNGKey(r), jnp.asarray(y),
                                     25.0))
        rx.append(y)

    # per-antenna OFDM FFT (synchronized frame: starts at the first CP)
    f = [np.asarray(ofdm_fft(spec, jnp.asarray(r_))) for r_ in rx]
    f = np.stack(f)                                  # [Nr, 2+nsym, A]

    # LS channel estimate per bin from the orthogonal pilots:
    # symbol 0 excites tx0 only, symbol 1 excites tx1 only
    h = np.stack([f[:, 0, :] / pilot[None, :],
                  f[:, 1, :] / pilot[None, :]], axis=1)   # [Nr, Nt, A]
    h_bins = jnp.asarray(np.moveaxis(h, -1, 0).astype(np.complex64))

    # vmapped exact ML per subcarrier over all data symbols
    cands, cidx = make_ml_lattice(np.asarray(pts), nt)
    y_bins = jnp.asarray(np.moveaxis(f[:, 2:, :], -1, 0)
                         .astype(np.complex64))           # [A, Nr, S]
    det = jax.vmap(lambda hb, yb: ml_detect(hb, yb, cands, cidx))
    got = np.asarray(det(h_bins, y_bins))                 # [A, Nt, S]
    want = np.stack([idx[:, :, a] for a in range(spec.active.size)])
    ser = float(np.mean(got != want))
    assert ser < 0.002, ser

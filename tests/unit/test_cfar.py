"""CFAR detection (ops/cfar.py) and Zadoff-Chu sequences."""

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.ops.cfar import ca_cfar, cfar_alpha, go_cfar_split
from srcdsp_tpu.testing.signals import zadoff_chu


def _exp_noise(rng, shape, scale=1.0):
    """Square-law-detected complex Gaussian noise: exponential power."""
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    return scale * 0.5 * np.abs(z) ** 2


def test_ca_cfar_pfa_calibration():
    rng = np.random.default_rng(0)
    p = _exp_noise(rng, (64, 4096), scale=3.7)      # unknown noise level
    det, _ = ca_cfar(jnp.asarray(p, jnp.float32), guard=2, train=16,
                     pfa=1e-2)
    rate = float(np.mean(np.asarray(det)))
    assert 0.5e-2 < rate < 2.0e-2, rate


def test_ca_cfar_detects_target():
    rng = np.random.default_rng(1)
    p = _exp_noise(rng, 2048)
    p[700] += 50.0                                   # strong target
    det, thr = ca_cfar(jnp.asarray(p, jnp.float32), pfa=1e-4)
    det = np.asarray(det)
    assert det[700]
    assert np.asarray(thr).shape == p.shape
    assert det.sum() <= 3                            # ~no false alarms


def test_go_cfar_clutter_edge():
    """A 13 dB noise step: GO-CFAR stays quiet across the edge but still
    detects a target well inside the high-noise region."""
    rng = np.random.default_rng(2)
    p = np.concatenate([_exp_noise(rng, 1024), _exp_noise(rng, 1024, 20.0)])
    p[1500] += 500.0
    det, _ = go_cfar_split(jnp.asarray(p, jnp.float32), guard=2, train=16,
                           pfa=1e-3)
    det = np.asarray(det)
    assert det[1500]
    edge = det[1024 - 40:1024 + 40]
    assert edge.sum() == 0, np.flatnonzero(edge)


def test_alpha_monotone():
    assert cfar_alpha(32, 1e-4) > cfar_alpha(32, 1e-2)
    # more training cells -> smaller multiplier at fixed pfa
    assert cfar_alpha(64, 1e-3) < cfar_alpha(16, 1e-3)


def test_zadoff_chu_cazac_properties():
    for root, n in ((25, 139), (7, 64)):
        x = zadoff_chu(root, n)
        np.testing.assert_allclose(np.abs(x), 1.0, atol=1e-6)
        xf = np.fft.fft(x)
        r = np.fft.ifft(xf * np.conj(xf))            # cyclic autocorr
        assert np.abs(r[0]) > n - 1e-3
        assert np.max(np.abs(r[1:])) < 1e-3 * n


def test_zadoff_chu_framesync_preamble():
    from srcdsp_tpu.chains.framesync import (
        frame_sync_apply, frame_sync_init, make_frame_sync_params,
        peak_indices)
    rng = np.random.default_rng(3)
    pre = zadoff_chu(25, 139)
    x = (0.3 * (rng.standard_normal(4096) + 1j * rng.standard_normal(4096))
         ).astype(np.complex64)
    x[1000:1000 + 139] += pre
    p = make_frame_sync_params(jnp.asarray(pre), threshold=0.5)
    st, (score, mask, first) = frame_sync_apply(p, frame_sync_init(p),
                                                jnp.asarray(x))
    idx = peak_indices([np.asarray(mask)], [np.asarray(first)])
    assert len(idx) >= 1
    assert abs((idx[0] - (len(pre) - 1)) - 1000) <= 1


def test_chirp_pulse_compression():
    """LFM chirp + matched filter (framesync): the correlation peak
    compresses the pulse by ~the time-bandwidth product and CFAR detects
    it at a chip SNR where the raw envelope shows nothing."""
    from srcdsp_tpu.chains.framesync import (
        frame_sync_apply, frame_sync_init, make_frame_sync_params,
        peak_indices, peak_to_burst_start)
    from srcdsp_tpu.testing.signals import chirp

    n, bw = 1024, 0.4
    p = chirp(n, -bw / 2, bw / 2)
    rng = np.random.default_rng(0)
    cap = (1.5 * (rng.standard_normal(8192) + 1j * rng.standard_normal(8192))
           ).astype(np.complex64)                    # -6.5 dB per-sample SNR
    cap[3000:3000 + n] += p
    # raw envelope: the pulse is buried (under +1.2x the noise floor)
    env = np.abs(cap) ** 2
    assert (np.median(env[3000:3000 + n])
            < 2.0 * np.median(env[:2000]))
    # normalized matched-filter peak ~ sqrt(Es/(Es+En)) ~ 0.43 here
    fs = make_frame_sync_params(jnp.asarray(p), threshold=0.3)
    _, (score, mask, first) = frame_sync_apply(fs, frame_sync_init(fs),
                                               jnp.asarray(cap))
    hits = peak_indices([np.asarray(mask)], [np.asarray(first)])
    assert len(hits) >= 1
    start = peak_to_burst_start(hits[0], n)
    assert abs(start - 3000) <= 1, start
    # CFAR on the matched-filter power sees the compressed pulse
    sc = np.asarray(score) ** 2
    det, _ = ca_cfar(jnp.asarray(sc, jnp.float32), guard=4, train=32,
                     pfa=1e-5)
    det = np.asarray(det)
    assert det[hits[0]]

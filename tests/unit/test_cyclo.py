"""FAM spectral correlation (ops/cyclo.py): baud-line and carrier-line
cycle features on known signals, noise rejection, and the BPSK-vs-QPSK
conjugate-feature discriminator."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.cyclo import cycle_profile, detect_cycles, fam_scf


def _sig(order, nsym, sps, fc, key):
    from srcdsp_tpu.ops.resample import resample_full
    from srcdsp_tpu.ops.window import root_raised_cosine
    from srcdsp_tpu.testing.signals import tone

    data = np.asarray(jax.random.randint(key, (nsym,), 0, order))
    if order == 2:
        sym = (2.0 * data - 1.0).astype(np.complex64)
    else:
        sym = np.exp(2j * np.pi * (data + 0.5) / order).astype(np.complex64)
    taps = root_raised_cosine(sps, 8, beta=0.35)
    x = np.asarray(resample_full(jnp.asarray(taps),
                                 jnp.asarray(sym), up=sps, down=1))
    return (x * np.asarray(tone(len(x), fc))).astype(np.complex64)


def test_baud_cycle_feature_and_noise_rejection():
    sps = 8
    x = _sig(2, 4096, sps, 0.0, jax.random.PRNGKey(0))
    noise = (np.random.default_rng(0).standard_normal(len(x)) +
             1j * np.random.default_rng(1).standard_normal(len(x))
             ).astype(np.complex64) * np.sqrt(0.5)

    res = fam_scf(jnp.asarray(x + 0.3 * noise), np_=64, p=256)
    peaks = detect_cycles(res, thresh=0.35)
    assert peaks, "no cycle features found on a cyclostationary signal"
    baud = 1.0 / sps
    best = min(peaks, key=lambda t: abs(abs(t[0]) - baud))
    assert abs(abs(best[0]) - baud) < 2e-3, \
        f"baud line off: {best} vs {baud}"

    res_n = fam_scf(jnp.asarray(noise), np_=64, p=256)
    peaks_n = detect_cycles(res_n, thresh=0.35)
    assert not peaks_n, f"noise shows cycle features: {peaks_n[:3]}"


def test_conjugate_feature_discriminates_bpsk_from_qpsk():
    sps, fc = 8, 0.12
    b = _sig(2, 4096, sps, fc, jax.random.PRNGKey(1))
    q = _sig(4, 4096, sps, fc, jax.random.PRNGKey(2))

    rb = fam_scf(jnp.asarray(b), np_=64, p=256, conj=True)
    rq = fam_scf(jnp.asarray(q), np_=64, p=256, conj=True)
    pb = detect_cycles(rb, thresh=0.35)
    assert pb, "BPSK shows no conjugate feature"
    best = min(pb, key=lambda t: abs(t[0] - 2 * fc))
    assert abs(best[0] - 2 * fc) < 2e-3, f"2fc line off: {best}"

    # QPSK: no conjugate feature anywhere near that strength
    _, prof_q = cycle_profile(rq, normalize=False)
    _, prof_b = cycle_profile(rb, normalize=False)
    assert float(np.max(np.asarray(prof_b))) > \
        4.0 * float(np.max(np.asarray(prof_q))), \
        "conjugate SCF fails to separate BPSK from QPSK"


def test_alpha_zero_slice_is_the_psd():
    from srcdsp_tpu.testing.signals import tone
    x = np.asarray(tone(8192, 0.2)).astype(np.complex64)
    res = fam_scf(jnp.asarray(x), np_=64, p=128)
    # alpha = 0 diagonal (k1 == k2, q = P/2) is the averaged periodogram:
    # a tone at f = 0.2 peaks at the right channel
    s = np.abs(np.asarray(res.scf))
    p = s.shape[-1]
    diag = np.diagonal(s[:, :, p // 2])
    f = np.diagonal(np.asarray(res.freq))
    assert abs(f[int(diag.argmax())] - 0.2) < 1.0 / 64


def test_frames_validates_length():
    import pytest
    with pytest.raises(ValueError):
        fam_scf(jnp.zeros(100, jnp.complex64), np_=64, p=128)

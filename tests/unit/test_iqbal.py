"""IQ-imbalance estimation/correction: parameter recovery, image
rejection on a tone probe, and properness-based blind operation on
modulated signals."""

import numpy as np
import jax.numpy as jnp

from srcdsp_tpu.ops.iqbal import (image_rejection_db, iq_imbalance_apply,
                                  iqbal_correct, iqbal_estimate)


def test_parameter_recovery_exact():
    # noiseless proper signal: estimator must invert (gain, phase)
    rng = np.random.default_rng(0)
    n = 1 << 16
    s = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    for g, ph in ((1.05, 0.03), (0.9, -0.08), (1.0, 0.1)):
        x = iq_imbalance_apply(jnp.asarray(s), g, ph)
        bal = iqbal_estimate(x)
        assert abs(bal.gain - g) < 5e-3, (g, ph, bal)
        assert abs(bal.phase - ph) < 5e-3, (g, ph, bal)


def test_tone_image_rejection_improves():
    rng = np.random.default_rng(1)
    n = 1 << 16
    t = np.arange(n)
    tone = np.exp(2j * np.pi * 0.11 * t)
    s = (tone + 0.01 * (rng.standard_normal(n)
                        + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    x = iq_imbalance_apply(jnp.asarray(s), 1.06, 0.05)
    before = image_rejection_db(np.asarray(x), 0.11)
    assert before < 32.0                    # a typical raw front end
    # a single tone is NOT proper (its 2f conjugate line is full
    # power), so calibrate on a wideband proper block and apply to the
    # tone — the production pattern. Precision is 1/sqrt(N_cal): at
    # 2^18 the residual tap error leaves ~55+ dB rejection.
    nc = 1 << 18
    cal = (rng.standard_normal(nc) + 1j * rng.standard_normal(nc)
           ).astype(np.complex64)
    bal = iqbal_estimate(iq_imbalance_apply(jnp.asarray(cal), 1.06, 0.05))
    y = np.asarray(iqbal_correct(bal, x))
    after = image_rejection_db(y, 0.11)
    assert after > before + 22.0, (before, after)
    assert after > 50.0, after


def test_blind_on_wideband_traffic(rng):
    """Fully blind on the traffic itself: a band of independent SHAPED
    QAM carriers is proper in aggregate (each carrier's conjugate
    2fc line is zero-mean across symbols and carriers), so the block
    moment recovers the imbalance with no calibration signal. (A
    SINGLE rect-pulse PSK emitter is different: its symbol-squared
    sequence is a full-power line and swamps the moment — that case
    needs the calibration-block pattern above.)"""
    n = 1 << 17
    x = np.zeros(n, np.complex64)
    for fc in (0.05, -0.13, 0.21, -0.33):
        sym = (rng.standard_normal(n // 8)
               + 1j * rng.standard_normal(n // 8)) / np.sqrt(2)
        up = np.zeros(n, np.complex64)
        up[::8] = sym
        h = np.sinc(np.arange(-32, 33) / 8) * np.hamming(65)
        bb = np.convolve(up, h, "same")
        x += (bb * np.exp(2j * np.pi * fc * np.arange(n))
              ).astype(np.complex64)
    x += (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    xb = iq_imbalance_apply(jnp.asarray(x), 0.93, -0.06)
    bal = iqbal_estimate(xb)
    assert abs(bal.gain - 0.93) < 0.005 and abs(bal.phase + 0.06) < 0.005
    y = np.asarray(iqbal_correct(bal, xb))
    imp = abs(np.mean(y * y)) / np.mean(np.abs(y) ** 2)
    imp0 = abs(np.mean(np.asarray(xb) ** 2))         / np.mean(np.abs(np.asarray(xb)) ** 2)
    assert imp < 1e-6 and imp0 > 0.05


def test_clean_input_untouched(rng):
    s = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    bal = iqbal_estimate(jnp.asarray(s))
    assert abs(bal.gain - 1.0) < 0.02 and abs(bal.phase) < 0.02
    y = np.asarray(iqbal_correct(bal, jnp.asarray(s)))
    assert np.mean(np.abs(y - s) ** 2) < 1e-3 * np.mean(np.abs(s) ** 2)

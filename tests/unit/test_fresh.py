"""FRESH filtering: co-channel cyclostationary interference rejection
beyond the stationary (Wiener) bound, plus structural checks."""

import numpy as np
import jax.numpy as jnp

from srcdsp_tpu.ops.fresh import (FreshBranch, blind_bpsk_branches,
                                  bpsk_branches, fresh_apply,
                                  fresh_design, fresh_frames,
                                  merge_branches)
from srcdsp_tpu.ops.window import root_raised_cosine


def _bpsk(rng, nsym, sps, fc, beta=0.9):
    h = root_raised_cosine(sps, 8, beta)
    sym = 1.0 - 2.0 * rng.integers(0, 2, nsym).astype(np.float64)
    up = np.zeros(nsym * sps)
    up[::sps] = sym
    bb = np.convolve(up, h, mode="same")
    n = bb.size
    return (bb * np.exp(2j * np.pi * fc * np.arange(n))).astype(
        np.complex64)


def test_frames_shape_and_content(rng):
    x = (rng.standard_normal(64) + 1j * rng.standard_normal(64)
         ).astype(np.complex64)
    br = (FreshBranch(0.0, False), FreshBranch(0.25, True))
    phi = np.asarray(fresh_frames(jnp.asarray(x), br, taps=4))
    assert phi.shape == (61, 8)
    # branch 0, tap t, row n == x[n + t]
    np.testing.assert_allclose(phi[:, 2], x[2:63], atol=1e-6)
    # branch 1 row content: conj(x) rotated by 0.25 cycles/sample
    rot = np.conj(x) * np.exp(2j * np.pi * 0.25 * np.arange(64))
    np.testing.assert_allclose(phi[:, 4], rot[:61].astype(np.complex64),
                               atol=1e-4)


def test_fresh_beats_wiener_on_cochannel_bpsk(rng):
    """Exactly co-channel BPSK-on-BPSK (100% spectral overlap): the
    stationary filter plateaus ~2.6 dB output SINR; the FRESH bank over
    BOTH signals' cycle sets (a canceller needs the INTERFERER's
    conjugate cycles too — with only the target's, the per-frequency
    system is underdetermined) reaches > 9 dB, a > 6 dB gain. Design
    on the first half, evaluate on the second, with n0 keeping the
    shift rotators phase-continuous across the split."""
    sps_a, sps_b = 8, 5
    fc_a, fc_b = 0.02, 0.035
    n = 20480
    a = _bpsk(rng, n // sps_a + 8, sps_a, fc_a)[:n]
    b = _bpsk(rng, n // sps_b + 8, sps_b, fc_b)[:n]
    noise = (0.03 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
             ).astype(np.complex64)
    x = a + b + noise

    half = n // 2
    taps = 24
    br_fresh = merge_branches(bpsk_branches(fc_a, 1.0 / sps_a),
                              bpsk_branches(fc_b, 1.0 / sps_b))
    br_wiener = (FreshBranch(0.0, False),)

    def sinr(branches):
        f = fresh_design(jnp.asarray(x[:half]), jnp.asarray(a[:half]),
                         branches, taps=taps, n0=0)
        y = np.asarray(fresh_apply(f, jnp.asarray(x[half:]), n0=half))
        dref = a[half:][taps - 1 - f.delay: taps - 1 - f.delay + y.size]
        err = y - dref
        return 10 * np.log10(np.mean(np.abs(dref) ** 2)
                             / np.mean(np.abs(err) ** 2))

    s_fresh = sinr(br_fresh)
    s_wiener = sinr(br_wiener)
    assert s_fresh > s_wiener + 6.0, (s_fresh, s_wiener)
    assert s_fresh > 9.0, s_fresh


def test_fresh_block_phase_continuity(rng):
    """The n0 contract: applying the trained filter to the eval block
    with a WRONG n0 (rotators restarted at 0) must lose the conjugate-
    branch coherence — the measured failure mode that motivated the
    global-index API."""
    sps_a, sps_b = 8, 5
    fc_a, fc_b = 0.02, 0.035
    n = 8192
    a = _bpsk(rng, n // sps_a + 8, sps_a, fc_a)[:n]
    b = _bpsk(rng, n // sps_b + 8, sps_b, fc_b)[:n]
    x = (a + b + 0.03 * (rng.standard_normal(n)
                         + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    half = n // 2
    taps = 24
    br = merge_branches(bpsk_branches(fc_a, 1.0 / sps_a),
                        bpsk_branches(fc_b, 1.0 / sps_b))
    f = fresh_design(jnp.asarray(x[:half]), jnp.asarray(a[:half]),
                     br, taps=taps, n0=0)

    def sinr(n0):
        y = np.asarray(fresh_apply(f, jnp.asarray(x[half:]), n0=n0))
        dref = a[half:][taps - 1 - f.delay: taps - 1 - f.delay + y.size]
        return 10 * np.log10(np.mean(np.abs(dref) ** 2)
                             / np.mean(np.abs(y - dref) ** 2))

    assert sinr(half) > sinr(0) + 3.0, (sinr(half), sinr(0))


def test_fresh_reduces_to_wiener_without_cycles(rng):
    """On a stationary (noise-only) problem the extra branches must not
    help: both designs land within 1 dB — the FRESH gain in the test
    above is the cyclostationarity, not free parameters."""
    n = 4096
    h = np.asarray([1.0, 0.4, -0.2])
    d = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    x = np.convolve(d, h, mode="same").astype(np.complex64)
    x += (0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    half = n // 2
    taps = 9

    def mse(branches):
        f = fresh_design(jnp.asarray(x[:half]), jnp.asarray(d[:half]),
                         branches, taps=taps)
        y = np.asarray(fresh_apply(f, jnp.asarray(x[half:])))
        dref = d[half:][taps - 1 - f.delay: taps - 1 - f.delay + y.size]
        return float(np.mean(np.abs(y - dref) ** 2))

    m_w = mse((FreshBranch(0.0, False),))
    m_f = mse((FreshBranch(0.0, False), FreshBranch(0.21, False),
               FreshBranch(0.13, True)))
    assert abs(10 * np.log10(m_f / m_w)) < 1.0


def test_blind_fresh_from_cyclic_moment_lines(rng):
    """FULLY BLIND operation: carriers from FFT(x^2), bauds from
    FFT(|x|^2) (folded +-picks), refine_cycle on every line, structured
    branch composition — no genie knowledge of either signal. Must
    reach within 2 dB of (here: beat) the genie branch set and hold a
    large gain over Wiener."""
    sps_a, sps_b = 8, 5
    fc_a, fc_b = 0.02, 0.035
    n = 20480
    a = _bpsk(rng, n // sps_a + 8, sps_a, fc_a)[:n]
    b = _bpsk(rng, n // sps_b + 8, sps_b, fc_b)[:n]
    x = (a + b + 0.03 * (rng.standard_normal(n)
                         + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    half = n // 2
    taps = 24
    blind = blind_bpsk_branches(x[:half])
    # sanity on what the estimator recovered: both bauds, both carriers
    al = sorted(round(b_.alpha, 4) for b_ in blind if not b_.conj)
    assert -0.125 in al and 0.2 in al, al
    ca = [round(b_.alpha, 4) for b_ in blind if b_.conj]
    assert 0.04 in ca and 0.07 in ca, ca

    def sinr(branches):
        f = fresh_design(jnp.asarray(x[:half]), jnp.asarray(a[:half]),
                         branches, taps=taps, n0=0)
        y = np.asarray(fresh_apply(f, jnp.asarray(x[half:]), n0=half))
        dref = a[half:][taps - 1 - f.delay: taps - 1 - f.delay + y.size]
        return 10 * np.log10(np.mean(np.abs(dref) ** 2)
                             / np.mean(np.abs(y - dref) ** 2))

    genie = merge_branches(bpsk_branches(fc_a, 1.0 / sps_a),
                           bpsk_branches(fc_b, 1.0 / sps_b))
    s_blind, s_genie = sinr(blind), sinr(genie)
    s_wiener = sinr((FreshBranch(0.0, False),))
    assert s_blind > s_genie - 2.0, (s_blind, s_genie)
    assert s_blind > s_wiener + 8.0, (s_blind, s_wiener)


def test_fresh_planes_matches_complex_tier(rng):
    """Plane-form apply == the frames-matmul tier: equal output SINR
    (within 0.1 dB) and samplewise agreement on the co-channel fixture
    (u32-word vs float64 rotator phases differ at the 1e-5 level)."""
    import jax
    from srcdsp_tpu.ops.fresh_planes import make_fresh_planes

    sps_a, sps_b = 8, 5
    fc_a, fc_b = 0.02, 0.035
    n = 16384
    a = _bpsk(rng, n // sps_a + 8, sps_a, fc_a)[:n]
    b = _bpsk(rng, n // sps_b + 8, sps_b, fc_b)[:n]
    x = (a + b + 0.03 * (rng.standard_normal(n)
                         + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    half = n // 2
    taps = 24
    br = merge_branches(bpsk_branches(fc_a, 1.0 / sps_a),
                        bpsk_branches(fc_b, 1.0 / sps_b))
    f = fresh_design(jnp.asarray(x[:half]), jnp.asarray(a[:half]),
                     br, taps=taps, n0=0)
    y_ref = np.asarray(fresh_apply(f, jnp.asarray(x[half:]), n0=half))
    stride = 512
    raw = make_fresh_planes(f, stride=stride)
    fn = jax.jit(raw, static_argnums=2)
    hist = raw.hist                 # factory-exposed padded history
    nn = ((half - hist) // stride) * stride
    seg = x[half: half + nn + hist]
    yr, yi = fn(jnp.asarray(seg.real[None, :]),
                jnp.asarray(seg.imag[None, :]), half)
    y_pl = (np.asarray(yr) + 1j * np.asarray(yi))[0]
    y_ref = y_ref[: y_pl.size]
    scale = np.sqrt(np.mean(np.abs(y_ref) ** 2))
    np.testing.assert_allclose(y_pl, y_ref, atol=2e-3 * scale)

    dref = a[half:][taps - 1 - f.delay: taps - 1 - f.delay + y_pl.size]

    def sdb(y):
        return 10 * np.log10(np.mean(np.abs(dref) ** 2)
                             / np.mean(np.abs(y - dref) ** 2))

    assert abs(sdb(y_pl) - sdb(y_ref)) < 0.1
    assert sdb(y_pl) > 9.0


def test_fresh_planes_rejects_unpaddable_taps(rng):
    import pytest
    from srcdsp_tpu.ops.fresh_planes import make_fresh_planes

    n = 4096
    d = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    f = fresh_design(jnp.asarray(d), jnp.asarray(d),
                     (FreshBranch(0.0, False),), taps=160)
    with pytest.raises(ValueError):
        make_fresh_planes(f, stride=128)   # 159 can never divide 128

"""Feedforward block-parallel tracking (chains/feedforward.py): SER 0
on the same class of drifting-clock fixture the closed-loop tier is
gated on (sinusoidal timing warp + CFO + noise), with all estimation
running as parallel block ops."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.feedforward import ff_psk_demod_planes
from srcdsp_tpu.chains.psk import make_psk_params
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.resample import resample_full


def _warp_clock(x, amp, period):
    n = np.arange(len(x) - int(np.ceil(amp)) - 1, dtype=np.float64)
    t = n + amp * np.sin(2 * np.pi * n / period)
    i0 = np.floor(t).astype(np.int64)
    f = t - i0
    return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)


def test_ff_psk_tracks_warped_clock():
    order, sps, c = 4, 4, 3
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    rng = np.random.default_rng(7)
    nsym = 4096 + 64
    data = rng.integers(0, order, (c, nsym))
    sym = np.exp(2j * np.pi * (data + 0.5) / order)
    shaped = np.asarray(jax.vmap(
        lambda s: resample_full(params.taps, s, up=sps, down=1))(
            jnp.asarray(sym.astype(np.complex64))))
    x = np.stack([_warp_clock(shaped[ch], 1.5, 2048.0) for ch in range(c)])
    cfo = 1e-4
    x = x * np.exp(2j * np.pi * cfo * np.arange(x.shape[-1]))[None, :]
    x = (x + 0.02 * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)

    # matched filter, then the open-loop demod
    y = np.asarray(jax.vmap(
        lambda v: fir_full(params.taps, v, decim=1))(jnp.asarray(x)))
    k = (y.shape[-1] // 512) * 512
    idx, _, diag = jax.jit(
        lambda a, b: ff_psk_demod_planes(a, b, sps, order, block=128))(
        jnp.asarray(y.real[:, :k]), jnp.asarray(y.imag[:, :k]))
    idx = np.asarray(idx)

    # resolve the QPSK phase ambiguity + whole-symbol delay per channel
    nsym_out = idx.shape[-1]
    total_err, total_cnt = 0, 0
    for ch in range(c):
        best = None
        for lag in range(0, 24):
            m = min(nsym_out - lag, nsym) - 16
            if m < 100:
                continue
            for rot in range(order):
                err = int(((idx[ch, lag: lag + m] + rot) % order
                           != data[ch, :m]).sum())
                if best is None or err < best[0]:
                    best = (err, m)
        total_err += best[0]
        total_cnt += best[1]
    ser = total_err / total_cnt
    assert ser == 0.0, f"SER {ser:.4f} on the warped-clock fixture"
    # the estimator actually tracked: tau trajectory spans ~3 samples
    tau = np.asarray(diag["tau_blocks"])
    assert np.ptp(tau, axis=-1).min() > 2.0, \
        "tau trajectory did not follow the warp"


def test_ff_fsk_tracks_warped_clock():
    """Noncoherent twin: binary FSK discriminator planes with a warped
    clock -> BER 0 through the open-loop slicer."""
    from srcdsp_tpu.chains.feedforward import ff_fsk_demod_planes
    from srcdsp_tpu.ops.fir import fir_full
    from srcdsp_tpu.testing.signals import fsk_baseband

    c, sps, dev = 2, 8, 0.04
    rng = np.random.default_rng(9)
    nsym = 4096 + 32
    bits = rng.integers(0, 2, (c, nsym))
    bb = np.asarray(fsk_baseband(jnp.asarray(bits), sps, dev))
    x = np.stack([_warp_clock(bb[ch], 1.5, 2048.0) for ch in range(c)])
    x = (x + 0.03 * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    # discriminator on filtered planes (the chain's order of operations)
    taps = jnp.asarray(np.ones(4, np.float32) / 4.0)  # short smoothing
    y = np.asarray(jax.vmap(
        lambda v: fir_full(taps, v, decim=1))(jnp.asarray(x)))
    z = y[:, 1:] * np.conj(y[:, :-1])
    d = (np.angle(z) / (2 * np.pi)).astype(np.float32)
    k = (d.shape[-1] // 256) * 256
    got, soft, diag = jax.jit(
        lambda v: ff_fsk_demod_planes(v, sps, block=256))(
        jnp.asarray(d[:, :k]))
    got = np.asarray(got)
    nsym_out = got.shape[-1]
    total_err, total_cnt = 0, 0
    for ch in range(c):
        best = None
        for lag in range(0, 12):
            m = min(nsym_out - lag, nsym) - 8
            err = int((got[ch, lag: lag + m] != bits[ch, :m]).sum())
            if best is None or err < best[0]:
                best = (err, m)
        total_err += best[0]
        total_cnt += best[1]
    assert total_err / total_cnt == 0.0
    tau = np.asarray(diag["tau_blocks"])
    assert np.ptp(tau, axis=-1).min() > 2.0


def test_ff_psk_ragged_holds_ser_zero_on_sustained_ppm():
    """3000-ppm fast clock (the closed-loop ragged tier's gate fixture
    class): the bounded ff form's window overflows within the call, but
    the ragged form relabels symbols per block and emits the ACTUAL
    symbol count — compacted SER 0."""
    from srcdsp_tpu.chains.feedforward import ff_psk_demod_ragged
    from srcdsp_tpu.chains.tracking import compact_ragged

    order, sps, c = 4, 4, 2
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    rng = np.random.default_rng(11)
    nsym = 8192 + 64
    data = rng.integers(0, order, (c, nsym))
    sym = np.exp(2j * np.pi * (data + 0.5) / order)
    shaped = np.asarray(jax.vmap(
        lambda s: resample_full(params.taps, s, up=sps, down=1))(
            jnp.asarray(sym.astype(np.complex64))))

    rho = 3e-3
    def sustained(x):
        nmax = int((len(x) - 2) / (1 + rho))
        t = np.arange(nmax, dtype=np.float64) * (1 + rho)
        i0 = np.floor(t).astype(np.int64)
        f = t - i0
        return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)

    x = np.stack([sustained(shaped[ch]) for ch in range(c)])
    x = (x + 0.02 * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    y = np.asarray(jax.vmap(
        lambda v: fir_full(params.taps, v, decim=1))(jnp.asarray(x)))
    block = 128
    k = (y.shape[-1] // block) * block
    idx, _, valid, diag = jax.jit(
        lambda a, b: ff_psk_demod_ragged(a, b, sps, order, block=block))(
        jnp.asarray(y.real[:, :k]), jnp.asarray(y.imag[:, :k]))
    idx = np.asarray(idx)
    valid = np.asarray(valid)

    nominal = k // sps
    total_err, total_cnt = 0, 0
    for ch in range(c):
        got = compact_ragged(idx[ch], valid[ch])
        # the emitted count follows the ACTUAL (+0.3%) clock
        assert got.size > nominal + 10, (got.size, nominal)
        best = None
        for lag in range(0, 24):
            m = min(got.size - lag, nsym) - 16
            if m < 100:
                continue
            for rot in range(order):
                err = int(((got[lag: lag + m] + rot) % order
                           != data[ch, :m]).sum())
                if best is None or err < best[0]:
                    best = (err, m)
        total_err += best[0]
        total_cnt += best[1]
    ser = total_err / total_cnt
    assert ser == 0.0, f"SER {ser:.4f} on the sustained-ppm fixture"
    # the trajectory really is unbounded at this scale (~90 samples)
    tau = np.asarray(diag["tau_blocks"])
    assert np.ptp(tau, axis=-1).min() > 4 * sps


def test_ff_fsk_ragged_holds_ber_zero_on_sustained_ppm():
    """Noncoherent ragged twin: binary FSK discriminator planes with a
    sustained 3000-ppm clock -> BER 0 through the open-loop ragged
    slicer with the actual bit count emitted."""
    from srcdsp_tpu.chains.feedforward import ff_fsk_demod_ragged
    from srcdsp_tpu.chains.tracking import compact_ragged
    from srcdsp_tpu.testing.signals import fsk_baseband

    c, sps = 2, 8
    rng = np.random.default_rng(13)
    nsym = 8192 + 32
    bits = rng.integers(0, 2, (c, nsym))
    bb = np.asarray(fsk_baseband(jnp.asarray(bits), sps, 0.04))

    rho = 3e-3
    def sustained(x):
        nmax = int((len(x) - 2) / (1 + rho))
        t = np.arange(nmax, dtype=np.float64) * (1 + rho)
        i0 = np.floor(t).astype(np.int64)
        f = t - i0
        return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)

    x = np.stack([sustained(bb[ch]) for ch in range(c)])
    x = (x + 0.02 * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    taps = jnp.asarray(np.ones(4, np.float32) / 4.0)
    y = np.asarray(jax.vmap(
        lambda v: fir_full(taps, v, decim=1))(jnp.asarray(x)))
    z = y[:, 1:] * np.conj(y[:, :-1])
    d = (np.angle(z) / (2 * np.pi)).astype(np.float32)
    block = 256
    k = (d.shape[-1] // block) * block
    got, _, valid, diag = jax.jit(
        lambda v: ff_fsk_demod_ragged(v, sps, block=block))(
        jnp.asarray(d[:, :k]))
    got = np.asarray(got)
    valid = np.asarray(valid)

    nominal = k // sps
    total_err, total_cnt = 0, 0
    for ch in range(c):
        g = compact_ragged(got[ch], valid[ch])
        assert g.size > nominal + 10, (g.size, nominal)
        best = None
        for lag in range(0, 16):
            m = min(g.size - lag, nsym) - 8
            err = int((g[lag: lag + m] != bits[ch, :m]).sum())
            if best is None or err < best[0]:
                best = (err, m)
        total_err += best[0]
        total_cnt += best[1]
    assert total_err / total_cnt == 0.0
    tau = np.asarray(diag["tau_blocks"])
    assert np.ptp(tau, axis=-1).min() > 4 * sps

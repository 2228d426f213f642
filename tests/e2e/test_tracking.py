"""Tracking loops vs feedforward on a drifting symbol clock (SURVEY.md
§3.1c: the reference's per-sample feedback behavior, e2e).

Fixture: the symbol clock wanders sinusoidally by +-1 sample over a period
shorter than a feedforward block, i.e. bounded oscillator wander at the
100-ppm scale per symbol. The feedforward O&M estimator averages ONE tau
per block, so its picks slide off the eye and the SER collapses; the
Gardner/Costas scan loops (chains.tracking) follow the instantaneous
offset per symbol and hold SER 0.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.psk import (
    constellation_offset, diff_decode, diff_encode, make_psk_params,
    psk_apply, psk_init)
from srcdsp_tpu.chains.tracking import (
    fsk_track_apply, fsk_track_init, psk_track_apply, psk_track_init)
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.resample import resample_full


def _warp_clock(x: np.ndarray, amp: float, period: float) -> np.ndarray:
    """Resample x at t(n) = n + amp*sin(2*pi*n/period): bounded clock wander.

    amp=1, period=4096 is a peak rate of ~1.5e-3 samples/sample — the
    100-ppm-class drift scaled so a block-feedforward demod visibly fails
    within one test capture.
    """
    n = np.arange(len(x) - int(np.ceil(amp)) - 1, dtype=np.float64)
    t = n + amp * np.sin(2 * np.pi * n / period)
    i0 = np.floor(t).astype(np.int64)
    f = t - i0
    return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)


def _ser(b, d, settle=128):
    best = 1.0
    for lag in range(-160, 161):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(len(b) - bs, len(d) - rs)
        if n > 64:
            best = min(best, float(np.mean(b[bs:bs + n] != d[rs:rs + n])))
    return best


@pytest.fixture(scope="module")
def psk_drift_fixture():
    order, sps, nsym = 4, 4, 4096
    data = np.asarray(jax.random.randint(jax.random.PRNGKey(0), (nsym,),
                                         0, order))
    tx = np.asarray(diff_encode(jnp.asarray(data), order))
    off = constellation_offset(order)
    sym = np.exp(2j * np.pi * (tx + off) / order).astype(np.complex64)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    clean = np.asarray(resample_full(params.taps, jnp.asarray(sym),
                                     up=sps, down=1))
    drift = _warp_clock(clean, amp=1.5, period=2048.0)
    return params, data, drift


def test_feedforward_degrades_on_wandering_clock(psk_drift_fixture):
    params, data, drift = psk_drift_fixture
    block = 2048   # 512 symbols: the wander completes >1 period per block
    n = (len(drift) // block) * block
    st = psk_init(params)
    idxs = []
    for b in range(n // block):
        st, (idx, _) = psk_apply(params, st,
                                 jnp.asarray(drift[b * block:(b + 1) * block]))
        idxs.append(np.asarray(idx))
    d = np.asarray(diff_decode(jnp.asarray(np.concatenate(idxs)), 4))
    ser = _ser(data, d)
    assert ser > 0.02, f"feedforward unexpectedly survived wander: {ser}"


def test_tracking_holds_ser_zero_on_wandering_clock(psk_drift_fixture):
    params, data, drift = psk_drift_fixture
    block = 2048
    n = (len(drift) // block) * block
    st = psk_track_init(params)
    idxs = []
    for b in range(n // block):
        st, (idx, _) = psk_track_apply(
            params, st, jnp.asarray(drift[b * block:(b + 1) * block]))
        idxs.append(np.asarray(idx))
    d = np.asarray(diff_decode(jnp.asarray(np.concatenate(idxs)), 4))
    assert _ser(data, d) == 0.0


def test_fsk_tracking_on_wandering_clock():
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone

    decim, sps, dev, center = 2, 8, 0.05, 0.11
    nbits = 2048
    bits = np.asarray(random_bits(jax.random.PRNGKey(3), (nbits,)))
    bb = fsk_baseband(jnp.asarray(bits), decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    # wander at the post-decim rate: amp scales by decim at the input rate
    drift = _warp_clock(x, amp=2.0, period=8192.0)

    params = make_fsk_params(center, 64, 0.04, decim, sps, dev)
    block = decim * sps * 256
    n = (len(drift) // block) * block

    st = fsk_init(params)
    ff = []
    for b in range(n // block):
        st, (bb_, _) = fsk_apply(params, st,
                                 jnp.asarray(drift[b * block:(b + 1) * block]))
        ff.append(np.asarray(bb_))
    ser_ff = _ser(bits, np.concatenate(ff))

    st2 = fsk_track_init(params)
    tr = []
    for b in range(n // block):
        st2, (bb_, _) = fsk_track_apply(
            params, st2, jnp.asarray(drift[b * block:(b + 1) * block]))
        tr.append(np.asarray(bb_))
    ser_tr = _ser(bits, np.concatenate(tr))

    assert ser_tr == 0.0, f"tracking BER {ser_tr}"
    assert ser_tr <= ser_ff, (ser_tr, ser_ff)


def test_tracking_matches_feedforward_on_clean_clock(psk_drift_fixture):
    """Sanity: on a stationary clock both chains demodulate cleanly."""
    params, data, _ = psk_drift_fixture
    order, sps = 4, 4
    tx = np.asarray(diff_encode(jnp.asarray(data), order))
    off = constellation_offset(order)
    sym = np.exp(2j * np.pi * (tx + off) / order).astype(np.complex64)
    clean = np.asarray(resample_full(params.taps, jnp.asarray(sym),
                                     up=sps, down=1))
    block = 2048
    n = (len(clean) // block) * block
    st = psk_track_init(params)
    idxs = []
    for b in range(n // block):
        st, (idx, _) = psk_track_apply(
            params, st, jnp.asarray(clean[b * block:(b + 1) * block]))
        idxs.append(np.asarray(idx))
    d = np.asarray(diff_decode(jnp.asarray(np.concatenate(idxs)), order))
    assert _ser(data, d) == 0.0


def test_tracking_multichannel_vmap_semantics(psk_drift_fixture):
    """Tracking chains carry leading channel axes like every other chain:
    a 3-channel batch demodulates each channel identically to running it
    alone."""
    params, data, drift = psk_drift_fixture
    block = 2048
    n = 4 * block
    chans = np.stack([drift[:n], drift[7:n + 7], drift[13:n + 13]])

    st = psk_track_init(params, channel_shape=(3,))
    idxs = []
    for b in range(n // block):
        st, (idx, _) = psk_track_apply(
            params, st, jnp.asarray(chans[:, b * block:(b + 1) * block]))
        idxs.append(np.asarray(idx))
    batched = np.concatenate(idxs, axis=-1)

    for c in range(3):
        st1 = psk_track_init(params)
        one = []
        for b in range(n // block):
            st1, (idx, _) = psk_track_apply(
                params, st1, jnp.asarray(chans[c, b * block:(b + 1) * block]))
            one.append(np.asarray(idx))
        np.testing.assert_array_equal(batched[c], np.concatenate(one))


def test_tracking_block_split_invariance(psk_drift_fixture):
    """The carried (tail, gardner, costas) state makes tracking outputs
    IDENTICAL for any block split — the §4 streaming property extended to
    the closed-loop chains."""
    params, _, drift = psk_drift_fixture
    n = 8192
    outs = []
    for block in (2048, 4096):
        st = psk_track_init(params)
        idxs = []
        for b in range(n // block):
            st, (idx, _) = psk_track_apply(
                params, st, jnp.asarray(drift[b * block:(b + 1) * block]))
            idxs.append(np.asarray(idx))
        outs.append(np.concatenate(idxs, axis=-1))
    np.testing.assert_array_equal(outs[0], outs[1])


def _sustained_offset(x: np.ndarray, rho: float) -> np.ndarray:
    """Resample x at t(n) = n*(1+rho): a sustained clock-rate offset of
    rho (3e-3 = 3000 ppm) that accumulates whole-symbol slips — beyond
    what any bounded-tau tracker can absorb."""
    nmax = int((len(x) - 2) / (1 + rho))
    n = np.arange(nmax, dtype=np.float64)
    t = n * (1 + rho)
    i0 = np.floor(t).astype(np.int64)
    f = t - i0
    return ((1 - f) * x[i0] + f * x[i0 + 1]).astype(np.complex64)


@pytest.fixture(scope="module")
def psk_ppm_fixture():
    order, sps, nsym = 4, 4, 8192
    data = np.asarray(jax.random.randint(jax.random.PRNGKey(7), (nsym,),
                                         0, order))
    tx = np.asarray(diff_encode(jnp.asarray(data), order))
    off = constellation_offset(order)
    sym = np.exp(2j * np.pi * (tx + off) / order).astype(np.complex64)
    params = make_psk_params(0.0, decim=1, sps=sps, order=order)
    clean = np.asarray(resample_full(params.taps, jnp.asarray(sym),
                                     up=sps, down=1))
    rx = _sustained_offset(clean, rho=3e-3)
    return params, data, rx


def test_fixed_count_tracker_shears_on_sustained_ppm(psk_ppm_fixture):
    """3000 ppm fast clock => ~24 extra symbols over the capture; the
    fixed-count tracker emits exactly N/sps per block, so the stream
    shears against tx and the SER collapses."""
    params, data, rx = psk_ppm_fixture
    block = 2048
    n = (len(rx) // block) * block
    st = psk_track_init(params)
    idxs = []
    for b in range(n // block):
        st, (idx, _) = psk_track_apply(
            params, st, jnp.asarray(rx[b * block:(b + 1) * block]))
        idxs.append(np.asarray(idx))
    d = np.asarray(diff_decode(jnp.asarray(np.concatenate(idxs)), 4))
    assert _ser(data, d) > 0.02


def test_ragged_tracker_holds_ser_zero_on_sustained_ppm(psk_ppm_fixture):
    from srcdsp_tpu.chains.tracking import (
        compact_ragged, psk_track_ragged_apply, psk_track_ragged_init)
    params, data, rx = psk_ppm_fixture
    block = 2048
    n = (len(rx) // block) * block
    st = psk_track_ragged_init(params)
    idxs, valids = [], []
    for b in range(n // block):
        st, (idx, _, valid) = psk_track_ragged_apply(
            params, st, jnp.asarray(rx[b * block:(b + 1) * block]))
        idxs.append(np.asarray(idx))
        valids.append(np.asarray(valid))
    idx_all = compact_ragged(np.concatenate(idxs), np.concatenate(valids))
    # skip/stuff: the emitted count follows the ACTUAL clock (+0.3%)
    nominal = n // params.sps
    assert idx_all.size > nominal + 10, (idx_all.size, nominal)
    d = np.asarray(diff_decode(jnp.asarray(idx_all), 4))
    assert _ser(data, d) == 0.0


def test_ragged_block_split_invariance(psk_ppm_fixture):
    """The free-running strobe SCHEDULE is independent of how the stream
    is blocked: both splits emit the same number of strobes and slice the
    same symbols. Values match to float tolerance, not bit-exactly — the
    seam rebase (pos - N) changes the rounding of subsequent position
    accumulation (the gardner_free_scan analog of fir_apply's
    varying-split caveat)."""
    from srcdsp_tpu.chains.tracking import (
        compact_ragged, psk_track_ragged_apply, psk_track_ragged_init)
    params, _, rx = psk_ppm_fixture
    n = 8192
    outs, soft_outs = {}, {}
    for block in (1024, 2048):
        st = psk_track_ragged_init(params)
        idxs, softs, valids = [], [], []
        for b in range(n // block):
            st, (idx, soft, valid) = psk_track_ragged_apply(
                params, st, jnp.asarray(rx[b * block:(b + 1) * block]))
            idxs.append(np.asarray(idx))
            softs.append(np.asarray(soft))
            valids.append(np.asarray(valid))
        v = np.concatenate(valids)
        outs[block] = compact_ragged(np.concatenate(idxs), v)
        soft_outs[block] = compact_ragged(np.concatenate(softs), v)
    assert outs[1024].shape == outs[2048].shape
    assert np.array_equal(outs[1024], outs[2048])
    assert np.allclose(soft_outs[1024], soft_outs[2048],
                       rtol=1e-3, atol=1e-3)


def test_fsk_ragged_on_sustained_ppm():
    from srcdsp_tpu.chains.fsk import make_fsk_params
    from srcdsp_tpu.chains.tracking import (
        compact_ragged, fsk_track_ragged_apply, fsk_track_ragged_init)
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone

    decim, sps, dev, center = 2, 8, 0.05, 0.11
    nbits = 4096
    bits = np.asarray(random_bits(jax.random.PRNGKey(9), (nbits,)))
    bb = fsk_baseband(jnp.asarray(bits), decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    rx = _sustained_offset(x, rho=2e-3)

    params = make_fsk_params(center, 64, 0.04, decim, sps, dev)
    block = decim * 2048
    n = (len(rx) // block) * block
    st = fsk_track_ragged_init(params)
    bs, vs = [], []
    for b in range(n // block):
        st, (bit, _, valid) = fsk_track_ragged_apply(
            params, st, jnp.asarray(rx[b * block:(b + 1) * block]))
        bs.append(np.asarray(bit))
        vs.append(np.asarray(valid))
    got = compact_ragged(np.concatenate(bs), np.concatenate(vs))
    assert _ser(bits, got) == 0.0

"""Square-QAM demod chain tests (beyond-parity X6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.qam import (
    make_qam_params, qam_apply, qam_constellation, qam_demod_stream,
    qam_init, qam_modulate, qam_slice, quad_diff_decode, quad_diff_encode,
    rotation_map)
from srcdsp_tpu.ops.resample import resample_full
from srcdsp_tpu.testing.signals import complex_awgn, tone


@pytest.mark.parametrize("order", [4, 16, 64, 256])
def test_constellation_properties(order):
    pts = np.asarray(qam_constellation(order))
    assert pts.shape == (order,)
    # unit average power
    np.testing.assert_allclose(np.mean(np.abs(pts) ** 2), 1.0, rtol=1e-6)
    # all points distinct
    assert len({(round(float(p.real), 6), round(float(p.imag), 6))
                for p in pts}) == order
    # Gray property: nearest lattice neighbors differ in exactly one bit
    l = int(np.sqrt(order))
    step = 2 * np.sqrt(3.0 / (2.0 * (order - 1)))
    for i in range(order):
        for j in range(order):
            if abs(abs(pts[i] - pts[j]) - step) < 1e-6:
                assert bin(i ^ j).count("1") == 1


@pytest.mark.parametrize("order", [16, 64])
def test_slice_matches_nearest_point(order):
    pts = np.asarray(qam_constellation(order))
    rng = np.random.default_rng(0)
    y = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(
        np.complex64)
    got = np.asarray(qam_slice(jnp.asarray(y), order))
    ref = np.argmin(np.abs(y[:, None] - pts[None, :]), axis=1)
    np.testing.assert_array_equal(got, ref)


def test_rotation_map_is_exact_permutation():
    for order in (16, 64):
        pts = np.asarray(qam_constellation(order))
        rm = np.asarray(rotation_map(order))
        assert sorted(rm) == list(range(order))
        np.testing.assert_allclose(pts[rm], pts * 1j, atol=1e-6)


def test_quad_diff_roundtrip_and_slip_invariance():
    order = 16
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.integers(0, order, 300), jnp.int32)
    tx = quad_diff_encode(data, order)
    rx = quad_diff_decode(tx, order)
    np.testing.assert_array_equal(np.asarray(rx)[1:], np.asarray(data)[1:])
    # a constant pi/2 slip (rotation-map permutation) decodes identically
    rm = rotation_map(order)
    slipped = rm[rm[tx]]  # two slips
    rx2 = quad_diff_decode(slipped, order)
    np.testing.assert_array_equal(np.asarray(rx2)[1:], np.asarray(data)[1:])


def _tx_qam(key, nsym, order, decim, sps, center, snr_db=None, phase=0.1,
            channel_shape=()):
    in_sps = decim * sps
    kd, kn = jax.random.split(jax.random.PRNGKey(key))
    idx, sym = qam_modulate(kd, nsym, order, channel_shape)
    params = make_qam_params(center, decim=decim, sps=sps, order=order)
    x = resample_full(params.taps, sym.astype(jnp.complex64), up=in_sps, down=1)
    x = x * tone(x.shape[-1], center, phase0=phase)
    if snr_db is not None:
        p = float(jnp.mean(jnp.abs(x) ** 2))
        x = x + complex_awgn(kn, x.shape, power=p * 10 ** (-snr_db / 10))
    return idx, params, x


def _ser(data_idx, rx_idx, settle=32):
    """Symbol error rate, best over small alignment lags."""
    d = np.asarray(rx_idx)
    b = np.asarray(data_idx)
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(b.shape[-1] - bs, d.shape[-1] - rs)
        if n <= 0:
            continue
        best = min(best, float(np.mean(b[..., bs:bs + n] != d[..., rs:rs + n])))
    return best


@pytest.mark.parametrize("order", [16, 64])
def test_qam_clean_ser_zero(order):
    data, params, x = _tx_qam(2, 1024, order, decim=2, sps=4, center=0.13)
    state = qam_init(params)
    state, (rx, soft) = jax.jit(qam_apply)(params, state, x)
    assert _ser(data, rx) == 0.0


def test_qam16_noisy():
    data, params, x = _tx_qam(3, 2048, 16, decim=2, sps=4, center=0.13,
                              snr_db=25.0)
    _, (rx, _) = jax.jit(qam_apply)(params, qam_init(params), x)
    assert _ser(data, rx) < 0.01


def test_qam_streaming_matches_oneshot():
    data, params, x = _tx_qam(4, 1024, 16, decim=2, sps=4, center=0.13)
    _, (one, _) = qam_apply(params, qam_init(params), x)
    # carrier/timing accumulators differ per block, so compare SER not bits
    idx_s, _ = qam_demod_stream(params, x, block=x.shape[-1] // 4)
    assert _ser(data, one) == 0.0
    assert _ser(data, idx_s) == 0.0


def test_qam_multichannel_vmap():
    data, params, x = _tx_qam(5, 512, 16, decim=2, sps=4, center=0.13,
                              channel_shape=(3,))
    state = qam_init(params, (3,))
    _, (rx, _) = jax.jit(qam_apply)(params, state, x)
    assert rx.shape[0] == 3
    for c in range(3):
        assert _ser(data[c], rx[c]) == 0.0

"""Transmit chains (chains/tx.py): mappers, streaming bit-exactness,
fixture agreement, and tx -> rx roundtrips through the demod chains."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.psk import (
    diff_decode, diff_encode, make_psk_params, psk_apply, psk_init,
)
from srcdsp_tpu.chains.qam import (
    make_qam_params, qam_apply, qam_constellation, qam_init,
    quad_diff_decode, quad_diff_encode,
)
from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
from srcdsp_tpu.chains.tx import (
    bits_to_indices, cpm_tx_apply, cpm_tx_init, linear_tx_apply,
    linear_tx_init, make_cpfsk_tx, make_gmsk_tx, make_linear_tx,
    psk_map, qam_map,
)
from srcdsp_tpu.metrics import align_sequences
from srcdsp_tpu.testing.signals import fsk_baseband, gmsk_baseband


def test_bits_to_indices_and_maps():
    bits = jnp.asarray([1, 0, 1, 1, 0, 0, 0, 1])
    np.testing.assert_array_equal(bits_to_indices(bits, 2), [2, 3, 0, 1])
    np.testing.assert_array_equal(bits_to_indices(bits, 4), [11, 1])
    idx = jnp.arange(4)
    np.testing.assert_allclose(
        np.asarray(psk_map(idx, 4)),
        np.exp(2j * np.pi * (np.arange(4) + 0.5) / 4).astype(np.complex64),
        atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(qam_map(jnp.arange(16), 16)),
        np.asarray(qam_constellation(16)))


def test_linear_tx_streaming_bitexact():
    rng = np.random.default_rng(0)
    sym = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
           ).astype(np.complex64)
    p = make_linear_tx(0.13, np.hamming(33).astype(np.float32), sps=4)
    st = linear_tx_init(p)
    _, one = linear_tx_apply(p, st, jnp.asarray(sym))
    st = linear_tx_init(p)
    outs = []
    for blk in np.split(sym, [32, 96, 160]):
        st, y = linear_tx_apply(p, st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_cpm_tx_streaming_bitexact():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 256)
    p = make_gmsk_tx(0.2, sps=8, bt=0.3)
    st = cpm_tx_init(p)
    _, one = cpm_tx_apply(p, st, jnp.asarray(bits))
    st = cpm_tx_init(p)
    outs = []
    for blk in np.split(bits, [16, 64, 144]):
        st, y = cpm_tx_apply(p, st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_cpfsk_tx_matches_fixture():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 128)
    p = make_cpfsk_tx(0.0, sps=8, dev=0.03)
    _, got = cpm_tx_apply(p, cpm_tx_init(p), jnp.asarray(bits))
    want = np.asarray(fsk_baseband(jnp.asarray(bits), 8, 0.03))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_gmsk_tx_matches_fixture():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 128)
    p = make_gmsk_tx(0.0, sps=8, bt=0.3)
    _, got = cpm_tx_apply(p, cpm_tx_init(p), jnp.asarray(bits))
    want = gmsk_baseband(bits, 8, bt=0.3)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_psk_roundtrip_through_rx_chain():
    """Device tx -> psk demod chain: SER 0 after differential decode."""
    order, decim, sps, center = 4, 2, 4, 0.17
    rng = np.random.default_rng(4)
    data = jnp.asarray(rng.integers(0, 2 * 2, 512))
    tx_idx = diff_encode(data, order)
    rxp = make_psk_params(center, decim=decim, sps=sps, order=order)
    txp = make_linear_tx(center, rxp.taps, sps=decim * sps)
    _, x = linear_tx_apply(txp, linear_tx_init(txp), psk_map(tx_idx, order))
    _, (rx, _) = jax.jit(psk_apply)(rxp, psk_init(rxp), x)
    d = np.asarray(diff_decode(rx, order))
    b = np.asarray(data)
    best = min(float(np.mean(b[20:20 + 400] != d[20 + lag:20 + lag + 400]))
               for lag in range(0, 17))
    assert best == 0.0


def test_qam_roundtrip_through_rx_chain():
    order, decim, sps, center = 16, 2, 4, 0.11
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.integers(0, order, 512))
    tx_idx = quad_diff_encode(data, order)
    rxp = make_qam_params(center, decim=decim, sps=sps, order=order)
    txp = make_linear_tx(center, rxp.taps, sps=decim * sps)
    _, x = linear_tx_apply(txp, linear_tx_init(txp), qam_map(tx_idx, order))
    _, (rx, _) = jax.jit(qam_apply)(rxp, qam_init(rxp), x)
    d = np.asarray(quad_diff_decode(rx, order))
    b = np.asarray(data)
    best = min(float(np.mean(b[20:20 + 400] != d[20 + lag:20 + lag + 400]))
               for lag in range(0, 17))
    assert best == 0.0


def test_gmsk_tx_roundtrip_through_fsk_chain():
    decim, sps, center = 4, 8, 0.09
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, 512)
    txp = make_gmsk_tx(center, sps=decim * sps, bt=0.3)
    _, x = cpm_tx_apply(txp, cpm_tx_init(txp), jnp.asarray(bits))
    rxp = make_fsk_params(center, 64, 0.1, decim, sps, dev=0.25 / sps,
                          timing_forget=0.95)
    _, (got, _) = jax.jit(fsk_apply)(rxp, fsk_init(rxp), x)
    _, a, b = align_sequences(bits, np.asarray(got), max_lag=24)
    assert a.size > 450
    assert float(np.mean(a[8:] != b[8:])) == 0.0


def test_cpm_tx_matches_cpp_oracle():
    """The C++ per-sample loop over the SAME int32 words: phase-word
    stream bit-identical (exact modular arithmetic in both languages),
    waveform within float rounding."""
    from srcdsp_tpu import oracle
    from srcdsp_tpu.chains.tx import make_gmsk_tx
    from srcdsp_tpu.ops.nco import TWO_PI

    rng = np.random.default_rng(10)
    bits = rng.integers(0, 2, 256)
    sps = 8
    p = make_gmsk_tx(0.0, sps=sps, bt=0.3)
    _, got = cpm_tx_apply(p, cpm_tx_init(p), jnp.asarray(bits))
    want, ph_cpp = oracle.cpm_tx(bits, np.asarray(p.words), sps)
    # recompute the jax phase words the same way cpm_tx_apply does and
    # compare BIT-EXACTLY against the C++ stream
    nrz = (2 * bits.astype(np.int64) - 1)
    nspan = p.words.shape[0]
    ext = np.concatenate([np.zeros(nspan - 1, np.int64), nrz])
    w = sum(ext[nspan - 1 - j: nspan - 1 - j + bits.size, None]
            * np.asarray(p.words, np.int64)[j] for j in range(nspan))
    w32 = w.reshape(-1).astype(np.int64)
    csum = np.cumsum(w32)
    ph_jax = ((csum - w32) % (1 << 32)).astype(np.uint32).astype(np.int32)
    np.testing.assert_array_equal(ph_jax, ph_cpp)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)

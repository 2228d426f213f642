"""Soft demappers (demap.py): sign consistency, exact BPSK/QPSK forms,
Gray QAM per-axis independence, and coded-gain integration with LDPC."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.tx import bits_to_indices, psk_map, qam_map
from srcdsp_tpu.demap import maxlog_llr, psk_llr, psk_points, qam_llr


def test_bpsk_llr_exact():
    """BPSK points (+1, -1): max-log LLR reduces to 4*Re(y)/sigma2."""
    y = jnp.asarray(np.array([0.7 - 0.2j, -1.3 + 0.5j], np.complex64))
    llr = psk_llr(y, 2, sigma2=0.5)
    want = 4.0 * np.real(np.asarray(y)) / 0.5
    np.testing.assert_allclose(np.asarray(llr)[..., 0], want, rtol=1e-5)


def test_hard_decisions_match_nearest_point():
    rng = np.random.default_rng(0)
    for order, pts in ((8, psk_points(8)), (16, None)):
        y = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
             ).astype(np.complex64)
        if pts is None:
            from srcdsp_tpu.chains.qam import qam_constellation
            pts = qam_constellation(order)
            llr = qam_llr(jnp.asarray(y), order, 1.0)
        else:
            llr = psk_llr(jnp.asarray(y), order, 1.0)
        hard = (np.asarray(llr) < 0).astype(int)       # bit=1 when llr<0
        nbits = order.bit_length() - 1
        idx_hard = hard @ (2 ** np.arange(nbits - 1, -1, -1))
        nearest = np.argmin(np.abs(y[:, None] - np.asarray(pts)[None, :]),
                            axis=1)
        np.testing.assert_array_equal(idx_hard, nearest)


def test_roundtrip_with_tx_mappers():
    """tx map -> demap at high SNR: recovered bits equal the sent bits."""
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 4 * 256)
    idx = bits_to_indices(jnp.asarray(bits), 4)
    y = qam_map(idx, 16) + 0.02 * jnp.asarray(
        rng.standard_normal(256) + 1j * rng.standard_normal(256))
    llr = qam_llr(y, 16, sigma2=0.02 ** 2 * 2)
    got = (np.asarray(llr).reshape(-1) < 0).astype(int)
    np.testing.assert_array_equal(got, bits)


def test_gray_qam_llr_axis_separability():
    """For Gray square QAM, I-axis bits' LLRs depend only on Re(y)."""
    y1 = jnp.asarray(np.array([0.3 + 0.9j], np.complex64))
    y2 = jnp.asarray(np.array([0.3 - 0.1j], np.complex64))
    l1 = np.asarray(qam_llr(y1, 16, 1.0))[0]
    l2 = np.asarray(qam_llr(y2, 16, 1.0))[0]
    np.testing.assert_allclose(l1[:2], l2[:2], rtol=1e-4)   # MSBs = I axis


def test_soft_beats_hard_with_ldpc():
    """The point of soft demapping: LDPC from true LLRs decodes a block
    that hard-decision (+-const) LLRs cannot, at the same channel draw."""
    from srcdsp_tpu.ldpc import ldpc_decode, ldpc_encode, make_ldpc_code, \
        make_regular_ldpc
    rng = np.random.default_rng(4)
    code = make_ldpc_code(make_regular_ldpc(504, 3, 6, seed=1))
    u = rng.integers(0, 2, (1, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u)))[0]
    idx = bits_to_indices(jnp.asarray(cw), 2)           # QPSK, 2 bits/sym
    s = psk_map(idx, 4)
    sigma = 0.65                                        # ~3.7 dB Es/N0
    n = (rng.standard_normal(s.shape[-1])
         + 1j * rng.standard_normal(s.shape[-1])) * sigma / np.sqrt(2)
    y = jnp.asarray(np.asarray(s) + n.astype(np.complex64))
    soft = psk_llr(y, 4, sigma2=sigma ** 2).reshape(1, -1)
    bits_s, info_s, ok_s = ldpc_decode(code, soft, iters=50)
    assert bool(ok_s[0])
    np.testing.assert_array_equal(np.asarray(info_s)[0], u[0])
    hard_bits = (np.asarray(soft)[0] < 0).astype(np.float32)
    assert int((hard_bits != cw).sum()) > 5             # channel had errors
    hard = jnp.asarray(4.0 * (1.0 - 2.0 * hard_bits)).reshape(1, -1)
    _, info_h, ok_h = ldpc_decode(code, hard, iters=50)
    soft_better = (not bool(ok_h[0])) or \
        int((np.asarray(info_h)[0] != u[0]).sum()) > 0
    assert soft_better


def test_apsk_constellation_and_demap():
    """DVB-S2 16/32APSK: ring structure, unit power, and max-log demap
    roundtrip at high SNR through the generic constellation machinery."""
    from srcdsp_tpu.demap import apsk_constellation

    rng = np.random.default_rng(6)
    for order, rings in ((16, (4, 12)), (32, (4, 12, 16))):
        pts = np.asarray(apsk_constellation(order))
        np.testing.assert_allclose(np.mean(np.abs(pts) ** 2), 1.0,
                                   atol=1e-6)
        radii = np.sort(np.unique(np.round(np.abs(pts), 5)))
        assert radii.size == len(rings)
        for r, c in zip(radii, rings):
            assert np.sum(np.isclose(np.abs(pts), r, atol=1e-5)) == c
        # demap roundtrip
        idx = rng.integers(0, order, 512)
        y = pts[idx] + 0.02 * (rng.standard_normal(512)
                               + 1j * rng.standard_normal(512))
        llr = maxlog_llr(jnp.asarray(y.astype(np.complex64)),
                         jnp.asarray(pts), sigma2=8e-4)
        nbits = order.bit_length() - 1
        hard = (np.asarray(llr) < 0).astype(int)
        got = hard @ (2 ** np.arange(nbits - 1, -1, -1))
        np.testing.assert_array_equal(got, idx)

"""Coded-OFDM modem (chains/ofdm_modem.py): framework TX (QC LDPC ->
bit-plane BICM -> OFDM grid) -> multipath + AWGN -> plane front end ->
demap -> layered decode, decoded codewords IDENTICAL to tx."""

import numpy as np

import jax
import jax.numpy as jnp


def test_ofdm_coded_modem_roundtrip():
    from srcdsp_tpu.chains.modem import map_codewords_to_symbols
    from srcdsp_tpu.chains.ofdm import (make_ofdm_spec, ofdm_modulate,
                                        sym_len)
    from srcdsp_tpu.chains.ofdm_modem import make_ofdm_coded_modem
    from srcdsp_tpu.chains.qam import qam_constellation
    from srcdsp_tpu.kernels.ldpc_pallas import plan_qc
    from srcdsp_tpu.qcldpc import (make_dual_diagonal_base, make_qc_ldpc,
                                   qc_encode_dual_diagonal)

    c, nw, order = 2, 4, 16
    z, mb, nb = 16, 4, 12
    base = make_dual_diagonal_base(mb, nb, z, seed=0)
    code = make_qc_ldpc(base, z)
    plan = plan_qc(base, z)
    n, k = nb * z, (nb - mb) * z
    spc = n // 4
    spec = make_ofdm_spec(nfft=64, cp=16, n_active=52, order=order)
    na = spec.active.size
    n_pilot = 2

    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (c * nw, k))
    cw = np.asarray(qc_encode_dual_diagonal(base, z, jnp.asarray(u)))
    idx = np.asarray(map_codewords_to_symbols(
        jnp.asarray(cw), order)).reshape(c, nw * spc)
    pts = np.asarray(qam_constellation(order))
    s_data = -(-(nw * spc) // na)
    fill = rng.integers(0, order, (c, s_data * na - nw * spc))
    grid = pts[np.concatenate([idx, fill], axis=1)].reshape(c, s_data, na)
    pilot = pts[rng.integers(0, order, na)]
    y = []
    for ch in range(c):
        points = np.concatenate(
            [np.tile(pilot[None], (n_pilot, 1)), grid[ch]], axis=0)
        tx = np.asarray(ofdm_modulate(spec, jnp.asarray(points)))
        hch = np.array([1.0, 0.2 * np.exp(1j * 0.5)])
        rx = np.convolve(tx, hch)[: tx.size]
        y.append(rx.astype(np.complex64))
    y = np.stack(y)
    y = y + 0.09 * (rng.standard_normal(y.shape)
                    + 1j * rng.standard_normal(y.shape))  # ~15 dB

    kk = (y.shape[-1] // sym_len(spec)) * sym_len(spec)
    pipeline = jax.jit(make_ofdm_coded_modem(
        spec, code, plan, num_channels=c, nw=nw, iters=4,
        b_tile=c * nw, n_pilot=n_pilot, interpret=True))
    bits_t, ok = pipeline(
        jnp.asarray(y.real[:, :kk].astype(np.float32)),
        jnp.asarray(y.imag[:, :kk].astype(np.float32)),
        jnp.asarray(pilot.real.astype(np.float32)),
        jnp.asarray(pilot.imag.astype(np.float32)))
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(bits_t).T, cw)

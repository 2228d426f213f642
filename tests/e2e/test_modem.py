"""Coherent coded modem e2e (chains/modem.py): framework TX (linear_tx
RRC + NCO upconvert) -> AWGN channel -> MC mixfir front end + plane
max-log demap + QC layered LDPC, interpret/CPU tier.

The serving-speed twin runs on hardware via bench/modem_onchip.py; this
test pins the composition: alignment (lag), gain calibration through
the RRC cascade, bit ordering through encode -> Gray map -> demap ->
decode, and BER 0 at design SNR."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.modem import (make_coherent_modem,
                                     map_codewords_to_symbols)
from srcdsp_tpu.chains.tx import (linear_tx_apply, linear_tx_init,
                                  make_linear_tx, qam_map)
from srcdsp_tpu.kernels.ldpc_pallas import plan_qc
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import root_raised_cosine
from srcdsp_tpu.qcldpc import (make_dual_diagonal_base, make_qc_ldpc,
                               qc_encode_dual_diagonal)


def _tx_channel(sym, center, taps, sps):
    params = make_linear_tx(center, taps, sps)
    st = linear_tx_init(params)
    _, x = jax.jit(lambda s, v: linear_tx_apply(params, s, v))(
        st, jnp.asarray(sym))
    return np.asarray(x)


def test_modem_e2e_qam16_two_channels():
    C, nw, sps, order = 2, 4, 2, 16
    z, mb, nb = 16, 4, 12
    base = make_dual_diagonal_base(mb, nb, z, seed=1)
    code = make_qc_ldpc(base, z)
    plan = plan_qc(base, z)
    n, k, bps = nb * z, (nb - mb) * z, 4
    spc = n // bps

    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, (C * nw, k))
    cw = np.asarray(qc_encode_dual_diagonal(base, z, jnp.asarray(u)))
    # bit-plane interleaver (modem convention), per-codeword symbol
    # blocks concatenated in stream order per channel
    idx = np.asarray(map_codewords_to_symbols(
        jnp.asarray(cw), order)).reshape(C, nw * spc)    # [C, nsym]
    sym = np.asarray(qam_map(jnp.asarray(idx), order))   # [C, nsym] cf32

    taps = root_raised_cosine(sps, 16, beta=0.35)        # len 33, odd
    centers = [0.08, -0.11]
    out_tile, b_rows = 128, 2
    blk = b_rows * out_tile                              # symbols/block
    nsym_pad = -(-(nw * spc + len(taps)) // blk) * blk
    pad = np.zeros((C, nsym_pad - nw * spc), np.complex64)
    x = np.stack([_tx_channel(np.concatenate([sym[c], pad[c]]),
                              centers[c], taps, sps) for c in range(C)])
    snr_db = 13.0
    sigma = 10.0 ** (-snr_db / 20.0) / np.sqrt(2.0)
    x = x + sigma * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))

    # gain calibration: cascade peak of (tx pulse response) * (rx taps),
    # measured through the actual tx path on an impulse
    imp = np.zeros(64, np.complex64)
    imp[0] = 1.0
    pr = _tx_channel(imp, 0.0, taps, sps)
    cas = np.convolve(pr.real, taps)
    g = float(cas.max())
    lag_samp = int(cas.argmax())
    assert lag_samp % sps == 0, "cascade delay must be whole symbols"

    dwords = np.asarray([freq_to_word(-c) for c in centers], np.uint32)
    pipeline, hist = make_coherent_modem(
        taps / g, dwords, sps, order, code, plan, nw=nw,
        lag=lag_samp // sps, iters=4, out_tile=out_tile, b_rows=b_rows,
        b_tile=C * nw, interpret=True)
    planes = np.zeros((C, 2, hist + nsym_pad * sps), np.float32)
    planes[:, 0, hist:] = x.real
    planes[:, 1, hist:] = x.imag
    bits_t, ok = jax.jit(pipeline)(jnp.asarray(planes))

    assert bool(np.asarray(ok).all()), "some codewords failed the syndrome"
    bits = np.asarray(bits_t).T                  # column-major -> [B, n]
    assert np.array_equal(bits, cw), "codewords != tx"
    # dual-diagonal encode is systematic in the FIRST K native columns
    # (test_qcldpc pattern)
    assert np.array_equal(bits[:, :k], u)

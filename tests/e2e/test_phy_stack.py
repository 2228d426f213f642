"""Full PHY-stack integration: every coding/modulation layer of the
framework composed into one link —

  payload -> CRC-16 -> scramble (gf2) -> LDPC encode -> block interleave
  -> 16-QAM map (tx mappers) -> OFDM modulate + S&C preamble
  -> multipath + CFO + AWGN channel
  -> ofdm_rx (timing/CFO/LS-EQ) -> per-subcarrier soft LLRs (demap)
  -> deinterleave -> LDPC min-sum decode -> descramble -> CRC check.

The channel SNR is set where UNCODED 16-QAM has bit errors on the faded
subcarriers (asserted), so the run demonstrates the soft-decoding stack
doing real work end-to-end, not a trivially clean pass.
"""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.ofdm import (
    make_ofdm_spec, ofdm_modulate, ofdm_rx, schmidl_cox_preamble, sym_len,
    cfo_correct,
)
from srcdsp_tpu.chains.qam import qam_constellation, qam_slice
from srcdsp_tpu.chains.tx import bits_to_indices
from srcdsp_tpu.demap import qam_llr
from srcdsp_tpu.gf2 import (
    crc_init, crc_update, crc_value, gf2_init, make_crc, make_scrambler,
    scramble,
)
from srcdsp_tpu.interleave import block_deinterleave, block_interleave
from srcdsp_tpu.ldpc import ldpc_decode, ldpc_encode, make_ldpc_code, \
    make_regular_ldpc
from srcdsp_tpu.testing.signals import complex_awgn


def _pilot(spec, key):
    ang = jax.random.randint(key, (spec.active.size,), 0, 4).astype(jnp.float32)
    return jnp.exp(1j * 2 * jnp.pi * (ang + 0.5) / 4).astype(jnp.complex64)


def test_phy_stack_end_to_end():
    spec = make_ofdm_spec(64, 16, 52, order=16)          # 208 bits/sym
    code = make_ldpc_code(make_regular_ldpc(624, 3, 6, seed=2))
    nblocks = 2                                          # 1248 coded bits
    assert nblocks * code.n % (spec.active.size * 4) == 0
    crc = make_crc(0x1021, 16, init=0xFFFF)              # CRC-16/CCITT
    scr = make_scrambler((4, 7), 7)                      # 802.11 LFSR

    # ---- transmit ----
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, nblocks * code.k - 16).astype(np.int32)
    cval = int(crc_value(crc, crc_update(crc, crc_init(crc),
                                         jnp.asarray(payload))))
    crc_bits = [(cval >> (15 - i)) & 1 for i in range(16)]
    frame_bits = jnp.asarray(np.concatenate([payload, crc_bits]))
    _, scrambled = scramble(scr, gf2_init(scr, 0x5D), frame_bits)
    cw = ldpc_encode(code, scrambled.reshape(nblocks, code.k))  # [B, 624]
    inter = block_interleave(cw, 24, 26)                 # spread fades
    idx = bits_to_indices(inter.reshape(-1), 4)          # [312] symbols
    pts = qam_constellation(spec.order)[idx].reshape(-1, spec.active.size)
    kp, kn = jax.random.split(jax.random.PRNGKey(3))
    pilot = _pilot(spec, kp)
    frame = ofdm_modulate(spec, jnp.concatenate([pilot[None], pts], axis=0))
    pre = schmidl_cox_preamble(spec, jax.random.PRNGKey(4))
    sig = jnp.concatenate([jnp.zeros(203, jnp.complex64), pre, frame,
                           jnp.zeros(80, jnp.complex64)])

    # ---- channel: frequency-selective multipath + CFO + noise ----
    h = jnp.asarray([1.0, 0.0, 0.55j, 0.0, -0.28], jnp.complex64)
    rx = jnp.convolve(sig, h)[: sig.shape[-1]]
    rx = cfo_correct(rx, -0.13, spec.nfft)               # inject CFO +0.13
    p_sig = float(jnp.mean(jnp.abs(rx[203:-80]) ** 2))
    rx = rx + complex_awgn(kn, rx.shape, power=p_sig * 10 ** (-17 / 10))

    # ---- receive ----
    got_idx, soft, info = ofdm_rx(spec, rx, sym_len(spec), pilot)
    assert abs(info["cfo"] - 0.13) < 0.02
    got_idx = got_idx[: pts.shape[0]]
    soft = soft[: pts.shape[0]]

    # uncoded hard decisions must be carrying errors at this SNR
    hard_bits = ((np.asarray(got_idx).reshape(-1)[:, None]
                  >> np.arange(3, -1, -1)) & 1).reshape(-1)
    hard_bit_errs = int(np.sum(hard_bits != np.asarray(inter).reshape(-1)))
    assert hard_bit_errs > 0, "channel too clean to demonstrate coding"

    # per-subcarrier noise from decision residuals (EQ colors the noise)
    s_hat = qam_constellation(spec.order)[qam_slice(soft, spec.order)]
    sig2 = jnp.mean(jnp.abs(soft - s_hat) ** 2, axis=0) + 1e-6   # [A]
    llr = qam_llr(soft, spec.order, sig2[None, :, None])  # [S, A, 4]
    llr = llr.reshape(-1)[: nblocks * code.n].reshape(nblocks, code.n)
    llr = block_deinterleave(llr, 24, 26)

    _, info_bits, ok = ldpc_decode(code, llr, iters=50)
    assert bool(jnp.all(ok)), "LDPC failed to converge"
    _, descrambled = scramble(scr, gf2_init(scr, 0x5D),
                              info_bits.reshape(-1))
    rx_payload = np.asarray(descrambled)[: payload.size]
    rx_crc_bits = np.asarray(descrambled)[payload.size:]
    np.testing.assert_array_equal(rx_payload, payload)
    rx_cval = int(crc_value(crc, crc_update(crc, crc_init(crc),
                                            jnp.asarray(rx_payload))))
    want = int(sum(b << (15 - i) for i, b in enumerate(rx_crc_bits)))
    assert rx_cval == want, "CRC mismatch"

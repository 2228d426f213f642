"""Concatenated coding e2e: RS(255,223) outer + K=7 rate-1/2 Viterbi
inner over a noisy BPSK channel (the classic CCSDS deep-space stack) —
exercises rs.py, fec.py, and gf2.py (CRC integrity tag) together.

At an Eb/N0 where the inner Viterbi still leaks bit errors, the outer RS
must deliver the message exactly; the CRC-32 computed on the recovered
bytes doubles as an independent end-to-end integrity check.
"""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.fec import bpsk_soft, conv_encode, make_conv_code, viterbi_decode
from srcdsp_tpu.gf2 import bytes_to_bits, crc_init, crc_update, crc_value, make_crc
from srcdsp_tpu.rs import make_rs_code, rs_decode, rs_encode


def _bytes_to_bits_msb(x: np.ndarray) -> np.ndarray:
    return ((x[:, None].astype(np.int32) >> np.arange(7, -1, -1)) & 1) \
        .reshape(-1).astype(np.float32)


def _bits_to_bytes_msb(b: np.ndarray) -> np.ndarray:
    bb = np.asarray(b, np.int32).reshape(-1, 8)
    return (bb * (1 << np.arange(7, -1, -1))).sum(-1).astype(np.uint8)


def test_rs_viterbi_concatenated_noisy_channel():
    rs = make_rs_code(255, 223)
    cc = make_conv_code(7, [0o171, 0o133])
    rng = np.random.default_rng(11)

    msg = rng.integers(0, 256, (1, 223), dtype=np.uint8)
    cw = np.asarray(rs_encode(rs, jnp.asarray(msg)))[0]          # [255] u8
    bits = _bytes_to_bits_msb(cw)                                # [2040]
    coded = conv_encode(cc, jnp.asarray(bits))                   # [2, ...]

    # Eb/N0 ~ 2.5 dB at rate 1/2: sigma = sqrt(1/(2*R*Eb/N0))
    ebn0 = 10 ** (2.5 / 10)
    sigma = float(np.sqrt(1.0 / (2 * 0.5 * ebn0)))
    soft = bpsk_soft(coded, key=jax.random.PRNGKey(3), noise_std=sigma)

    hat_bits = np.asarray(viterbi_decode(cc, soft))              # [2040]
    inner_errs = int(np.sum(hat_bits != bits))
    recv = _bits_to_bytes_msb(hat_bits).reshape(1, 255)
    sym_errs = int(np.sum(recv[0] != cw))
    # the operating point must actually stress the outer code
    assert 0 < sym_errs <= rs.t, (
        f"channel too clean/dirty for the test: {sym_errs} symbol errors "
        f"({inner_errs} bit errors) — retune sigma/seed")

    out, ok = rs_decode(rs, jnp.asarray(recv))
    assert bool(np.asarray(ok)[0])
    np.testing.assert_array_equal(np.asarray(out)[0], msg[0])

    # independent integrity tag: CRC-32 over sent vs recovered bytes
    spec = make_crc(0x104C11DB7, 32, init=0xFFFFFFFF,
                    xorout=0xFFFFFFFF, reflect=True)
    def crc_of(data: bytes) -> int:
        s = crc_init(spec)
        s = crc_update(spec, s, jnp.asarray(bytes_to_bits(data, lsb_first=True)))
        return int(crc_value(spec, s))
    assert crc_of(msg[0].tobytes()) == crc_of(np.asarray(out)[0].tobytes())

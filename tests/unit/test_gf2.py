"""GF(2) machines (scrambler/CRC) vs Python bit-loop twins + check values."""

import binascii

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.gf2 import (
    bytes_to_bits, crc_init, crc_update, crc_value, gf2_apply, gf2_init,
    make_crc, make_scrambler, scramble)


def lfsr_loop(taps, order, state_bits, n):
    """Fibonacci LFSR keystream, bit by bit (independent reference)."""
    s = [(state_bits >> i) & 1 for i in range(order)]   # s[i] = s_{i+1}
    out = []
    for _ in range(n):
        fb = 0
        for t in taps:
            fb ^= s[t - 1]
        out.append(fb)
        s = [fb] + s[:-1]
    return np.array(out, np.int32)


def crc_loop(poly, width, init, data_bits):
    """MSB-first bitwise CRC (independent reference)."""
    reg = init
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for u in data_bits:
        fb = ((reg >> (width - 1)) & 1) ^ int(u)
        reg = ((reg << 1) & mask) ^ (poly if fb else 0)
    return reg


def test_keystream_matches_loop():
    mach = make_scrambler((4, 7), 7, block=64)          # 802.11
    s = gf2_init(mach, 0b1011101)
    _, key = gf2_apply(mach, s, jnp.zeros(300))         # 4 blocks + tail 44
    ref = lfsr_loop((4, 7), 7, 0b1011101, 300)
    np.testing.assert_array_equal(np.asarray(key), ref)


def test_scramble_roundtrip_and_streaming():
    mach = make_scrambler((14, 15), 15, block=128)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, 1000), jnp.int32)
    s0 = gf2_init(mach, 0x5A5A)
    s1, scr = scramble(mach, s0, bits)
    _, back = scramble(mach, s0, scr)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))
    # streaming split == one shot (state carried across ragged splits)
    sa, ya = scramble(mach, s0, bits[:333])
    sb, yb = scramble(mach, sa, bits[333:700])
    _, yc = scramble(mach, sb, bits[700:])
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(ya), np.asarray(yb), np.asarray(yc)]),
        np.asarray(scr))
    np.testing.assert_array_equal(np.asarray(s1),
                                  np.asarray(scramble(mach, sb, bits[700:])[0]))


def test_crc16_ccitt_check_value():
    spec = make_crc(0x1021, 16, init=0xFFFF)
    bits = jnp.asarray(bytes_to_bits(b"123456789"))
    val = crc_value(spec, crc_update(spec, crc_init(spec), bits))
    assert int(val) == 0x29B1


def test_crc32_check_value():
    spec = make_crc(0x04C11DB7, 32, init=0xFFFFFFFF, xorout=0xFFFFFFFF,
                    reflect=True)
    data = b"123456789"
    bits = jnp.asarray(bytes_to_bits(data, lsb_first=True))
    val = crc_value(spec, crc_update(spec, crc_init(spec), bits))
    assert int(val) == 0xCBF43926
    assert int(val) == binascii.crc32(data)


def test_crc32_long_message_vs_binascii():
    spec = make_crc(0x04C11DB7, 32, init=0xFFFFFFFF, xorout=0xFFFFFFFF,
                    reflect=True, block=256)
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 1531, dtype=np.uint8).tobytes()  # ragged tail
    bits = jnp.asarray(bytes_to_bits(data, lsb_first=True))
    val = crc_value(spec, crc_update(spec, crc_init(spec), bits))
    assert int(val) == binascii.crc32(data)


def test_crc_matches_loop_random_poly():
    poly, width, init = 0x8005, 16, 0x1D0F
    spec = make_crc(poly, width, init=init, block=32)
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 203)
    got = crc_value(spec, crc_update(spec, crc_init(spec), jnp.asarray(bits)))
    assert int(got) == crc_loop(poly, width, init, bits)


def test_crc_batch_vmap():
    spec = make_crc(0x1021, 16, init=0xFFFF, block=64)
    rng = np.random.default_rng(3)
    msgs = rng.integers(0, 2, (5, 192))
    s0 = jnp.broadcast_to(crc_init(spec), (5, 16))
    vals = crc_value(spec, crc_update(spec, s0, jnp.asarray(msgs)))
    for i in range(5):
        assert int(vals[i]) == crc_loop(0x1021, 16, 0xFFFF, msgs[i])
    # under jit too
    f = jax.jit(lambda b: crc_value(spec, crc_update(spec, s0, b)))
    np.testing.assert_array_equal(np.asarray(f(jnp.asarray(msgs, jnp.float32))),
                                  np.asarray(vals))

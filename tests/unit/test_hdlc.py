"""HDLC framing (hdlc.py): stuffing roundtrip, run-limit property, flag
detection, and a full flag|stuffed(payload+CRC)|flag frame."""

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.hdlc import (
    FLAG, compact_bits, destuff_bits, find_flags, stuff_bits,
)


def test_stuff_destuff_roundtrip_and_run_limit():
    rng = np.random.default_rng(0)
    # bias toward ones so long runs occur
    bits = (rng.random(4096) < 0.75).astype(np.int32)
    out, valid, _ = stuff_bits(jnp.asarray(bits))
    stuffed = compact_bits(out, valid)
    # property: the stuffed stream never contains six 1s in a row
    runs = np.diff(np.flatnonzero(np.concatenate(
        [[1], np.diff(stuffed) != 0, [1]])))
    ones_runs = runs[::2] if stuffed[0] == 1 else runs[1::2]
    assert ones_runs.size == 0 or ones_runs.max() <= 5
    # destuff recovers the original exactly
    v2, m2, _ = destuff_bits(jnp.asarray(stuffed))
    back = compact_bits(v2, m2)
    np.testing.assert_array_equal(back, bits)


def test_worst_case_all_ones():
    bits = np.ones(25, np.int32)
    o, v, _ = stuff_bits(jnp.asarray(bits))
    stuffed = compact_bits(o, v)
    # the transmitter stuffs after EVERY five 1s — including the final
    # run (the receiver deletes it): 25 ones -> 5 groups of 11111 0
    np.testing.assert_array_equal(
        stuffed, np.asarray(([1] * 5 + [0]) * 5))
    o2, v2, _ = destuff_bits(jnp.asarray(stuffed))
    back = compact_bits(o2, v2)
    np.testing.assert_array_equal(back, bits)


def test_find_flags():
    rng = np.random.default_rng(1)
    bits = (rng.random(512) < 0.4).astype(np.int32)
    for at in (37, 200, 480):
        bits[at:at + 8] = FLAG
    # kill accidental flags elsewhere by destroying 6-runs outside
    hits = np.flatnonzero(np.asarray(find_flags(jnp.asarray(bits))))
    for at in (37, 200, 480):
        assert at in hits


def test_full_frame_roundtrip_with_crc():
    from srcdsp_tpu.gf2 import crc_init, crc_update, crc_value, make_crc

    crc = make_crc(0x1021, 16, init=0xFFFF)
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 2, 200)
    cval = int(crc_value(crc, crc_update(crc, crc_init(crc),
                                         jnp.asarray(payload))))
    body = np.concatenate([payload,
                           [(cval >> (15 - i)) & 1 for i in range(16)]])
    ob, vb, _ = stuff_bits(jnp.asarray(body))
    stuffed = compact_bits(ob, vb)
    wire = np.concatenate([FLAG, stuffed, FLAG]).astype(np.int32)

    # receiver: find flags, destuff the span between them, check CRC
    hits = np.flatnonzero(np.asarray(find_flags(jnp.asarray(wire))))
    assert hits[0] == 0 and hits[-1] == 8 + stuffed.size
    span = wire[hits[0] + 8: hits[-1]]
    os_, vs, _ = destuff_bits(jnp.asarray(span))
    rx = compact_bits(os_, vs)
    np.testing.assert_array_equal(rx, body)
    rv = int(crc_value(crc, crc_update(crc, crc_init(crc),
                                       jnp.asarray(rx[:-16]))))
    want = int(sum(b << (15 - i) for i, b in enumerate(rx[-16:])))
    assert rv == want


def test_streaming_split_mid_run():
    """A run of 1s straddling a block boundary: threading run_out -> run0
    stuffs/destuffs identically to the one-shot call (the block-streaming
    contract every other op here honors)."""
    rng = np.random.default_rng(3)
    bits = (rng.random(512) < 0.8).astype(np.int32)
    bits[250:262] = 1                       # force a straddling run
    o, v, _ = stuff_bits(jnp.asarray(bits))
    one = compact_bits(o, v)
    parts = []
    r = 0
    for blk in np.split(bits, [256]):
        o, v, r = stuff_bits(jnp.asarray(blk), r)
        parts.append(compact_bits(o, v))
    got = np.concatenate(parts)
    np.testing.assert_array_equal(got, one)
    # destuff the stream split at an arbitrary point, threading state
    one_d0, one_d1, _ = destuff_bits(jnp.asarray(one))
    want = compact_bits(one_d0, one_d1)
    parts = []
    r = 0
    for blk in np.split(got, [301]):
        o, v, r = destuff_bits(jnp.asarray(blk), r)
        parts.append(compact_bits(o, v))
    np.testing.assert_array_equal(np.concatenate(parts), want)
    np.testing.assert_array_equal(want, bits)

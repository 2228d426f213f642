"""AIS frame layer: independent FCS/NRZI loop twins and the full GMSK
link — modulate -> delay + CFO + noise -> FSK-chain demod -> NRZI ->
HDLC deframe -> FCS."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.ais import (ais_fcs, build_ais_frame,
                                   decode_ais_frame, nrzi_decode,
                                   nrzi_encode)


def _fcs_loop_twin(bits):
    """X-25 FCS as the classic reflected byte-less bit loop, written
    independently of gf2.py: reflected poly 0x8408, init 0xFFFF, final
    complement."""
    reg = 0xFFFF
    for b in bits:
        fb = (reg ^ int(b)) & 1
        reg >>= 1
        if fb:
            reg ^= 0x8408
    return reg ^ 0xFFFF


def test_fcs_matches_independent_loop():
    rng = np.random.default_rng(0)
    for n in (24, 168, 257):
        bits = rng.integers(0, 2, n).astype(np.int32)
        assert ais_fcs(bits) == _fcs_loop_twin(bits), n


def test_nrzi_roundtrip_and_polarity_immunity():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 300).astype(np.int32)
    for lvl0 in (0, 1):
        lv = nrzi_encode(bits, lvl0)
        # decode needs the pre-stream level only for bit 0; from bit 1 on
        # it is exact, and a global inversion changes nothing
        assert np.array_equal(nrzi_decode(lv)[1:], bits[1:])
        assert np.array_equal(nrzi_decode(1 - lv)[1:], bits[1:])
    # loop twin of the encoder
    lv = nrzi_encode(bits, 0)
    level, out = 0, []
    for b in bits:
        level = level if b else 1 - level
        out.append(level)
    assert np.array_equal(lv, np.asarray(out))


def test_frame_roundtrip_bits_only():
    payload = b"!AIVDM test payload"
    lv = build_ais_frame(payload)
    got, ok, idx = decode_ais_frame(lv)
    assert ok and got == payload
    bad = lv.copy()
    bad[60] ^= 1
    _, ok2, _ = decode_ais_frame(bad)
    assert not ok2


def test_ais_gmsk_link_over_impaired_channel():
    """Full 9600-bd AIS link: GMSK BT=0.4 modulate, unknown delay + CFO
    + AWGN, FSK-chain demod, NRZI/HDLC/FCS recover the payload."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
    from srcdsp_tpu.testing.signals import gmsk_baseband, tone

    payload = bytes(range(24))
    levels = build_ais_frame(payload)
    decim, sps = 2, 4
    spb = decim * sps
    rng = np.random.default_rng(2)
    pad_pre = rng.integers(0, 2, 48)
    pad_post = rng.integers(0, 2, 48)
    line = np.concatenate([pad_pre, levels, pad_post])
    x = np.asarray(gmsk_baseband(line, spb, bt=0.4))
    cfo = 0.003
    x = x * np.asarray(tone(x.size, cfo))
    x = (x + 0.05 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))
         ).astype(np.complex64)

    # receiver does NOT know the CFO (center 0): the discriminator sees
    # it as a constant d offset (~10% of the eye at 0.003) and NRZI's
    # transition coding absorbs the bias — a genuine robustness claim
    params = make_fsk_params(0.0, 64, 0.45 / decim, decim=decim, sps=sps,
                             dev=0.25 / sps, timing_forget=0.95)
    n = (x.size // (decim * sps)) * decim * sps
    st = fsk_init(params)
    _, (lv_hat, _) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(x[:n]))
    lv_hat = np.asarray(lv_hat).reshape(-1)

    got, ok, idx = decode_ais_frame(lv_hat)
    assert ok, "FCS failed through the impaired channel"
    assert got == payload


def test_decode_survives_spurious_flags_in_padding():
    """Random padding contains spurious 01111110 patterns (~1 per 64
    noise bits): the decoder must iterate candidate flag pairs, not
    anchor on the first hit (round-4 review repro, seed 11)."""
    payload = bytes(range(10))
    lv = build_ais_frame(payload)
    for seed in range(12):
        rng = np.random.default_rng(seed)
        line = np.concatenate([rng.integers(0, 2, 48), lv,
                               rng.integers(0, 2, 48)]).astype(np.int32)
        got, ok, _ = decode_ais_frame(line)
        assert ok and got == payload, seed


def test_decode_all_frames_multi_and_shared_flag():
    """Stream decode: three frames in one capture, the middle pair
    back-to-back sharing one flag, plus noise padding between/around —
    all three come out in order with correct payloads."""
    from srcdsp_tpu.chains.ais import decode_all_ais_frames

    p1, p2, p3 = b"frame-one!", bytes(range(16)), b"third\x00pay"
    lv1 = build_ais_frame(p1)
    # back-to-back: frame 2's closing flag == frame 3's opening flag.
    # NRZI level continuity: start frame 3's encode from frame 2's final
    # level, and drop the duplicated flag (8 line bits).
    lv23_a = build_ais_frame(p2)
    lv23_b = build_ais_frame(p3, level0=int(lv23_a[-1]))
    rng = np.random.default_rng(3)
    line = np.concatenate([
        rng.integers(0, 2, 40), lv1, rng.integers(0, 2, 64),
        lv23_a, lv23_b[8:], rng.integers(0, 2, 40)]).astype(np.int32)
    got = decode_all_ais_frames(line)
    assert [g[0] for g in got] == [p1, p2, p3]
    assert got[0][1] < got[1][1] < got[2][1]


def test_ais_cli_decodes_capture(tmp_path):
    """ais CLI subcommand: a generated GMSK capture with two frames and
    an unknown CFO decodes to two FCS-clean JSON lines."""
    import json

    from srcdsp_tpu.cli import main as cli_main
    from srcdsp_tpu.io.capture import CaptureMeta, write_capture
    from srcdsp_tpu.testing.signals import gmsk_baseband, tone

    p1, p2 = b"ais-cli-#1", b"ais-cli-#2!!"
    rng = np.random.default_rng(4)
    line = np.concatenate([
        rng.integers(0, 2, 48), build_ais_frame(p1),
        rng.integers(0, 2, 200), build_ais_frame(p2),
        rng.integers(0, 2, 48)]).astype(np.int32)
    decim, sps = 2, 4
    x = np.asarray(gmsk_baseband(jnp.asarray(line), decim * sps, bt=0.4))
    x = x * np.asarray(tone(x.size, 0.002))      # receiver won't know this
    x = (x + 0.04 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))).astype(np.complex64)
    capf = str(tmp_path / "vhf.cf32")
    write_capture(capf, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "msgs.jsonl")
    cli_main(["ais", capf, out, "--decim", str(decim), "--sps", str(sps)])
    recs = [json.loads(l) for l in open(out)]
    assert [bytes.fromhex(r["hex"]) for r in recs] == [p1, p2]

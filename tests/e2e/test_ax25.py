"""AX.25/APRS (chains/ax25.py): independent address-codec loop twin,
frame build/parse roundtrip through the shared HDLC/FCS layer, and the
full text -> UI frame -> Bell-202 AFSK audio -> noise -> FSK demod ->
deframe -> parse link."""

import numpy as np

from srcdsp_tpu.chains.ax25 import (afsk_modulate, build_aprs_frame,
                                    build_ax25_frame, decode_address,
                                    decode_ax25_audio, encode_address,
                                    parse_ax25)


def _addr_twin(call: str, ssid: int, last: bool) -> bytes:
    """Independent bit-level twin of the AX.25 address encoding."""
    out = []
    for ch in call.upper().ljust(6)[:6]:
        v = 0
        a = ord(ch)
        for i in range(8):                 # shift left 1 == v*2 mod 256
            v |= (((a >> i) & 1) << (i + 1)) & 0xFF
        out.append(v)
    out.append(0b01100000 | ((ssid & 0xF) << 1) | (1 if last else 0))
    return bytes(out)


def test_address_codec_matches_twin():
    for call, ssid, last in [("N0CALL", 0, False), ("W1AW", 7, True),
                             ("K5ABC", 15, False), ("ID", 1, True)]:
        enc = encode_address(call, ssid, last)
        assert enc == _addr_twin(call, ssid, last), call
        got = decode_address(enc)
        assert got == (call.upper(), ssid, last)


def test_frame_parse_roundtrip_with_digis():
    from srcdsp_tpu.chains.ais import decode_all_ais_frames

    lv = build_ax25_frame("APRS", "N0CALL", b"hello world",
                          path=(("WIDE1", 1), ("WIDE2", 2)), src_ssid=9)
    frames = decode_all_ais_frames(lv)
    assert len(frames) == 1
    rec = parse_ax25(frames[0][0])
    assert rec["dest"] == ("APRS", 0)
    assert rec["src"] == ("N0CALL", 9)
    assert rec["path"] == (("WIDE1", 1), ("WIDE2", 2))
    assert rec["control"] == 0x03 and rec["pid"] == 0xF0
    assert rec["info"] == b"hello world"


def test_full_afsk_audio_link():
    """Two APRS frames in one noisy audio capture, both recovered."""
    fs = 13200.0
    sps = 11                               # fs / 1200 baud
    fm, fsp = 1200.0 / fs, 2200.0 / fs
    rng = np.random.default_rng(0)

    lv1 = build_aprs_frame("N0CALL", "!4903.50N/07201.75W-Test 001")
    lv2 = build_ax25_frame("APRS", "W1AW", b"=4217.00N/07148.00W#")
    a1 = afsk_modulate(lv1, sps, fm, fsp)
    a2 = afsk_modulate(lv2, sps, fm, fsp)
    audio = np.concatenate([
        np.zeros(700, np.float32), a1,
        np.zeros(1500, np.float32), a2,
        np.zeros(700, np.float32)])
    audio = audio + 0.08 * rng.standard_normal(audio.size).astype(
        np.float32)

    recs = decode_ax25_audio(audio, sps, fm, fsp)
    assert len(recs) == 2, len(recs)
    assert recs[0]["src"] == ("N0CALL", 0)
    assert recs[0]["info"] == b"!4903.50N/07201.75W-Test 001"
    assert recs[0]["path"] == (("WIDE1", 1),)
    assert recs[1]["src"] == ("W1AW", 0)
    assert recs[1]["info"] == b"=4217.00N/07148.00W#"


def test_cli_ax25(tmp_path):
    import json
    from srcdsp_tpu.cli import main as cli_main

    fs = 13200.0
    sps = 11
    lv = build_aprs_frame("N0CALL", "CLI TEST")
    audio = np.concatenate([np.zeros(500, np.float32),
                            afsk_modulate(lv, sps, 1200 / fs, 2200 / fs),
                            np.zeros(500, np.float32)])
    f = str(tmp_path / "audio.f32")
    audio.astype(np.float32).tofile(f)
    out = str(tmp_path / "frames.jsonl")
    cli_main(["ax25", f, out, "--fs", str(fs)])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 1
    assert recs[0]["src"] == "N0CALL-0"
    assert recs[0]["info"] == "CLI TEST"

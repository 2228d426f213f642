"""CW/Morse: table spot checks, timing structure, and blind decode at
unknown speed/tone through noise."""

import numpy as np

from srcdsp_tpu.chains import cw


def test_table_spot_values():
    assert cw.MORSE["S"] == "..." and cw.MORSE["O"] == "---"
    assert cw.MORSE["A"] == ".-" and cw.MORSE["Q"] == "--.-"
    assert cw.MORSE["5"] == "....." and cw.MORSE["0"] == "-----"
    # prefix-free within a character (decode is gap-delimited, but the
    # inverse table must be collision-free)
    assert len(set(cw.MORSE.values())) == len(cw.MORSE)


def test_timing_structure():
    runs = cw.morse_encode_timing("EE E")
    # E = dit; element runs: dit, chargap, dit, wordgap, dit
    assert runs == [(1, 1), (0, 3), (1, 1), (0, 7), (1, 1)]


def test_blind_decode_two_speeds(rng):
    fs = 8000.0
    for wpm, tone in ((18.0, 650.0), (30.0, 420.0)):
        msg = "CQ CQ DE W1AW K"
        x = cw.cw_modulate(msg, wpm, fs, tone)
        x = np.concatenate([np.zeros(2000, np.float32), x,
                            np.zeros(2000, np.float32)])
        x = x + (0.08 * rng.standard_normal(x.size)).astype(np.float32)
        out = cw.decode_cw(x, fs)
        assert out["text"] == msg, (wpm, out)
        assert abs(out["wpm"] - wpm) < 0.15 * wpm
        assert abs(out["tone_hz"] - tone) < 10.0


def test_complex_baseband_input(rng):
    fs = 4000.0
    x = cw.cw_modulate("TEST 73", 22.0, fs, 500.0).astype(np.complex64)
    x = x * np.exp(2j * np.pi * 0.05 * np.arange(x.size))  # offset
    out = cw.decode_cw(x, fs)
    assert out["text"] == "TEST 73"


def test_cli_cw(rng, tmp_path):
    import json

    from srcdsp_tpu.cli import main as cli_main

    fs = 8000.0
    x = cw.cw_modulate("HELLO CLI", 20.0, fs, 700.0)
    raw = str(tmp_path / "cw.f32")
    np.concatenate([np.zeros(1000, np.float32), x,
                    np.zeros(1000, np.float32)]).tofile(raw)
    out = str(tmp_path / "cw.json")
    cli_main(["cw", raw, out, "--mpx"])
    rec = json.loads(open(out).read())
    assert rec["text"] == "HELLO CLI"
    assert abs(rec["tone_hz"] - 700.0) < 10

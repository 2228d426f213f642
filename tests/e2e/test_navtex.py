"""NAVTEX / SITOR-B: constant-weight code properties, time-diversity
FEC behavior under burst errors, and the full FSK link round trip."""

import numpy as np

from srcdsp_tpu.chains import navtex


def test_constant_weight_table():
    codes = list(navtex.CW_TABLE.values())
    assert len(codes) == len(set(codes)) == 35
    for c in codes:
        assert bin(c).count("1") == 4          # the 4/3 ratio
    # every single-bit error leaves the weight-4 set (detectable)
    for c in codes:
        for b in range(7):
            assert bin(c ^ (1 << b)).count("1") != 4


def test_sitor_b_diversity_recovers_burst():
    text = "SECURITE GALE WARNING 945"
    codes = navtex._text_codes(text)
    stream = navtex.sitor_b_encode(codes)
    # clean round trip
    got, er = navtex.sitor_b_decode(stream)
    assert got == text.upper() and er == 0
    # corrupt a BURST of 4 consecutive tx slots (2 DX + 2 RX chars):
    # every damaged character's twin lives 5 slots away -> recovered
    bad = stream.copy()
    base = 28 + 12                              # inside the data body
    for i in range(4):
        bad[base + i] ^= 0b0000001              # odd flip: weight != 4
        # (an even flip can land on ANOTHER valid codeword — the
        # constant-weight code detects all odd-weight errors only)
    got, er = navtex.sitor_b_decode(bad)
    assert got == text.upper() and er == 0
    # damaging BOTH copies of one character leaves one erasure
    bad = stream.copy()
    k = 6                                        # DX slot of char 3
    bad[28 + 2 * k] ^= 1
    bad[28 + 2 * (k + 5) + 1] ^= 1               # its RX copy
    got, er = navtex.sitor_b_decode(bad)
    assert er == 1 and "*" in got


def test_sitor_b_rx_slot_cut():
    # a stream cut at an RX slot still decodes (lane parity + lag)
    text = "TEST MESSAGE"
    stream = navtex.sitor_b_encode(navtex._text_codes(text))
    got, er = navtex.sitor_b_decode(stream[1:])
    assert text.upper() in got and er == 0


def test_navtex_fsk_link_round_trip(rng):
    sps, dev = 20, 0.05                          # 100 Bd at fs=2 kHz
    msg = navtex.navtex_build("F", "A", "07",
                              "GALE WARNING SEA AREA 9")
    stream = navtex.sitor_b_encode(navtex._text_codes(msg))
    x = navtex.navtex_modulate(stream, sps, dev)
    x = np.concatenate([x, np.zeros(40 * sps, np.complex64)])
    x = x + (0.15 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))
             ).astype(np.complex64)
    text, er = navtex.decode_navtex_audio(x, sps, dev)
    rec = navtex.navtex_parse(text)
    assert rec is not None
    assert rec["station"] == "F" and rec["type"] == "A"
    assert rec["serial"] == "07"
    assert "GALE WARNING SEA AREA 9" in rec["body"]


def test_cli_navtex(rng, tmp_path):
    import json

    from srcdsp_tpu.cli import main as cli_main
    from srcdsp_tpu.io.capture import CaptureMeta, write_capture

    sps, dev = 20, 0.05
    msg = navtex.navtex_build("K", "B", "12", "NO WARNINGS")
    x = navtex.navtex_modulate(
        navtex.sitor_b_encode(navtex._text_codes(msg)), sps, dev)
    x = np.concatenate([x, np.zeros(40 * sps, np.complex64)])
    capf = str(tmp_path / "navtex.cf32")
    write_capture(capf, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "msg.json")
    cli_main(["navtex", capf, out, "--sps", str(sps), "--dev", str(dev)])
    rec = json.loads(open(out).read())
    assert rec["ok"] and rec["station"] == "K" and rec["serial"] == "12"
    assert "NO WARNINGS" in rec["body"]

"""SAME/EAS: header codec, tone/baud relations, and the triple-burst
audio round trip."""

import numpy as np

from srcdsp_tpu.chains import same


def test_tone_baud_relations():
    # published structure: space = 3 cycles/bit, mark = 4 cycles/bit
    assert abs(same.F_SPACE / same.BAUD - 3.0) < 1e-6
    assert abs(same.F_MARK / same.BAUD - 4.0) < 1e-6


def test_header_codec():
    h = same.same_build("WXR", "TOR", ["048453", "048041"], "0100",
                        "2331715", "KOUN/NWS")
    assert h == "ZCZC-WXR-TOR-048453-048041+0100-2331715-KOUN/NWS-"
    rec = same.same_parse(h)
    assert rec["org"] == "WXR" and rec["event"] == "TOR"
    assert rec["fips"] == ["048453", "048041"]
    assert rec["purge"] == "0100" and rec["timestamp"] == "2331715"
    assert rec["sender"] == "KOUN/NWS"
    assert same.same_parse("garbage") is None


def test_same_audio_round_trip(rng):
    fs = 12500.0
    hdr = same.same_build("CIV", "RWT", "012345", "0030", "2330800",
                          "TESTCALL")
    burst = same.same_modulate(same.same_bytes_bits(hdr.encode()), fs)
    gap = np.zeros(int(0.2 * fs), np.float32)
    # the standard triple transmission + EOM
    eom = same.same_modulate(same.same_bytes_bits(b"NNNN"), fs)
    x = np.concatenate([gap, burst, gap, burst, gap, burst, gap, eom,
                        gap])
    x = x + (0.15 * rng.standard_normal(x.size)).astype(np.float32)
    got = same.decode_same_audio(x, fs)
    headers = [g for g in got if "ZCZC-" in g]
    assert len(headers) == 3
    for g in headers:
        rec = same.same_parse(g)
        assert rec and rec["event"] == "RWT" and rec["fips"] == ["012345"]
    assert any(g.startswith("NNNN") for g in got)


def test_cli_same(rng, tmp_path):
    import json

    from srcdsp_tpu.cli import main as cli_main

    fs = 12500.0
    hdr = same.same_build("EAS", "RWT", "099999", "0015", "2331200",
                          "CLITEST")
    burst = same.same_modulate(same.same_bytes_bits(hdr.encode()), fs)
    audio = np.concatenate([np.zeros(500, np.float32), burst,
                            np.zeros(500, np.float32)])
    raw = str(tmp_path / "same.f32")
    audio.astype(np.float32).tofile(raw)
    out = str(tmp_path / "same.jsonl")
    cli_main(["same", raw, out, "--mpx"])
    recs = [json.loads(line) for line in open(out)]
    assert len(recs) == 1 and recs[0]["event"] == "RWT"
    assert recs[0]["sender"] == "CLITEST"

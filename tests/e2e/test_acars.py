"""ACARS: character/parity layer, BCS vs independent twin + published
check value, and the full audio round trip."""

import numpy as np
import pytest

from srcdsp_tpu.chains import acars


def test_char_layer_parity_and_order():
    # every on-air byte has ODD parity; LSB-first bit order round-trips
    chars = [acars._with_parity(c) for c in range(128)]
    for c in chars:
        assert bin(c).count("1") % 2 == 1
    bits = acars.char_bits(chars)
    np.testing.assert_array_equal(acars.bits_chars(bits), chars)
    # LSB-first: char 0x01 -> first bit 1, rest 0
    np.testing.assert_array_equal(
        acars.char_bits([0x01])[:8], [1, 0, 0, 0, 0, 0, 0, 0])


def _bcs_twin(chars) -> int:
    """Independent construction: classic MSB-first CRC-16/CCITT long
    division over the BIT-REVERSED bytes, result bit-reversed back —
    the definition of a reflected CRC."""
    def rev8(b):
        return int(f"{b:08b}"[::-1], 2)

    crc = 0
    for c in chars:
        crc ^= rev8(int(c) & 0xFF) << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021 if crc & 0x8000 else crc << 1) \
                & 0xFFFF
    return int(f"{crc:016b}"[::-1], 2)


def test_bcs_matches_twin_and_check_value(rng):
    for _ in range(20):
        data = rng.integers(0, 256, rng.integers(1, 40)).tolist()
        assert acars.acars_bcs(data) == _bcs_twin(data)
    # CRC-16/KERMIT("123456789") = 0x2189 (public check value)
    assert acars.acars_bcs(b"123456789") == 0x2189


def test_frame_bits_round_trip():
    bits = acars.build_acars_frame(b"GROUND TEST MSG", address=".N747BA",
                                   label="Q0")
    # strip prekey + sync + SOH (40 bits of signature after the prekey)
    body_bits = bits[128 + 40:]
    nch = body_bits.size // 8
    rec = acars.parse_acars_chars(acars.bits_chars(body_bits[:nch * 8]))
    assert rec is not None and rec["bcs_ok"]
    assert rec["address"] == ".N747BA" and rec["label"] == "Q0"
    assert rec["text"] == "GROUND TEST MSG" and rec["parity_errors"] == 0
    # a single flipped bit in the body must break parity AND the BCS
    bad = body_bits.copy()
    bad[37] ^= 1
    rec2 = acars.parse_acars_chars(acars.bits_chars(bad[:nch * 8]))
    assert rec2 is None or not rec2["bcs_ok"]


def test_cli_acars_decodes_am_iq(rng, tmp_path):
    import json

    from srcdsp_tpu.cli import main as cli_main
    from srcdsp_tpu.io.capture import CaptureMeta, write_capture

    fs, sps = 48000.0, 20
    bits = acars.build_acars_frame(b"CLI BLOCK", address=".CLINE1",
                                   label="SA")
    audio = acars.acars_modulate(bits, sps, fs)
    x = np.concatenate([np.zeros(900, np.float32), audio,
                        np.zeros(900, np.float32)])
    # AM at complex baseband with a slow phase ramp; envelope carries it
    ph = np.exp(1j * 2 * np.pi * 0.003 * np.arange(x.size))
    iq = ((1.0 + 0.8 * x) * ph).astype(np.complex64)
    iq += (0.01 * (rng.standard_normal(iq.size)
                   + 1j * rng.standard_normal(iq.size))
           ).astype(np.complex64)
    capf = str(tmp_path / "acars.cf32")
    write_capture(capf, iq, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "blocks.jsonl")
    cli_main(["acars", capf, out])
    recs = [json.loads(line) for line in open(out)]
    assert len(recs) == 1 and recs[0]["bcs_ok"]
    assert recs[0]["address"] == ".CLINE1"
    assert recs[0]["text"] == "CLI BLOCK"


@pytest.mark.parametrize("snr_db", [30.0, 12.0])
def test_acars_audio_round_trip(rng, snr_db):
    fs, sps = 48000.0, 20
    bits = acars.build_acars_frame(b"7500 SQUAWK TEST", mode="2",
                                   address=".N12345", label="H1")
    audio = acars.acars_modulate(bits, sps, fs)
    # arbitrary lead-in/out noise; AM channel noise at snr_db
    pad = rng.standard_normal(1537).astype(np.float32) * 0.01
    x = np.concatenate([pad, audio, pad])
    sig = float(np.mean(audio ** 2))
    x = x + rng.standard_normal(x.size).astype(np.float32) \
        * np.sqrt(sig * 10 ** (-snr_db / 10))
    recs = acars.decode_acars_audio(x, sps, fs)
    assert len(recs) == 1
    r = recs[0]
    assert r["bcs_ok"] and r["parity_errors"] == 0
    assert r["address"] == ".N12345" and r["text"] == "7500 SQUAWK TEST"
    assert r["mode"] == "2" and r["label"] == "H1" and r["bid"] == "1"

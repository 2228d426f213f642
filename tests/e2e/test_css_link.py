"""CSS (LoRa-class) end-to-end link: full burst tx -> impaired channel
(delay, CFO, phase, AWGN) -> sync -> demod -> frame decode."""

import numpy as np
import pytest

from srcdsp_tpu.chains import css


@pytest.mark.parametrize("sf,cr", [(7, 4), (8, 4), (9, 3)])
def test_css_link_over_impaired_channel(rng, sf, cr):
    p = css.make_css_params(sf=sf, cr=cr)
    payload = b"CSS link payload %d" % sf
    tx = css.css_transmit(p, payload)

    t0 = 173
    cfo = 2.7                     # bins (integer + fractional parts)
    n_total = t0 + tx.size + 2 * p.n
    x = np.zeros(n_total, np.complex64)
    x[t0: t0 + tx.size] = tx
    ph = 2 * np.pi * (cfo / p.n) * np.arange(n_total) + 0.7
    x = x * np.exp(1j * ph).astype(np.complex64)
    # -6 dB chip SNR: well below 0 dB, inside the spreading gain
    sigma = np.sqrt(10 ** (6 / 10) / 2)
    x += (sigma * (rng.standard_normal(n_total)
                   + 1j * rng.standard_normal(n_total))
          ).astype(np.complex64)

    out, ok, sync = css.css_receive(p, x, len(payload))
    assert sync.ok
    assert abs(sync.cfo_bins - cfo) < 0.2
    assert ok and out == payload


def test_css_link_clean_all_crs(rng):
    # every coding rate round-trips on a clean channel
    for cr in (1, 2, 3, 4):
        p = css.make_css_params(sf=7, cr=cr)
        payload = bytes(rng.integers(0, 256, 11, dtype=np.uint8))
        tx = css.css_transmit(p, payload)
        out, ok, sync = css.css_receive(p, tx, len(payload))
        assert sync.ok and ok and out == payload


def test_css_stream_multi_burst(rng):
    # two bursts separated by noise decode independently
    p = css.make_css_params(sf=7, cr=4)
    pay = [b"first burst", b"secondburst"]
    gap = (0.05 * (rng.standard_normal(777)
                   + 1j * rng.standard_normal(777))).astype(np.complex64)
    x = np.concatenate([gap, css.css_transmit(p, pay[0]), gap,
                        css.css_transmit(p, pay[1]), gap])
    got = css.css_receive_stream(p, x, len(pay[0]))
    assert len(got) == 2
    for (out, ok, start), want in zip(got, pay):
        assert ok and out == want
    assert got[0][2] == 777 + css.preamble_len(p)


def test_cli_css_decodes_capture(rng, tmp_path):
    import json

    from srcdsp_tpu.cli import main as cli_main
    from srcdsp_tpu.io.capture import CaptureMeta, write_capture

    p = css.make_css_params(sf=7, cr=4)
    payload = b"cli css burst 1!"
    tx = css.css_transmit(p, payload)
    x = np.concatenate([np.zeros(300, np.complex64), tx,
                        np.zeros(300, np.complex64)])
    x += (0.05 * (rng.standard_normal(x.size)
                  + 1j * rng.standard_normal(x.size))).astype(np.complex64)
    capf = str(tmp_path / "css.cf32")
    write_capture(capf, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "bursts.jsonl")
    cli_main(["css", capf, out, "--css-sf", "7", "--css-cr", "4",
              "--css-len", str(len(payload))])
    recs = [json.loads(line) for line in open(out)]
    assert len(recs) == 1 and recs[0]["crc_ok"]
    assert bytes.fromhex(recs[0]["hex"]) == payload


def test_css_frame_nsym_consistency():
    # the receiver's symbol-count contract matches the encoder for a
    # sweep of payload lengths and parameters
    for sf in (7, 10):
        for cr in (1, 4):
            p = css.make_css_params(sf=sf, cr=cr)
            for plen in (1, 5, 16, 63):
                shifts = css.css_encode_frame(p, bytes(plen))
                assert shifts.size == css.css_frame_nsym(p, plen)


def test_soft_decision_beats_hard_at_waterline(rng):
    """Exhaustive-ML soft nibble decoding from the max-log bin LLRs
    recovers frames the hard path loses (~1 dB at the waterline):
    at -13.5 dB chip SNR over 20 trials the soft decoder must win by
    a clear margin."""
    p = css.make_css_params(sf=8, cr=4)
    payload = bytes(rng.integers(0, 256, 20, dtype=np.uint8))
    tx = css.css_modulate(p, css.css_encode_frame(p, payload))
    n_hard = n_soft = 0
    sigma = np.sqrt(10 ** (13.5 / 10) / 2)
    for _ in range(20):
        x = tx + (sigma * (rng.standard_normal(tx.size)
                           + 1j * rng.standard_normal(tx.size))
                  ).astype(np.complex64)
        k, _ = css.css_demod(p, x)
        outh, okh = css.css_decode_frame(p, np.asarray(k), len(payload))
        llrs = css.css_soft_llrs(p, x)
        outs, oks = css.css_decode_frame_soft(p, llrs, len(payload))
        n_hard += bool(okh and outh == payload)
        n_soft += bool(oks and outs == payload)
    assert n_soft >= n_hard + 4, (n_soft, n_hard)
    assert n_soft >= 15, n_soft


def test_soft_matches_hard_on_clean_frames(rng):
    # at high SNR both paths must agree with the transmitted payload
    p = css.make_css_params(sf=7, cr=3)
    payload = b"soft=hard high snr"
    tx = css.css_modulate(p, css.css_encode_frame(p, payload))
    x = tx + (0.05 * (rng.standard_normal(tx.size)
                      + 1j * rng.standard_normal(tx.size))
              ).astype(np.complex64)
    llrs = css.css_soft_llrs(p, x)
    out, ok = css.css_decode_frame_soft(p, llrs, len(payload))
    assert ok and out == payload


def test_css_sf12_link(rng):
    # the largest SF (the serving tier's four-step fallback regime)
    p = css.make_css_params(sf=12, cr=4, n_up=6)
    payload = b"sf12"
    tx = css.css_transmit(p, payload)
    x = tx + (0.5 * (rng.standard_normal(tx.size)
                     + 1j * rng.standard_normal(tx.size))
              ).astype(np.complex64)
    out, ok, sync = css.css_receive(p, x, len(payload))
    assert sync.ok and ok and out == payload


def test_stream_continues_past_corrupt_burst(rng):
    # burst 2's payload is trashed (CRC fails) — bursts 1 and 3 must
    # still decode and the scan must not stall
    p = css.make_css_params(sf=7, cr=4)
    pays = [b"first", b"xxxxx", b"third"]
    parts = []
    gap = np.zeros(400, np.complex64)
    for i, pl in enumerate(pays):
        b = css.css_transmit(p, pl)
        if i == 1:
            b[css.preamble_len(p):] = 0     # destroy the payload
        parts += [gap, b]
    x = np.concatenate(parts + [gap])
    x += (0.03 * (rng.standard_normal(x.size)
                  + 1j * rng.standard_normal(x.size))
          ).astype(np.complex64)
    got = css.css_receive_stream(p, x, 5)
    oks = [(out, ok) for out, ok, _ in got]
    assert (b"first", True) in oks and (b"third", True) in oks
    assert not any(out == b"xxxxx" for out, _ in oks)

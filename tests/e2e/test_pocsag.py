"""POCSAG (chains/pocsag.py): published-constant self-validation,
codec roundtrip with error correction, numeric BCD helpers, and the
full encode -> 2-FSK -> AWGN -> demod -> decode link."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.pocsag import (FSC, IDLE, address_codeword,
                                      decode_numeric, decode_transmission,
                                      encode_numeric, encode_transmission,
                                      make_codeword, message_codeword,
                                      pocsag_baseband)


def _int_bits(v, w):
    return np.asarray([(v >> (w - 1 - i)) & 1 for i in range(w)], np.int32)


def test_published_constants_are_valid_codewords():
    """FSC and IDLE (published) must be codewords of the module's own
    BCH(31,21)+parity construction — one check validating generator,
    bit order, and parity convention together."""
    for w in (FSC, IDLE):
        bits = _int_bits(w, 32)
        rebuilt = make_codeword(bits[:21])
        np.testing.assert_array_equal(rebuilt, bits)


def test_codec_roundtrip_and_correction():
    rng = np.random.default_rng(0)
    pages = [(0x12345, 2, encode_numeric("0420*911")),
             (0x0ABCD, 1, encode_numeric("555 1234"))]
    bits = encode_transmission(pages)
    got = decode_transmission(bits)
    assert len(got) == 2
    for (ric, func, datas), g in zip(pages, got):
        assert g["ric"] == ric and g["func"] == func
        assert g["data"] == datas
        assert g["corrected"] == 0
    assert decode_numeric(got[0]["data"]) == "0420*911"

    # flip 2 bits in one message word + 1 bit in the FSC: still decodes
    bad = bits.copy()
    pre = 576
    bad[pre + 5] ^= 1                                  # FSC bit
    first_word = pre + 32 * (1 + 2 * (0x12345 & 7)) + 32   # 1st msg word
    bad[first_word + 3] ^= 1
    bad[first_word + 17] ^= 1
    got2 = decode_transmission(bad)
    assert len(got2) == 2
    assert got2[0]["data"] == pages[0][2]
    assert got2[0]["corrected"] >= 2


def test_full_fsk_link():
    """encode -> 2-FSK baseband -> delay + AWGN -> chains.fsk demod ->
    decode (trying both polarities, as real networks differ)."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params

    sps, dev = 8, 0.05
    pages = [(0x3F00A, 3, encode_numeric("8675309"))]
    bits = encode_transmission(pages, preamble_bits=64)
    bb = np.asarray(pocsag_baseband(bits, sps, dev))
    rng = np.random.default_rng(1)
    x = np.concatenate([np.zeros(777, np.complex64),
                        bb.astype(np.complex64),
                        np.zeros(1024, np.complex64)])
    x = (x + 0.05 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))
         ).astype(np.complex64)

    params = make_fsk_params(0.0, 64, 0.45, decim=1, sps=sps, dev=dev)
    n = (x.size // sps) * sps
    st = fsk_init(params)
    _, (got_bits, _soft) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(x[:n]))
    got_bits = np.asarray(got_bits).reshape(-1)

    pages_out = decode_transmission(got_bits)
    if not pages_out:
        pages_out = decode_transmission(1 - got_bits)
    assert len(pages_out) == 1
    assert pages_out[0]["ric"] == 0x3F00A
    assert pages_out[0]["func"] == 3
    assert decode_numeric(pages_out[0]["data"]) == "8675309"


def test_cli_pocsag(tmp_path):
    """pocsag subcommand: IQ capture -> page JSON with numeric decode."""
    import json
    from srcdsp_tpu.cli import main as cli_main
    from srcdsp_tpu.io.capture import CaptureMeta, write_capture

    sps, dev = 8, 0.05
    pages = [(0x2A2A1, 0, encode_numeric("31337"))]
    bits = encode_transmission(pages, preamble_bits=64)
    bb = np.asarray(pocsag_baseband(bits, sps, dev))
    rng = np.random.default_rng(4)
    x = np.concatenate([np.zeros(500, np.complex64),
                        bb.astype(np.complex64),
                        np.zeros(1024, np.complex64)])
    x = (x + 0.04 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))
         ).astype(np.complex64)
    capf = str(tmp_path / "pager.cf32")
    write_capture(capf, x, CaptureMeta(fmt="cf32"))
    out = str(tmp_path / "pages.jsonl")
    cli_main(["pocsag", capf, out, "--sps", str(sps), "--dev", str(dev),
              "--decim", "1"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 1
    assert recs[0]["ric"] == 0x2A2A1
    assert recs[0]["numeric"] == "31337"


def test_alpha_payload_roundtrip():
    from srcdsp_tpu.chains.pocsag import decode_alpha, encode_alpha
    for s in ["HELLO WORLD", "Pg 42: call 555-0199", "", "A" * 23]:
        assert decode_alpha(encode_alpha(s)) == s
    # through the full codec
    pages = [(0x01234, 3, encode_alpha("TEST MSG"))]
    got = decode_transmission(encode_transmission(pages))
    assert decode_alpha(got[0]["data"]) == "TEST MSG"

"""Recorded-capture acceptance test (SURVEY.md §4.2 fixtures row).

A committed int16 IQ capture (sha256-pinned) with the C++ oracle's demod
output as the golden vector: the JAX chain must reproduce the oracle's bits
exactly on the integer-quantized capture, and both must match the tx bits.
Pins cross-round regressions on real (quantized, saturating) wire data.
"""

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
from srcdsp_tpu.io.capture import read_capture

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def test_fixture_checksum_and_golden_bits():
    cap = os.path.join(FIX, "fsk_256sym.ci16")
    with open(os.path.join(FIX, "fsk_256sym.fixture.json")) as f:
        meta = json.load(f)
    assert hashlib.sha256(open(cap, "rb").read()).hexdigest() == meta["sha256"]

    x, _ = read_capture(cap)
    params = make_fsk_params(meta["center"], meta["taps"], meta["cutoff"],
                             meta["decim"], meta["sps"], meta["dev"])
    st = fsk_init(params)
    _, (bits, _) = fsk_apply(params, st, jnp.asarray(x))
    gold = np.load(os.path.join(FIX, "fsk_256sym_gold_bits.npy"))
    np.testing.assert_array_equal(np.asarray(bits), gold)

    # and the golden bits decode the transmitted data (sanity on the fixture)
    tx = np.load(os.path.join(FIX, "fsk_256sym_tx_bits.npy"))
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = 16 + max(lag, 0), 16 + max(-lag, 0)
        n = min(len(tx) - bs, len(gold) - rs)
        best = min(best, float(np.mean(tx[bs:bs + n] != gold[rs:rs + n])))
    assert best == 0.0


def test_channelizer_fixture_matches_oracle_golden():
    import hashlib
    from srcdsp_tpu.chains.channelizer import channelize_full
    cap = os.path.join(FIX, "chan_8x128.ci16")
    with open(os.path.join(FIX, "chan_8x128.fixture.json")) as f:
        meta = json.load(f)
    assert hashlib.sha256(open(cap, "rb").read()).hexdigest() == meta["sha256"]
    x, _ = read_capture(cap)
    h = np.load(os.path.join(FIX, "chan_8x128_proto.npy"))
    gold = np.load(os.path.join(FIX, "chan_8x128_gold.npy"))
    got = np.asarray(channelize_full(h, jnp.asarray(x), meta["channels"]))
    err = gold - got
    snr = 10 * np.log10(np.mean(np.abs(gold) ** 2) / np.mean(np.abs(err) ** 2))
    assert snr > 100, f"SNR vs committed golden {snr:.1f} dB"


def test_qpsk_fixture_regression_pinned():
    """QPSK capture: chain output must stay identical to the pinned golden
    indices, and the golden must decode the tx data (diff decode, SER 0)."""
    import hashlib
    from srcdsp_tpu.chains.psk import (
        diff_decode, make_psk_params, psk_apply, psk_init)
    cap = os.path.join(FIX, "qpsk_256sym.ci16")
    with open(os.path.join(FIX, "qpsk_256sym.fixture.json")) as f:
        meta = json.load(f)
    assert hashlib.sha256(open(cap, "rb").read()).hexdigest() == meta["sha256"]
    x, _ = read_capture(cap)
    pp = make_psk_params(meta["center"], decim=meta["decim"], sps=meta["sps"],
                         order=meta["order"])
    st = psk_init(pp)
    _, (idx, _) = psk_apply(pp, st, jnp.asarray(x))
    gold = np.load(os.path.join(FIX, "qpsk_256sym_gold_idx.npy"))
    np.testing.assert_array_equal(np.asarray(idx), gold)
    data = np.load(os.path.join(FIX, "qpsk_256sym_data.npy"))
    d = np.asarray(diff_decode(jnp.asarray(gold), meta["order"]))
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = 24 + max(lag, 0), 24 + max(-lag, 0)
        n = min(len(data) - bs, len(d) - rs)
        best = min(best, float(np.mean(data[bs:bs + n] != d[rs:rs + n])))
    assert best == 0.0

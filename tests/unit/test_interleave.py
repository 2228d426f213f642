"""Interleaver tests (block, convolutional, permutation) + FEC burst e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.interleave import (
    block_deinterleave, block_interleave, conv_deinterleave,
    conv_deinterleave_init, conv_interleave, conv_interleave_init,
    conv_total_delay, depermute, permute, random_permutation)


def test_block_roundtrip_and_pattern():
    x = jnp.arange(24.0)
    y = block_interleave(x, rows=4, cols=6)
    # element (r, c) read by columns: y[c*4 + r] == x[r*6 + c]
    ynp = np.asarray(y)
    for r in range(4):
        for c in range(6):
            assert ynp[c * 4 + r] == r * 6 + c
    back = block_deinterleave(y, rows=4, cols=6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_block_multiframe_and_channels():
    x = jnp.arange(2 * 48.0).reshape(2, 48)
    y = block_interleave(x, 4, 6)
    back = block_deinterleave(y, 4, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_block_burst_scatter():
    """A burst of `rows` consecutive channel errors lands in `rows`
    DIFFERENT deinterleaved rows, each >= cols symbols apart."""
    rows, cols = 4, 8
    n = rows * cols
    clean = jnp.zeros(n)
    tx = block_interleave(clean, rows, cols)
    hit = np.asarray(tx).copy()
    hit[10: 10 + rows] = 1.0                      # channel burst
    rx = np.asarray(block_deinterleave(jnp.asarray(hit), rows, cols))
    errs = np.where(rx != 0)[0]
    assert len(errs) == rows
    assert np.min(np.diff(errs)) >= cols - 1


def test_conv_roundtrip_exact_delay():
    b, m = 4, 3
    n = 256
    x = jnp.arange(1.0, n + 1.0)
    ist = conv_interleave_init(b, m)
    dst = conv_deinterleave_init(b, m)
    ist, mid = conv_interleave(ist, x)
    dst, out = conv_deinterleave(dst, mid)
    d = conv_total_delay(b, m)
    got = np.asarray(out)
    # first d outputs are the zero-filled pipeline, then x re-emerges
    np.testing.assert_array_equal(got[:d], np.zeros(d))
    np.testing.assert_array_equal(got[d:], np.asarray(x)[: n - d])


def test_conv_streaming_matches_oneshot():
    b, m = 6, 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal(288).astype(np.float32)
    ist = conv_interleave_init(b, m)
    _, one = conv_interleave(ist, jnp.asarray(x))
    ist2 = conv_interleave_init(b, m)
    outs = []
    f = jax.jit(conv_interleave)
    for blk in np.split(x, 4):
        ist2, y = f(ist2, jnp.asarray(blk))
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_conv_burst_scatter():
    """After deinterleaving, a length-B channel burst never places two
    errors within B symbols of each other (the Forney guarantee that
    bursts decode as isolated errors)."""
    b, m = 5, 4
    n = 400
    ist = conv_interleave_init(b, m)
    dst = conv_deinterleave_init(b, m)
    _, tx = conv_interleave(ist, jnp.zeros(n))
    hit = np.asarray(tx).copy()
    hit[200: 200 + b] = 1.0
    _, rx = conv_deinterleave(dst, jnp.asarray(hit))
    errs = np.where(np.asarray(rx) != 0)[0]
    assert len(errs) == b
    assert np.min(np.diff(errs)) > b


def test_permutation_roundtrip():
    perm = random_permutation(64, seed=3)
    x = jnp.arange(192.0)
    y = permute(x, perm)
    back = depermute(y, perm)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    assert not np.array_equal(np.asarray(y), np.asarray(x))


def test_interleaved_viterbi_corrects_burst():
    """e2e with fec.py: a 12-symbol channel burst that breaks the plain
    K=7 Viterbi decode is fully corrected when a convolutional
    interleaver scatters it."""
    from srcdsp_tpu.fec import (bpsk_soft, conv_encode, make_conv_code,
                                viterbi_decode)
    code = make_conv_code(7, (0o171, 0o133))
    rng = np.random.default_rng(1)
    nbits = 480
    bits = jnp.asarray(rng.integers(0, 2, nbits), jnp.int32)
    coded = conv_encode(code, bits, terminate=True)     # [2*(nbits+6)]
    n = coded.shape[-1]
    b, m = 12, 17
    pad = (-n) % b
    coded_p = jnp.concatenate([coded, jnp.zeros(pad, coded.dtype)])
    ist = conv_interleave_init(b, m)
    dst = conv_deinterleave_init(b, m)
    d = conv_total_delay(b, m)
    # flush the pipeline by appending d+pad' zeros
    flush = jnp.zeros((-(n + pad + d)) % b + d, coded.dtype)
    stream = jnp.concatenate([coded_p, flush])
    _, tx = conv_interleave(ist, stream)
    soft_tx = np.asarray(bpsk_soft(tx))                 # +-1
    burst = slice(400, 412)
    hurt = soft_tx.copy()
    hurt[burst] = -soft_tx[burst]                       # 12-bit burst flip
    _, rx = conv_deinterleave(dst, jnp.asarray(hurt))
    soft = np.asarray(rx)[d: d + n]
    dec = viterbi_decode(code, jnp.asarray(soft), terminated=True)
    np.testing.assert_array_equal(np.asarray(dec)[:nbits], np.asarray(bits))
    # control: the SAME burst without interleaving defeats the decoder
    soft_plain = np.asarray(bpsk_soft(coded))
    hurt_plain = soft_plain.copy()
    hurt_plain[burst] = -soft_plain[burst]
    dec_plain = viterbi_decode(code, jnp.asarray(hurt_plain),
                               terminated=True)
    assert np.any(np.asarray(dec_plain)[:nbits] != np.asarray(bits))

"""Fully-fused FSK kernel vs the composed planes path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.fsk_planes import fsk_demod_planes, make_timing_tone
from srcdsp_tpu.kernels.fsk_fused import fsk_demod_fused, make_fsk_mc_kernel
from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel_mc
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone


def test_fused_fsk_kernel_matches_composed_path():
    nch, nsym = 2, 512
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    bits = random_bits(jax.random.PRNGKey(0), (nch, nsym))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    taps = lowpass(64, 0.03)

    kf, hist = make_fsk_mc_kernel(taps, decim, nch, sps, out_tile=128,
                                  b_rows=2, interpret=True)
    kc = make_mix_fir_kernel_mc(taps, decim, nch, out_tile=128, b_rows=2,
                                interpret=True)
    blk = kc.block_in()
    n = (x.shape[-1] // blk) * blk
    x = x[:, :n]
    word = int(freq_to_word(-center))
    words = np.full(nch, word, np.uint32)
    words0 = np.full(nch, (-hist * word) % (1 << 32), np.uint32)
    xpad = np.concatenate([np.zeros((nch, hist), np.complex64), x], axis=1)
    planes = jnp.asarray(np.stack([xpad.real, xpad.imag], axis=1)
                         .astype(np.float32))

    # fused
    st, (bits_f, soft_f) = fsk_demod_fused(kf, hist, 128, words0, words,
                                           planes, sps)
    # composed reference
    kk = n // decim
    tc, ts = make_timing_tone(kk, sps)
    st2, (bits_c, soft_c) = fsk_demod_planes(
        kc, words0, words, planes, sps, jnp.asarray(tc), jnp.asarray(ts))

    # discriminator values agree to the atan2-poly tolerance -> same bits
    agree = np.mean(np.asarray(bits_f) == np.asarray(bits_c))
    assert agree > 0.999, f"bit agreement {agree}"
    np.testing.assert_allclose(np.asarray(soft_f), np.asarray(soft_c),
                               atol=1e-4)
    # and the fused chain decodes the data
    b = np.asarray(bits)
    r = np.asarray(bits_f)
    for c in range(nch):
        best = 1.0
        for lag in range(-16, 17):
            bs, rs = 16 + max(lag, 0), 16 + max(-lag, 0)
            m = min(b.shape[-1] - bs, r.shape[-1] - rs)
            best = min(best, float(np.mean(b[c, bs:bs + m] != r[c, rs:rs + m])))
        assert best == 0.0, f"channel {c}"


def test_class_major_bits_match():
    """class_major=True (in-kernel lane permutation + contiguous-slice
    pick) produces the same bits as the standard layout."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from srcdsp_tpu.kernels.fsk_fused import (
        fsk_demod_fused, make_fsk_mc_kernel)
    from srcdsp_tpu.ops.nco import freq_to_word
    from srcdsp_tpu.ops.window import lowpass
    from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone

    nch, decim, sps = 2, 4, 8
    taps = lowpass(64, 0.03)
    centers = [0.05, 0.07]
    words = np.asarray([freq_to_word(-c) for c in centers], np.uint32)
    bits_tx = random_bits(jax.random.PRNGKey(5), (nch, 64))
    bb = fsk_baseband(bits_tx, decim * sps, 0.05 / decim)
    x = np.stack([np.asarray(bb[c] * tone(bb.shape[-1], centers[c]))
                  for c in range(nch)])

    outs = {}
    for cm in (False, True):
        fn, hist = make_fsk_mc_kernel(taps, decim, nch, sps, out_tile=128,
                                      b_rows=2, class_major=cm,
                                      interpret=True)
        n = (x.shape[-1] // (2 * 128 * decim)) * (2 * 128 * decim)
        words0 = np.asarray([(-hist * int(w)) % (1 << 32) for w in words],
                            np.uint32)
        planes = np.zeros((nch, 2, hist + n), np.float32)
        planes[:, 0, hist:] = x[:, :n].real
        planes[:, 1, hist:] = x[:, :n].imag
        _, (bits, soft) = fsk_demod_fused(fn, hist, 128, words0, words,
                                          jnp.asarray(planes), sps,
                                          class_major=cm)
        outs[cm] = np.asarray(bits)
    np.testing.assert_array_equal(outs[False], outs[True])


def test_pipelined_bit_identical_to_manual_dma():
    """Dual-BlockSpec pipelined staging == manual blocking slab DMA for
    the fused FSK kernel, bit-exact on both outputs (d and stats) — the
    SMEM discriminator carry must survive the staging change."""
    nch, decim, sps = 2, 4, 8
    taps = lowpass(64, 0.03)
    word = int(freq_to_word(-0.11))
    rng = np.random.default_rng(21)

    outs = {}
    for p in (False, True):
        fn, hist = make_fsk_mc_kernel(taps, decim, nch, sps, out_tile=128,
                                      b_rows=2, pipelined=p, interpret=True)
        blk = 2 * 128 * decim
        n = 4 * blk
        planes = jnp.asarray(
            rng.standard_normal((nch, 2, hist + n)).astype(np.float32))
        words0 = jnp.asarray(np.asarray([100, 200], np.int32).reshape(-1, 1))
        dwords = jnp.asarray(
            np.asarray([word, word + 9], np.uint32).view(np.int32)
            .reshape(-1, 1))
        outs[p] = fn(words0, dwords, planes)
        rng = np.random.default_rng(21)  # same input both passes
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

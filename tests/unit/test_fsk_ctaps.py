"""Complex-taps fused FSK kernel vs the runtime-mix fused kernel
(interpret mode). The ctaps form folds the NCO into per-channel complex
taps and restores the mix as one constant add on the discriminator —
same chain semantics, no runtime phase words."""

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.kernels.fsk_ctaps import fsk_demod_ctaps, make_fsk_ctaps_kernel
from srcdsp_tpu.kernels.fsk_fused import fsk_demod_fused, make_fsk_mc_kernel
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone


def _fixture(nch=2, nsym=512, decim=4, sps=8, dev=0.05):
    centers = [0.11 + 0.01 * c for c in range(nch)]
    bits = random_bits(jax.random.PRNGKey(0), (nch, nsym))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb) * np.stack(
        [np.asarray(tone(bb.shape[-1], c)) for c in centers])
    words = np.asarray([freq_to_word(-c) for c in centers], np.uint32)
    return bits, x, words


def test_ctaps_fsk_matches_runtime_mix_kernel():
    nch, decim, sps = 2, 4, 8
    bits, x, words = _fixture(nch=nch, decim=decim, sps=sps)
    taps = lowpass(64, 0.03)

    kf, hist = make_fsk_mc_kernel(taps, decim, nch, sps, out_tile=128,
                                  b_rows=2, interpret=True)
    kg, hist2 = make_fsk_ctaps_kernel(taps, words, decim, sps, out_tile=128,
                                      b_rows=2, interpret=True)
    assert hist == hist2
    blk = 2 * 128 * decim
    n = (x.shape[-1] // blk) * blk
    x = x[:, :n]
    words0 = np.asarray([(-hist * int(w)) % (1 << 32) for w in words],
                        np.uint32)
    xpad = np.concatenate([np.zeros((nch, hist), np.complex64), x], axis=1)
    planes = jnp.asarray(np.stack([xpad.real, xpad.imag], axis=1)
                         .astype(np.float32))

    st_f, (bits_f, soft_f) = fsk_demod_fused(kf, hist, 128, words0, words,
                                             planes, sps)
    st_g, (bits_g, soft_g) = fsk_demod_ctaps(kg, hist, 128, planes, sps)

    # same chain math, reassociated: f32-rounding agreement, same bits
    np.testing.assert_allclose(np.asarray(soft_g), np.asarray(soft_f),
                               atol=1e-4)
    assert np.array_equal(np.asarray(bits_g), np.asarray(bits_f))
    np.testing.assert_allclose(np.asarray(st_g[0]), np.asarray(st_f[0]),
                               rtol=1e-4, atol=1e-3)

    # and the chain decodes the data (lag-searched exact match)
    b = np.asarray(bits)
    r = np.asarray(bits_g)
    for c in range(nch):
        best = 1.0
        for lag in range(-16, 17):
            bs, rs = 16 + max(lag, 0), 16 + max(-lag, 0)
            m = min(b.shape[-1] - bs, r.shape[-1] - rs)
            best = min(best, float(np.mean(b[c, bs:bs + m] != r[c, rs:rs + m])))
        assert best == 0.0, f"channel {c}"


def test_ctaps_fsk_chunked_streaming_bit_exact():
    """Two chunked launches == one launch, bit-exactly: the ctaps kernel
    carries NO phase state, so chunk joins only need the input overlap
    (and each call restarts the one-sample discriminator seam, same as
    fsk_fused)."""
    nch, decim, sps = 2, 4, 8
    _, x, words = _fixture(nch=nch, nsym=1024, decim=decim, sps=sps)
    taps = lowpass(64, 0.03)
    kg, hist = make_fsk_ctaps_kernel(taps, words, decim, sps, out_tile=128,
                                     b_rows=2, interpret=True)
    blk = 2 * 128 * decim
    n = (x.shape[-1] // (2 * blk)) * (2 * blk)
    x = x[:, :n]
    xpad = np.concatenate([np.zeros((nch, hist), np.complex64), x], axis=1)
    planes = np.stack([xpad.real, xpad.imag], axis=1).astype(np.float32)

    d1, st1 = kg(jnp.asarray(planes))

    half = n // 2
    a = planes[:, :, : hist + half]
    b = planes[:, :, half: hist + n]
    da, sta = kg(jnp.asarray(a))
    db, stb = kg(jnp.asarray(b))
    # second-call rows after the per-call seam row are bit-identical
    d2 = np.concatenate([np.asarray(da), np.asarray(db)], axis=1)
    d1 = np.asarray(d1)
    nt_half = d1.shape[1] // 2
    assert np.array_equal(d1[:, :nt_half], d2[:, :nt_half])
    # the seam affects only the first discriminator sample of call 2's
    # first row: everything past row 0 of the second call is identical
    assert np.array_equal(d1[:, nt_half + 1:], d2[:, nt_half + 1:])
    diff = d1[:, nt_half] != d2[:, nt_half]
    assert diff[:, 1:].sum() == 0        # only sample 0 of the seam row


def test_ctaps_fsk_bf16_ingest():
    """bf16-ingest variant: bits match the f32-ingest kernel on the clean
    modulated fixture (input quantization ~40 dB — far above the
    discriminator's decision margin)."""
    nch, decim, sps = 2, 4, 8
    bits, x, words = _fixture(nch=nch, decim=decim, sps=sps)
    taps = lowpass(64, 0.03)
    kf, hist = make_fsk_ctaps_kernel(taps, words, decim, sps, out_tile=128,
                                     b_rows=2, interpret=True)
    kb, _ = make_fsk_ctaps_kernel(taps, words, decim, sps, out_tile=128,
                                  b_rows=2, in_dtype=jnp.bfloat16,
                                  interpret=True)
    blk = 2 * 128 * decim
    n = (x.shape[-1] // blk) * blk
    xpad = np.concatenate([np.zeros((nch, hist), np.complex64),
                           x[:, :n]], axis=1)
    planes = jnp.asarray(np.stack([xpad.real, xpad.imag], axis=1)
                         .astype(np.float32))
    _, (bits_f, soft_f) = fsk_demod_ctaps(kf, hist, 128, planes, sps)
    _, (bits_b, soft_b) = fsk_demod_ctaps(
        kb, hist, 128, planes.astype(jnp.bfloat16), sps)
    agree = float(np.mean(np.asarray(bits_f) == np.asarray(bits_b)))
    assert agree == 1.0, f"bf16-ingest bit agreement {agree}"
    np.testing.assert_allclose(np.asarray(soft_b), np.asarray(soft_f),
                               atol=5e-2)


def test_ctaps_stream_driver_matches_oneshot():
    """FskCtapsStream chunked == one-shot wrapper on the same capture
    (bits equal everywhere except the documented per-call seam row)."""
    from srcdsp_tpu.kernels.fsk_ctaps import FskCtapsStream

    nch, decim, sps = 2, 4, 8
    bits, x, words = _fixture(nch=nch, nsym=1024, decim=decim, sps=sps)
    taps = lowpass(64, 0.03)
    kg, hist = make_fsk_ctaps_kernel(taps, words, decim, sps, out_tile=128,
                                     b_rows=2, interpret=True)
    blk = 2 * 128 * decim
    n = (x.shape[-1] // (2 * blk)) * (2 * blk)
    xpad = np.concatenate([np.zeros((nch, hist), np.complex64),
                           x[:, :n]], axis=1)
    planes = np.stack([xpad.real, xpad.imag], axis=1).astype(np.float32)
    _, (bits_1, soft_1) = fsk_demod_ctaps(kg, hist, 128,
                                          jnp.asarray(planes), sps)

    stream = FskCtapsStream(taps, words, decim, sps, nch, out_tile=128,
                            b_rows=2, class_major=False, interpret=True)
    raw = planes[:, :, hist:]
    half = n // 2
    outs = [stream.process(jnp.asarray(raw[:, :, :half])),
            stream.process(jnp.asarray(raw[:, :, half:]))]
    bits_2 = np.concatenate([np.asarray(o[0]) for o in outs], axis=-1)
    agree = float(np.mean(np.asarray(bits_1) == bits_2))
    assert agree > 0.999, agree      # only the seam-row sample may differ

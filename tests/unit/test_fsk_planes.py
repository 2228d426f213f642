"""On-chip-form FSK pipeline vs the complex-path chain (config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.fsk_planes import fsk_demod_planes, make_timing_tone
from srcdsp_tpu.kernels.mixfir import make_mix_fir_kernel_mc
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import fsk_baseband, random_bits, tone


def _ber(b, r, settle=16):
    best = 1.0
    for lag in range(-16, 17):
        bs, rs = settle + max(lag, 0), settle + max(-lag, 0)
        n = min(len(b) - bs, len(r) - rs)
        if n <= 0:
            continue
        best = min(best, float(np.mean(b[bs:bs + n] != r[rs:rs + n])))
    return best


def test_fsk_planes_clean_ber_zero():
    nch, nsym = 4, 512
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    in_sps = decim * sps
    bits = random_bits(jax.random.PRNGKey(0), (nch, nsym))
    bb = fsk_baseband(bits, in_sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))

    taps = lowpass(64, 0.03)
    k = make_mix_fir_kernel_mc(taps, decim, nch, out_tile=128, b_rows=8,
                               interpret=True)
    n = x.shape[-1]
    blk = k.block_in()
    nuse = (n // blk) * blk
    x = x[:, :nuse]
    word = int(freq_to_word(-center))
    words = np.full(nch, word, np.uint32)
    words0 = np.full(nch, (-k.hist * word) % (1 << 32), np.uint32)
    xpad = np.concatenate(
        [np.zeros((nch, k.hist), np.complex64), x], axis=1)
    planes = jnp.asarray(
        np.stack([xpad.real, xpad.imag], axis=1).astype(np.float32))

    kk = nuse // decim
    tc, ts = make_timing_tone(kk, sps)
    st, (rx, soft) = fsk_demod_planes(
        k, words0, words, planes, sps, jnp.asarray(tc), jnp.asarray(ts))
    rx = np.asarray(rx)
    b = np.asarray(bits)
    for c in range(nch):
        assert _ber(b[c], rx[c]) == 0.0, f"channel {c}"


def test_fsk_planes_stream_bit_identical_to_oneshot():
    from srcdsp_tpu.chains.fsk_planes import FskPlanesStream
    nch = 2
    decim, sps, dev, center = 4, 8, 0.05, 0.11
    bits = random_bits(jax.random.PRNGKey(3), (nch, 512))
    bb = fsk_baseband(bits, decim * sps, dev / decim)
    x = np.asarray(bb * tone(bb.shape[-1], center))
    taps = lowpass(64, 0.03)
    k = make_mix_fir_kernel_mc(taps, decim, nch, out_tile=128, b_rows=2,
                               interpret=True)
    blk = k.block_in()
    n = (x.shape[-1] // (2 * blk)) * 2 * blk
    x = x[:, :n]
    word = int(freq_to_word(-center))
    dwords = np.full(nch, word, np.uint32)
    kk = n // decim
    from srcdsp_tpu.chains.fsk_planes import fsk_demod_planes
    tc_full, ts_full = make_timing_tone(kk, sps)
    # one-shot
    words0 = np.full(nch, (-k.hist * word) % (1 << 32), np.uint32)
    xpad = np.concatenate([np.zeros((nch, k.hist), np.complex64), x], axis=1)
    planes = jnp.asarray(np.stack([xpad.real, xpad.imag], axis=1).astype(np.float32))
    _, (b1, s1) = fsk_demod_planes(k, words0, dwords, planes, sps,
                                   jnp.asarray(tc_full), jnp.asarray(ts_full))
    # streamed in 2 chunks
    half = n // 2
    tc, ts = make_timing_tone(half // decim, sps)
    stream = FskPlanesStream(k, dwords, sps, jnp.asarray(tc), jnp.asarray(ts), nch)
    raw = jnp.asarray(np.stack([x.real, x.imag], axis=1).astype(np.float32))
    b_a, s_a = stream.process(raw[..., :half])
    b_b, s_b = stream.process(raw[..., half:])
    got_soft = np.concatenate([np.asarray(s_a), np.asarray(s_b)], axis=-1)
    # soft values equal except where the per-chunk tau schedule differs;
    # bits must agree almost everywhere (clean capture)
    b_stream = np.concatenate([np.asarray(b_a), np.asarray(b_b)], axis=-1)
    agree = np.mean(b_stream == np.asarray(b1))
    assert agree > 0.99, f"bit agreement {agree}"

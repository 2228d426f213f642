"""Fused overlap-save FFT-conv kernel vs the XLA plane path (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.fftconv_pallas import (
    fftconv_pallas, make_fftconv_kernel)
from srcdsp_tpu.ops.fftconv_planes import make_fftconv_planes
from srcdsp_tpu.ops.window import lowpass


def _snr_db(ref, got):
    err = ref - got
    return 10 * np.log10(np.mean(np.abs(ref) ** 2)
                         / (np.mean(np.abs(err) ** 2) + 1e-30))


@pytest.mark.parametrize("channels,num_taps,fft", [(1, 1024, 4096),
                                                   (4, 1024, 4096),
                                                   (2, 200, 2048)])
def test_matches_plane_path(channels, num_taps, fft):
    taps = lowpass(num_taps, 0.1)
    k = make_fftconv_kernel(taps, fft, num_channels=channels, b_frames=2,
                            interpret=True)
    n = 2 * k.block_in()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((channels, 2, k.overlap + n)).astype(np.float32)
    # stream starts from rest: zero history
    x[:, :, :k.overlap] = 0.0
    yr, yi = fftconv_pallas(k, jnp.asarray(x))

    ref_fn, hop = make_fftconv_planes(taps, fft)
    ov_ref = fft - hop
    for c in range(channels):
        xr = jnp.asarray(np.concatenate(
            [np.zeros(ov_ref, np.float32), x[c, 0, k.overlap:]]))
        xi = jnp.asarray(np.concatenate(
            [np.zeros(ov_ref, np.float32), x[c, 1, k.overlap:]]))
        rr, ri = ref_fn(xr, xi)
        ref = np.asarray(rr) + 1j * np.asarray(ri)
        got = np.asarray(yr[c]) + 1j * np.asarray(yi[c])
        assert _snr_db(ref, got) > 100, f"channel {c}"


def test_streaming_chunks_bit_identical():
    """Two chunks with carried overlap == one-shot, bit-exact (frames are
    identical, so even float arithmetic matches exactly)."""
    taps = lowpass(256, 0.2)
    k = make_fftconv_kernel(taps, 2048, num_channels=1, b_frames=2,
                            interpret=True)
    n = 4 * k.block_in()
    rng = np.random.default_rng(1)
    raw = rng.standard_normal((1, 2, n)).astype(np.float32)
    pad = np.zeros((1, 2, k.overlap), np.float32)
    full = np.concatenate([pad, raw], axis=-1)
    yr, yi = fftconv_pallas(k, jnp.asarray(full))

    half = n // 2
    c1 = np.concatenate([pad, raw[:, :, :half]], axis=-1)
    y1r, y1i = fftconv_pallas(k, jnp.asarray(c1))
    c2 = full[:, :, half:half + k.overlap + half]  # carried tail + chunk 2
    y2r, y2i = fftconv_pallas(k, jnp.asarray(c2))

    np.testing.assert_array_equal(np.asarray(yr),
                                  np.concatenate([y1r, y2r], axis=-1))
    np.testing.assert_array_equal(np.asarray(yi),
                                  np.concatenate([y1i, y2i], axis=-1))


def test_hop_beats_plane_path_for_1024_taps():
    """The kernel's row-aligned hop (3072) exceeds the plane path's
    power-of-two hop (2048) at 1024 taps: 1/3 fewer frames per sample."""
    taps = lowpass(1024, 0.1)
    k = make_fftconv_kernel(taps, 4096, interpret=True)
    assert k.hop == 3072 and k.overlap == 1024
    _, hop_ref = make_fftconv_planes(taps, 4096)
    assert hop_ref == 2048


def test_per_channel_taps():
    """[C, T] taps: each channel filtered by its own response, matching
    per-channel plane-path runs (the reference's per-channel objects)."""
    channels, fft = 3, 2048
    taps = np.stack([lowpass(200, 0.05 * (c + 1)) for c in range(channels)])
    k = make_fftconv_kernel(taps, fft, num_channels=channels, b_frames=2,
                            interpret=True)
    n = 2 * k.block_in()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((channels, 2, k.overlap + n)).astype(np.float32)
    x[:, :, :k.overlap] = 0.0
    yr, yi = fftconv_pallas(k, jnp.asarray(x))
    for c in range(channels):
        ref_fn, hop = make_fftconv_planes(taps[c], fft)
        ov = fft - hop
        xr = jnp.asarray(np.concatenate(
            [np.zeros(ov, np.float32), x[c, 0, k.overlap:]]))
        xi = jnp.asarray(np.concatenate(
            [np.zeros(ov, np.float32), x[c, 1, k.overlap:]]))
        rr, ri = ref_fn(xr, xi)
        ref = np.asarray(rr) + 1j * np.asarray(ri)
        got = np.asarray(yr[c]) + 1j * np.asarray(yi[c])
        assert _snr_db(ref, got) > 100, f"channel {c}"


def test_stream_class_bit_identical():
    from srcdsp_tpu.kernels.fftconv_pallas import FftConvStream

    taps = lowpass(256, 0.2)
    k = make_fftconv_kernel(taps, 2048, num_channels=2, b_frames=2,
                            interpret=True)
    n = 4 * k.block_in()
    rng = np.random.default_rng(3)
    raw = rng.standard_normal((2, 2, n)).astype(np.float32)
    pad = np.zeros((2, 2, k.overlap), np.float32)
    yr, yi = fftconv_pallas(k, jnp.asarray(np.concatenate([pad, raw], -1)))

    st = FftConvStream(k)
    half = n // 2
    r1, i1 = st.process(jnp.asarray(raw[:, :, :half]))
    r2, i2 = st.process(jnp.asarray(raw[:, :, half:]))
    np.testing.assert_array_equal(np.asarray(yr),
                                  np.concatenate([r1, r2], axis=-1))
    np.testing.assert_array_equal(np.asarray(yi),
                                  np.concatenate([i1, i2], axis=-1))


def test_pipelined_bit_identical_to_manual_dma():
    """The dual-BlockSpec pipelined form computes the exact same slab as
    the manual blocking-DMA form: outputs must be BIT-identical (same
    frames, same matmuls — only the HBM->VMEM staging differs)."""
    taps = lowpass(1024, 0.1)
    rng = np.random.default_rng(7)
    for kara in (False, True):
        km = make_fftconv_kernel(taps, 4096, num_channels=2, b_frames=2,
                                 karatsuba=kara, pipelined=False,
                                 interpret=True)
        kp = make_fftconv_kernel(taps, 4096, num_channels=2, b_frames=2,
                                 karatsuba=kara, pipelined=True,
                                 interpret=True)
        n = 3 * km.block_in()
        x = jnp.asarray(rng.standard_normal(
            (2, 2, km.overlap + n)).astype(np.float32))
        ym = fftconv_pallas(km, x)
        yp = fftconv_pallas(kp, x)
        for a, b in zip(ym, yp):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_divisibility_gate():
    """taps=2800 @ fft=4096 gives ov_rows=24, hs=8; b_frames=1 -> bh=8,
    not a multiple of ov_rows: pipelined=True must raise, auto must fall
    back to the manual-DMA form and still match the plane path."""
    taps = lowpass(2800, 0.05)
    with pytest.raises(ValueError, match="pipelined"):
        make_fftconv_kernel(taps, 4096, b_frames=1, pipelined=True,
                            interpret=True)
    k = make_fftconv_kernel(taps, 4096, b_frames=1, interpret=True)
    assert k.overlap == 24 * 128 and k.hop == 8 * 128
    n = 4 * k.block_in()   # 4096: also a multiple of the ref path's hop
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 2, k.overlap + n)).astype(np.float32)
    x[:, :, :k.overlap] = 0.0
    yr, yi = fftconv_pallas(k, jnp.asarray(x))
    ref_fn, hop = make_fftconv_planes(taps, 8192)
    ov = 8192 - hop
    xr = jnp.asarray(np.concatenate(
        [np.zeros(ov, np.float32), x[0, 0, k.overlap:]]))
    xi = jnp.asarray(np.concatenate(
        [np.zeros(ov, np.float32), x[0, 1, k.overlap:]]))
    rr, ri = ref_fn(xr, xi)
    ref = (np.asarray(rr) + 1j * np.asarray(ri))[:n]
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    assert _snr_db(ref, got) > 100


def test_karatsuba_matches_combined():
    """3-matmul (Gauss) lane-stage form == combined 2x2 block form to f32
    rounding, at both precisions (same frames, same math — only the
    complex-multiply factorization differs)."""
    taps = lowpass(1024, 0.1)
    rng = np.random.default_rng(3)
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        k0 = make_fftconv_kernel(taps, 4096, num_channels=2, b_frames=2,
                                 precision=prec, interpret=True)
        k1 = make_fftconv_kernel(taps, 4096, num_channels=2, b_frames=2,
                                 precision=prec, karatsuba=True,
                                 interpret=True)
        n = 2 * k0.block_in()
        x = jnp.asarray(rng.standard_normal(
            (2, 2, k0.overlap + n)).astype(np.float32))
        y0 = fftconv_pallas(k0, x)
        y1 = fftconv_pallas(k1, x)
        for a, b in zip(y0, y1):
            assert _snr_db(np.asarray(a), np.asarray(b)) > 120

"""Pre-framed complex-taps resampler kernel (round-5 config-2 transfer
of the window-copy result): agrees with the fused mix+resample kernel
to f32 rounding on the same stream, and chunked serving (advancing the
phase word by whole row blocks) is bit-exact vs one-shot."""

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.kernels.mixfir_preframed import frame_planes
from srcdsp_tpu.kernels.resample_pallas import (make_mix_resample_kernel,
                                                mix_resample_pallas)
from srcdsp_tpu.kernels.resample_preframed import (
    make_resample_preframed_kernel)
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass


def _fixture(t=40, up=3, down=4, out_tile=96, block_cols=48, b_rows=2,
             blocks=3, seed=0):
    taps = lowpass(t, 0.2)
    word = int(freq_to_word(0.0817))
    fn, hist, stride, span = make_resample_preframed_kernel(
        taps, word, up, down, out_tile=out_tile, b_rows=b_rows,
        block_cols=block_cols, interpret=True)
    n = blocks * b_rows * stride
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((2, hist + n)).astype(np.float32)
    word0 = (-hist * word) % (1 << 32)
    return (taps, word, up, down, out_tile, block_cols, b_rows,
            fn, hist, stride, span, planes, word0)


def _w0(word0):
    return jnp.asarray(np.asarray([[word0]], np.uint32).view(np.int32))


def test_preframed_resample_matches_fused_kernel():
    (taps, word, up, down, out_tile, block_cols, b_rows,
     fn, hist, stride, span, planes, word0) = _fixture()
    kf = make_mix_resample_kernel(taps, up=up, down=down,
                                  out_tile=out_tile, b_rows=b_rows,
                                  block_cols=block_cols, interpret=True)
    assert kf.hist == hist
    yr_ref, yi_ref = mix_resample_pallas(kf, word0, word,
                                         jnp.asarray(planes))
    ref = np.asarray(yr_ref).ravel() + 1j * np.asarray(yi_ref).ravel()

    fr = frame_planes(jnp.asarray(planes), stride, span)
    yr, yi = fn(_w0(word0), fr[0], fr[1])
    got = np.asarray(yr).ravel() + 1j * np.asarray(yi).ravel()
    err = got - ref
    snr = 10 * np.log10(np.mean(np.abs(ref) ** 2)
                        / max(np.mean(np.abs(err) ** 2), 1e-300))
    assert snr > 100.0, snr


def test_preframed_resample_chunked_bitexact():
    (_, word, _, _, out_tile, _, b_rows,
     fn, hist, stride, span, planes, word0) = _fixture(blocks=4)
    fr = frame_planes(jnp.asarray(planes), stride, span)
    yr1, yi1 = fn(_w0(word0), fr[0], fr[1])

    nt = fr.shape[1]
    cut = 2 * b_rows                     # whole row-block boundary
    parts = []
    for lo, hi in ((0, cut), (cut, nt)):
        w0c = (word0 + lo * stride * word) % (1 << 32)
        yr, yi = fn(_w0(w0c), fr[0, lo:hi], fr[1, lo:hi])
        parts.append((np.asarray(yr), np.asarray(yi)))
    yr2 = np.concatenate([p[0] for p in parts])
    yi2 = np.concatenate([p[1] for p in parts])
    np.testing.assert_array_equal(np.asarray(yr1), yr2)
    np.testing.assert_array_equal(np.asarray(yi1), yi2)

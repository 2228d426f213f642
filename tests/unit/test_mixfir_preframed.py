"""Pre-framed ctaps kernel (round-5 framing experiment #4): frames from
frame_planes / the on-chip frame kernel are the true strided windows,
and the pure-matmul kernel is bit-identical to the fused ctaps kernel
on the same stream."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.mixfir_ctaps import (make_mix_fir_ctaps_kernel,
                                             mix_fir_ctaps_pallas)
from srcdsp_tpu.kernels.mixfir_preframed import (frame_planes,
                                                 make_ctaps_preframed_kernel,
                                                 make_frame_kernel)
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass


def _fixture(t=64, m=4, out_tile=128, b_rows=2, blocks=3, seed=0):
    taps = lowpass(t, 0.4 / m)
    word = int(freq_to_word(0.1743))
    k = make_mix_fir_ctaps_kernel(taps, word, m, out_tile=out_tile,
                                  b_rows=b_rows, interpret=True)
    n = blocks * k.block_in()
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((2, k.hist + n)).astype(np.float32)
    word0 = (-k.hist * word) % (1 << 32)
    return taps, word, k, planes, word0, m, out_tile, b_rows


def test_frame_planes_are_strided_windows():
    _, _, k, planes, _, m, out_tile, b_rows = _fixture()
    stride = out_tile * m
    span = stride + k.hist
    fr = np.asarray(frame_planes(jnp.asarray(planes), stride, span))
    n = planes.shape[-1] - k.hist
    for j in range(n // stride):
        np.testing.assert_array_equal(
            fr[:, j], planes[:, j * stride: j * stride + span])


def test_preframed_kernel_bitexact_vs_fused():
    taps, word, k, planes, word0, m, out_tile, b_rows = _fixture()
    yr_ref, yi_ref = mix_fir_ctaps_pallas(k, word0, jnp.asarray(planes))
    fn, hist, stride, span = make_ctaps_preframed_kernel(
        taps, word, m, out_tile=out_tile, b_rows=b_rows, interpret=True)
    fr = frame_planes(jnp.asarray(planes), stride, span)
    w0 = jnp.asarray(
        np.asarray([[word0]], np.uint32).view(np.int32))
    yr, yi = fn(w0, fr[0], fr[1])
    np.testing.assert_array_equal(np.asarray(yr).ravel(),
                                  np.asarray(yr_ref).ravel())
    np.testing.assert_array_equal(np.asarray(yi).ravel(),
                                  np.asarray(yi_ref).ravel())


def test_frame_kernel_matches_frame_planes():
    _, _, k, planes, _, m, out_tile, b_rows = _fixture()
    stride = out_tile * m
    span = stride + k.hist
    ref = np.asarray(frame_planes(jnp.asarray(planes), stride, span))
    fk = make_frame_kernel(stride, span, b_rows=b_rows, interpret=True)
    xr_f, xi_f = fk(jnp.asarray(planes))
    np.testing.assert_array_equal(np.asarray(xr_f), ref[0])
    np.testing.assert_array_equal(np.asarray(xi_f), ref[1])

"""Pre-framed FSK ctaps kernel: bit-identical to kernels/fsk_ctaps on
the same underlying stream (window source is the only difference)."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.fsk_ctaps import (fsk_demod_ctaps,
                                          make_fsk_ctaps_kernel)
from srcdsp_tpu.kernels.fsk_preframed import (fsk_demod_preframed,
                                              make_fsk_preframed_kernel)
from srcdsp_tpu.kernels.mixfir_preframed import frame_planes
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass


def test_fsk_preframed_bitexact_vs_ctaps():
    nch, decim, sps = 3, 4, 8
    out_tile, b_rows = 128, 2
    taps = lowpass(64, 0.03)
    words = np.asarray([freq_to_word(-0.05 - 0.01 * c)
                        for c in range(nch)], np.uint32)
    fn_a, hist = make_fsk_ctaps_kernel(
        taps, words, decim, sps, out_tile=out_tile, b_rows=b_rows,
        interpret=True)
    fn_b, hist_b, stride, span = make_fsk_preframed_kernel(
        taps, words, decim, sps, out_tile=out_tile, b_rows=b_rows,
        interpret=True)
    assert hist == hist_b
    n = 3 * b_rows * out_tile * decim
    rng = np.random.default_rng(0)
    planes = rng.standard_normal((nch, 2, hist + n)).astype(np.float32)

    st_a, (bits_a, soft_a) = fsk_demod_ctaps(
        fn_a, hist, out_tile, jnp.asarray(planes), sps)
    fr = frame_planes(jnp.asarray(planes), stride, span)
    st_b, (bits_b, soft_b) = fsk_demod_preframed(
        fn_b, out_tile, fr[:, 0], fr[:, 1], sps)
    np.testing.assert_array_equal(np.asarray(bits_a), np.asarray(bits_b))
    np.testing.assert_array_equal(np.asarray(soft_a), np.asarray(soft_b))
    for a, b in zip(st_a, st_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

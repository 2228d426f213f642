"""Native ingest framer (cpp/ingest + io/framer.py): frames bit-exact
vs frame_planes on the converted stream; bf16 rounding bit-exact vs
jnp.astype(bfloat16); geometry errors rejected."""

import numpy as np
import pytest

import jax.numpy as jnp

from srcdsp_tpu.io.framer import frame_ci16, frame_f32
from srcdsp_tpu.kernels.mixfir_preframed import frame_planes


def _fixture(hist=128, stride=1024, nt=7, seed=0):
    rng = np.random.default_rng(seed)
    n_total = hist + nt * stride
    iq = rng.integers(-32768, 32768, (n_total, 2)).astype(np.int16)
    return iq, hist, stride, stride + hist


def test_ci16_f32_matches_frame_planes():
    iq, hist, stride, span = _fixture()
    fr_r, fr_i = frame_ci16(iq, hist, stride, span)
    planes = (iq.astype(np.float32) / 32767.0).T
    ref = np.asarray(frame_planes(jnp.asarray(planes), stride, span))
    np.testing.assert_array_equal(fr_r, ref[0])
    np.testing.assert_array_equal(fr_i, ref[1])


def test_f32_plane_path_matches():
    iq, hist, stride, span = _fixture(seed=1)
    planes = (iq.astype(np.float32) / 32767.0).T.copy()
    fr_r, fr_i = frame_f32(planes, hist, stride, span)
    ref = np.asarray(frame_planes(jnp.asarray(planes), stride, span))
    np.testing.assert_array_equal(fr_r, ref[0])
    np.testing.assert_array_equal(fr_i, ref[1])


def test_bf16_rounding_matches_jax():
    iq, hist, stride, span = _fixture(seed=2)
    fr_r, fr_i = frame_ci16(iq, hist, stride, span, bf16=True)
    planes = (iq.astype(np.float32) / 32767.0).T
    ref = np.asarray(frame_planes(jnp.asarray(planes), stride, span)
                     .astype(jnp.bfloat16)).view(np.uint16)
    np.testing.assert_array_equal(fr_r, ref[0])
    np.testing.assert_array_equal(fr_i, ref[1])


def test_bad_geometry_rejected():
    iq, hist, stride, span = _fixture()
    with pytest.raises(ValueError):
        frame_ci16(iq, hist, stride + 8, span)     # span-stride != hist
    with pytest.raises(ValueError):
        frame_ci16(iq[:-2], hist, stride, span)    # N % stride != 0


def test_threaded_framing_bit_identical():
    iq, hist, stride, span = _fixture(nt=16, seed=3)
    r1, i1 = frame_ci16(iq, hist, stride, span, threads=1)
    r4, i4 = frame_ci16(iq, hist, stride, span, threads=4)
    np.testing.assert_array_equal(r1, r4)
    np.testing.assert_array_equal(i1, i4)
    b1, c1 = frame_ci16(iq, hist, stride, span, bf16=True, threads=1)
    b4, c4 = frame_ci16(iq, hist, stride, span, bf16=True, threads=4)
    np.testing.assert_array_equal(b1, b4)
    np.testing.assert_array_equal(c1, c4)


def test_cu8_ci8_match_capture_conversion():
    from srcdsp_tpu.io.framer import frame_ci8, frame_cu8

    rng = np.random.default_rng(4)
    hist, stride = 128, 1024
    span = stride + hist
    n_total = hist + 5 * stride
    for fmt, fn in (("cu8", frame_cu8), ("ci8", frame_ci8)):
        if fmt == "cu8":
            iq = rng.integers(0, 256, (n_total, 2)).astype(np.uint8)
            f = (iq.astype(np.float32) - np.float32(127.5)) \
                / np.float32(127.5)
        else:
            iq = rng.integers(-128, 128, (n_total, 2)).astype(np.int8)
            f = iq.astype(np.float32) / np.float32(127.0)
        fr_r, fr_i = fn(iq, hist, stride, span)
        ref = np.asarray(frame_planes(jnp.asarray(f.T.copy()),
                                      stride, span))
        np.testing.assert_array_equal(fr_r, ref[0])
        np.testing.assert_array_equal(fr_i, ref[1])
        # threaded bit-identical
        r4, i4 = fn(iq, hist, stride, span, threads=4)
        np.testing.assert_array_equal(fr_r, r4)
        np.testing.assert_array_equal(fr_i, i4)

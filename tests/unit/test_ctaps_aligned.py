"""Aligned-layout complex-taps kernel vs kernels/mixfir_ctaps
(interpret mode): same banded math fed from a block-aligned layout with
no window copies. Column blocks j >= 1 use identical matmul operands, so
those outputs are BIT-identical; block 0's split accumulation matches to
f32 rounding."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.ctaps_aligned import (ctaps_aligned_pallas,
                                              make_ctaps_aligned_kernel)
from srcdsp_tpu.kernels.mixfir_ctaps import (make_mix_fir_ctaps_kernel,
                                             mix_fir_ctaps_pallas)
from srcdsp_tpu.ops.nco import freq_to_word
from srcdsp_tpu.ops.window import lowpass

DECIM = 2
OT, BR, BC = 128, 4, 64


def _kernels(taps, word):
    ko = make_mix_fir_ctaps_kernel(taps, word, DECIM, out_tile=OT,
                                   b_rows=BR, block_cols=BC, interpret=True)
    ka = make_ctaps_aligned_kernel(taps, word, DECIM, out_tile=OT,
                                   b_rows=BR, block_cols=BC, interpret=True)
    return ko, ka


def test_aligned_matches_ctaps_kernel():
    taps = lowpass(64, 0.2)
    word = int(freq_to_word(0.11))
    ko, ka = _kernels(taps, word)
    assert ko.hist == ka.hist
    hist = ka.hist
    n = ka.block_in() * 3
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, hist + n)).astype(np.float32)
    xj = jnp.asarray(x)

    # classic layout: word0 = (pos - hist)*dword with pos = 0
    w0_old = (-hist * word) % (1 << 32)
    yro, yio = mix_fir_ctaps_pallas(ko, w0_old, xj)
    # aligned layout: hist split off, word0 = phase of body sample 0
    yra, yia = ctaps_aligned_pallas(ka, 0, xj[:, :hist], xj[:, hist:])

    yro, yio = np.asarray(yro), np.asarray(yio)
    yra, yia = np.asarray(yra), np.asarray(yia)
    np.testing.assert_allclose(yra, yro, atol=1e-4)
    np.testing.assert_allclose(yia, yio, atol=1e-4)
    # blocks j >= 1 run the identical matmul on identical operands
    m = yro.reshape(-1, OT)[:, BC:]
    a = yra.reshape(-1, OT)[:, BC:]
    assert np.array_equal(a, m), "j>=1 column blocks must be bit-identical"


def test_aligned_chunked_streaming_bit_exact():
    taps = lowpass(64, 0.2)
    word = int(freq_to_word(-0.07))
    _, ka = _kernels(taps, word)
    hist = ka.hist
    blk = ka.block_in()
    n = blk * 4
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n)).astype(np.float32)
    xj = jnp.asarray(x)
    z = jnp.zeros((2, hist), jnp.float32)

    yr1, yi1 = ctaps_aligned_pallas(ka, 0, z, xj)

    half = n // 2
    ya = ctaps_aligned_pallas(ka, 0, z, xj[:, :half])
    w1 = (half * word) % (1 << 32)
    yb = ctaps_aligned_pallas(ka, w1, xj[:, half - hist: half], xj[:, half:])
    yr2 = np.concatenate([np.asarray(ya[0]), np.asarray(yb[0])], axis=1)
    yi2 = np.concatenate([np.asarray(ya[1]), np.asarray(yb[1])], axis=1)
    assert np.array_equal(np.asarray(yr1), yr2)
    assert np.array_equal(np.asarray(yi1), yi2)


def test_aligned_rejects_narrow_blocks():
    import pytest
    taps = lowpass(200, 0.2)   # hist 256 > BC*decim 128
    with pytest.raises(ValueError):
        make_ctaps_aligned_kernel(taps, 123, DECIM, out_tile=OT, b_rows=BR,
                                  block_cols=BC, interpret=True)

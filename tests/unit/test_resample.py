"""Rational L/M resampler vs scipy.resample_poly semantics + block joins."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal as sps

from srcdsp_tpu.ops import resample
from srcdsp_tpu.ops.window import lowpass
from tests.conftest import snr_db


def _rand_iq(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


def _ref_resample(h, x, up, down):
    """float64 reference: y[j] = sum_k h[k] u[j*down - k], u = zero-stuffed x."""
    u = np.zeros(len(x) * up, dtype=np.complex128)
    u[::up] = x
    full = sps.lfilter(h.astype(np.float64), [1.0], u)
    return full[::down][: len(x) * up // down]


@pytest.mark.parametrize("up,down,n", [(3, 4, 4096), (1, 2, 1024), (2, 1, 1024),
                                       (5, 3, 3072), (7, 4, 2048)])
def test_resample_matches_reference(rng, up, down, n):
    h = lowpass(16 * max(up, down) + 1, 0.4 / max(up, down)) * up
    x = _rand_iq(rng, n)
    y = resample.resample_full(h, jnp.asarray(x), up, down)
    ref = _ref_resample(h, x, up, down)
    assert y.shape[-1] == n * up // down
    assert snr_db(ref, np.asarray(y)) > 110.0


@pytest.mark.parametrize("up,down,blocks", [(3, 4, [1024, 512, 2048]),
                                            (2, 3, [768, 768]),
                                            (4, 1, [128, 384, 512])])
def test_resample_block_joins_bit_exact(rng, up, down, blocks):
    h = lowpass(64, 0.2 / max(up, down)) * up
    n = sum(blocks)
    x = _rand_iq(rng, n)

    whole = resample.resample_full(h, jnp.asarray(x), up, down)

    st = resample.resample_init(len(h), up)
    apply_j = jax.jit(lambda s, xb: resample.resample_apply(h, s, xb, up, down))
    outs, off = [], 0
    for b in blocks:
        st, y = apply_j(st, jnp.asarray(x[off:off + b]))
        outs.append(np.asarray(y))
        off += b
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(whole))


def test_resample_rejects_misaligned_block():
    st = resample.resample_init(31, 3)
    with pytest.raises(ValueError):
        resample.resample_apply(np.ones(31, np.float32), st,
                                jnp.zeros(100, jnp.complex64), 3, 7)

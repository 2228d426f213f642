"""On-chip overlap-save FFT conv vs the complex path and the oracle (C6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu import oracle
from srcdsp_tpu.ops.fftconv import fftconv_full
from srcdsp_tpu.ops.fftconv_planes import make_fftconv_planes
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import complex_awgn


@pytest.mark.parametrize("t,f", [(129, 512), (1024, 4096)])
def test_fftconv_planes_matches_complex_path(t, f):
    taps = lowpass(t, 0.1)
    fn, hop = make_fftconv_planes(taps, f)
    n = hop * 8
    x = np.asarray(complex_awgn(jax.random.PRNGKey(t), (n,)))
    overlap = f - hop
    xpad = np.concatenate([np.zeros(overlap, np.complex64), x])
    yr, yi = jax.jit(fn)(jnp.asarray(xpad.real), jnp.asarray(xpad.imag))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = oracle.fir(x, taps)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, f"rel {rel:.2e}"
    ref2 = np.asarray(fftconv_full(jnp.asarray(taps), jnp.asarray(x), f, hop=hop))
    rel2 = np.linalg.norm(got - ref2) / np.linalg.norm(ref2)
    assert rel2 < 1e-4

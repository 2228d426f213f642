"""Four-step MXU FFT vs numpy and the C++ oracle (SURVEY.md C6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu import oracle
from srcdsp_tpu.ops.fft_planes import fft_planes_flops, make_fft_planes


@pytest.mark.parametrize("n,n1", [(64, 8), (256, 16), (1024, 32), (4096, 64),
                                  (512, 16)])
def test_fft_planes_matches_numpy(n, n1):
    fft = make_fft_planes(n, n1)
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    xr, xi = jax.jit(fft)(jnp.asarray(x.real), jnp.asarray(x.imag))
    got = np.asarray(xr) + 1j * np.asarray(xi)
    ref = np.fft.fft(x, axis=-1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, f"rel {rel:.2e}"


def test_fft_planes_matches_oracle():
    n = 1024
    fft = make_fft_planes(n)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    xr, xi = fft(jnp.asarray(x.real)[None], jnp.asarray(x.imag)[None])
    got = (np.asarray(xr) + 1j * np.asarray(xi))[0]
    ref = oracle.fft(x)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5


def test_flops_counter_positive():
    assert fft_planes_flops(16, 4096) > 16 * 4096 * 8

"""On-chip (matmul-form) channelizer vs the complex-path bank (C10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.channelizer import channelize_full, design_prototype
from srcdsp_tpu.ops.channelize_planes import make_channelize_planes
from srcdsp_tpu.testing.signals import complex_awgn


@pytest.mark.parametrize("m,p", [(8, 4), (16, 8), (64, 8)])
def test_matmul_bank_matches_complex_bank(m, p):
    h = design_prototype(m, taps_per_phase=p)
    bank = jax.jit(make_channelize_planes(h, m))
    x = np.asarray(complex_awgn(jax.random.PRNGKey(m), (m * 64,)))
    yr, yi = bank(jnp.asarray(x.real), jnp.asarray(x.imag))
    got = (np.asarray(yr) + 1j * np.asarray(yi)).T        # [M, K]
    ref = np.asarray(channelize_full(h, jnp.asarray(x), m))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, f"rel {rel:.2e}"

"""Pallas BCJR kernel vs the XLA lane-native reference: the kernel
reproduces bcjr_decode_batch / turbo_decode_batch BIT-IDENTICALLY
(same op association incl. the normalized-carry / unnormalized-history
convention — kernels/bcjr_pallas.py docstring)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from srcdsp_tpu.kernels.bcjr_pallas import (make_bcjr_kernel,
                                            turbo_decode_pallas)
from srcdsp_tpu.turbo import (bcjr_decode_batch, make_rsc, make_turbo,
                              turbo_decode_batch, turbo_encode)


def _llrs(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(4.0 * rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("t_len,terminated", [(64, True), (67, True),
                                              (64, False), (61, False)])
def test_kernel_bitexact_vs_batch_reference(t_len, terminated):
    b = 16
    ls = _llrs((t_len, b), 0)
    lp = _llrs((t_len, b), 1)
    la = _llrs((t_len, b), 2)
    code = make_rsc()
    post_ref, ext_ref = bcjr_decode_batch(code, ls, lp, la,
                                          terminated=terminated)
    fn = make_bcjr_kernel(code, t_len, terminated, b_tile=b,
                          interpret=True)
    post = fn(ls + la, lp)
    np.testing.assert_array_equal(np.asarray(post), np.asarray(post_ref))
    np.testing.assert_array_equal(np.asarray(post - (ls + la)),
                                  np.asarray(ext_ref))


def test_turbo_pallas_bitexact_vs_batch():
    t, b, iters = 48, 8, 3
    tc = make_turbo(t, seed=0)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, (b, t))
    sys_b, par1, par2 = jax.vmap(lambda x: turbo_encode(tc, x))(
        jnp.asarray(u))
    sigma = 0.8

    def ch(bits):
        return jnp.asarray(
            2.0 / sigma ** 2 * ((1.0 - 2.0 * np.asarray(bits))
                                + sigma * rng.standard_normal(bits.shape)),
            jnp.float32)

    ls, lp1, lp2 = ch(sys_b), ch(par1), ch(par2)
    bits_ref, post_ref = turbo_decode_batch(tc, ls, lp1, lp2, iters=iters)
    bits, post = turbo_decode_pallas(tc, ls, lp1, lp2, iters=iters,
                                     b_tile=b, interpret=True)
    np.testing.assert_array_equal(np.asarray(post), np.asarray(post_ref))
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits_ref))
    # and it actually decodes at this SNR
    assert float((np.asarray(bits) != u).mean()) < 0.01

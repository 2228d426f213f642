"""Memory-polynomial DPD: basis twin, ILA linearization, streaming, vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.ops.dpd import (dpd_apply, dpd_full, dpd_init,
                                dpd_train_ila, lin_gain_ls, make_dpd_params,
                                mp_basis, mp_num_coeffs, pa_memory_polynomial,
                                pa_saleh)

ORDER, MEM = 5, 3
# A mildly compressive PA with memory: linear gain 1, odd-order terms and
# short memory taps (k-major coefficient layout: k=1 taps, k=3 taps, k=5).
PA_COEFFS = np.array(
    [1.0 + 0.0j, 0.06 - 0.02j, -0.01 + 0.01j,          # k=1, m=0..2
     -0.08 + 0.03j, 0.02 + 0.01j, 0.0 - 0.005j,        # k=3
     0.012 - 0.004j, -0.004j, 0.001 + 0.0j], np.complex64)  # k=5


def _pa(x):
    return pa_memory_polynomial(jnp.asarray(PA_COEFFS), ORDER, MEM, x)


def _signal(key, n, scale=0.6):
    # Band-limited Gaussian drive (OFDM-like envelope statistics).
    xr = jax.random.normal(key, (2, n + 64))
    x = (xr[0] + 1j * xr[1]).astype(jnp.complex64)
    taps = jnp.asarray(np.hamming(33) / np.sum(np.hamming(33)), jnp.complex64)
    x = jnp.convolve(x, taps, mode="valid")[:n]
    return scale * x / jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))


def _nmse_db(ref, y):
    e = jnp.mean(jnp.abs(y - ref) ** 2) / jnp.mean(jnp.abs(ref) ** 2)
    return 10.0 * np.log10(float(e))


def test_basis_matches_sample_loop():
    key = jax.random.PRNGKey(0)
    x = _signal(key, 64)
    b = np.asarray(mp_basis(x, ORDER, MEM))
    assert b.shape == (64, mp_num_coeffs(ORDER, MEM))
    xn = np.asarray(x)
    xh = np.concatenate([np.zeros(MEM - 1, np.complex64), xn])
    col = 0
    for k in range(1, ORDER + 1, 2):
        for m in range(MEM):
            want = np.array([xh[MEM - 1 + n - m]
                             * abs(xh[MEM - 1 + n - m]) ** (k - 1)
                             for n in range(64)], np.complex64)
            np.testing.assert_allclose(b[:, col], want, rtol=2e-5, atol=2e-6)
            col += 1


def test_identity_params_pass_through():
    x = _signal(jax.random.PRNGKey(1), 256)
    y = dpd_full(make_dpd_params(ORDER, MEM), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_ila_linearizes_memory_pa():
    x = _signal(jax.random.PRNGKey(2), 4096)
    params, g = dpd_train_ila(_pa, x, ORDER, MEM, iters=3)
    raw = _nmse_db(lin_gain_ls(x, _pa(x)) * x, _pa(x))
    lin = _nmse_db(g * x, _pa(dpd_full(params, x)))
    assert raw > -35.0            # the PA really is dirty
    assert lin < raw - 20.0       # DPD buys >20 dB NMSE
    assert lin < -55.0


def test_ila_linearizes_saleh():
    # Memoryless Saleh PA with the Gaussian peaks backed off to ~0.5 of
    # the r = 1/sqrt(beta_a) ~ 0.93 AM/AM turnover: past ~0.7 the curve
    # folds over and no polynomial predistorter can invert it (measured:
    # 0.25-scale drive caps the gain at ~3 dB; 0.18 buys >30 dB).
    x = _signal(jax.random.PRNGKey(3), 4096, scale=0.18)
    pa = lambda z: pa_saleh(z)
    params, g = dpd_train_ila(pa, x, order=7, memory=1, iters=3)
    raw = _nmse_db(lin_gain_ls(x, pa(x)) * x, pa(x))
    lin = _nmse_db(g * x, pa(dpd_full(params, x)))
    assert lin < raw - 25.0


def test_streaming_matches_oneshot_bit_exact():
    x = _signal(jax.random.PRNGKey(4), 1024)
    params, _ = dpd_train_ila(_pa, x, ORDER, MEM, iters=2)
    whole = np.asarray(dpd_full(params, x))
    st = dpd_init(params)
    outs = []
    for blk in jnp.split(x, [128, 384, 640]):
        st, y = dpd_apply(params, st, blk)
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs), whole)


def test_vmap_channels():
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    xs = jnp.stack([_signal(k, 512) for k in keys])
    params, _ = dpd_train_ila(_pa, xs[0], ORDER, MEM, iters=2)
    batched = jax.vmap(lambda x: dpd_full(params, x))(xs)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(dpd_full(params, xs[i])))


def test_saleh_compresses():
    r = jnp.linspace(0.05, 1.5, 32).astype(jnp.complex64)
    g = np.asarray(jnp.abs(pa_saleh(r)) / jnp.abs(r))
    assert g[0] > g[-1] * 1.5     # AM/AM gain falls with drive


def test_param_validation():
    with pytest.raises(ValueError):
        make_dpd_params(4, 2)     # even order
    with pytest.raises(ValueError):
        make_dpd_params(3, 0)     # no taps
    with pytest.raises(ValueError):
        make_dpd_params(3, 2, coeffs=jnp.zeros(5, jnp.complex64))

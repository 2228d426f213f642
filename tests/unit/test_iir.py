"""Block state-space IIR vs scipy/sequential twins and streaming property."""

import numpy as np
import pytest
import scipy.signal as sig

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.iir import (dc_block_coeffs, iir_apply, iir_full,
                                iir_init, make_iir_params, make_sos_params,
                                np_iir_full, sos_apply, sos_init)


def _snr_db(ref, got):
    err = np.asarray(ref) - np.asarray(got)
    return 10 * np.log10(np.mean(np.abs(ref) ** 2)
                         / (np.mean(np.abs(err) ** 2) + 1e-30))


def _noise(n, seed=0, complex_=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    if complex_:
        x = x + 1j * rng.standard_normal(n)
        return x.astype(np.complex64)
    return x.astype(np.float32)


@pytest.mark.parametrize("order,cutoff", [(2, 0.1), (4, 0.25), (6, 0.4)])
def test_matches_scipy_lfilter(order, cutoff):
    b, a = sig.butter(order, cutoff)
    params = make_iir_params(b, a, block=128)
    x = _noise(4096, seed=order)
    got = iir_full(params, jnp.asarray(x))
    ref = sig.lfilter(b, a, x.astype(np.complex128))
    assert _snr_db(ref, got) > 80


def test_matches_sequential_twin():
    b, a = sig.butter(4, 0.2)
    x = _noise(2048, seed=1)
    ref = np_iir_full(b, a, x.astype(np.complex128))
    scipy_ref = sig.lfilter(b, a, x.astype(np.complex128))
    assert _snr_db(scipy_ref, ref) > 120      # twin agrees with scipy
    got = iir_full(make_iir_params(b, a), jnp.asarray(x))
    assert _snr_db(ref, got) > 80


def test_streaming_matches_oneshot():
    b, a = sig.butter(3, 0.15)
    params = make_iir_params(b, a, block=64)
    x = _noise(4096, seed=2)
    whole = iir_full(params, jnp.asarray(x))
    st = iir_init(params)
    outs = []
    for i in range(0, 4096, 1024):
        st, y = iir_apply(params, st, jnp.asarray(x[i:i + 1024]))
        outs.append(np.asarray(y))
    assert _snr_db(np.asarray(whole), np.concatenate(outs)) > 90


def test_dc_block_removes_dc():
    b, a = dc_block_coeffs(0.995)
    params = make_iir_params(b, a, block=128)
    x = (_noise(8192, seed=3) + (2.0 - 1.0j)).astype(np.complex64)
    y = np.asarray(iir_full(params, jnp.asarray(x)))
    # steady-state mean collapses (skip the transient)
    assert abs(np.mean(y[2048:])) < 0.02
    ref = sig.lfilter(b, a, x.astype(np.complex128))
    assert _snr_db(ref, y) > 80


def test_sos_cascade_matches_scipy():
    sos = sig.butter(6, 0.3, output="sos")
    params = make_sos_params(sos, block=128)
    x = _noise(4096, seed=4)
    states = sos_init(params)
    _, got = sos_apply(params, states, jnp.asarray(x))
    ref = sig.sosfilt(sos, x.astype(np.complex128))
    assert _snr_db(ref, got) > 80


def test_multichannel_leading_axes():
    b, a = sig.butter(2, 0.2)
    params = make_iir_params(b, a, block=128)
    x = np.stack([_noise(1024, seed=10), _noise(1024, seed=11)])
    got = iir_full(params, jnp.asarray(x))
    for c in range(2):
        ref = sig.lfilter(b, a, x[c].astype(np.complex128))
        assert _snr_db(ref, np.asarray(got)[c]) > 80


def test_real_input():
    b, a = sig.butter(4, 0.2)
    params = make_iir_params(b, a)
    x = _noise(2048, seed=5, complex_=False)
    got = iir_full(params, jnp.asarray(x))
    ref = sig.lfilter(b, a, x.astype(np.float64))
    assert _snr_db(ref, got) > 80


def test_unstable_rejected():
    with pytest.raises(ValueError):
        make_iir_params([1.0], [1.0, -1.01])


def test_block_mismatch_rejected():
    params = make_iir_params(*sig.butter(2, 0.2), block=128)
    with pytest.raises(ValueError):
        iir_apply(params, iir_init(params), jnp.zeros(100, jnp.complex64))


def test_jit_and_scan_compatible():
    """State pytree threads through lax.scan (the streaming pattern)."""
    b, a = sig.butter(2, 0.25)
    params = make_iir_params(b, a, block=128)
    x = _noise(4096, seed=6)
    blocks = jnp.asarray(x.reshape(4, 1024))

    @jax.jit
    def run(s0, xs):
        def step(s, xb):
            s2, y = iir_apply(params, s, xb)
            return s2, y
        return jax.lax.scan(step, s0, xs)

    _, ys = run(iir_init(params), blocks)
    ref = sig.lfilter(b, a, x.astype(np.complex128))
    assert _snr_db(ref, np.asarray(ys).reshape(-1)) > 80


def test_vs_cpp_oracle_streaming():
    """JAX block path vs the C++ DF2T oracle, including carried state."""
    from srcdsp_tpu import oracle
    b, a = sig.butter(4, 0.2)
    params = make_iir_params(b, a, block=128)
    x = _noise(4096, seed=7)
    st = iir_init(params)
    z = None
    for i in range(0, 4096, 2048):
        blk = x[i:i + 2048]
        st, y = iir_apply(params, st, jnp.asarray(blk))
        ref, z = oracle.iir_stream(blk, b, a, z)
        assert _snr_db(ref.astype(np.complex128), np.asarray(y)) > 80


def test_scan_form_matches_assoc_form():
    # inter_block="scan" is the axon on-chip form (lax.scan lowers there,
    # associative_scan doesn't); both are the same affine recurrence in a
    # different association order
    import scipy.signal as ss
    b, a = ss.butter(4, 0.2)
    p = make_iir_params(b, a, block=128)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((3, 1024))
                    + 1j * rng.standard_normal((3, 1024)), jnp.complex64)
    st = iir_init(p, (3,))
    st1, y1 = iir_apply(p, st, x)
    st2, y2 = iir_apply(p, st, x, inter_block="scan")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st1.s), np.asarray(st2.s),
                               rtol=0, atol=1e-4)
    with pytest.raises(ValueError):
        iir_apply(p, st, x, inter_block="nope")

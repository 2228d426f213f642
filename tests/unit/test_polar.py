"""Polar codes (polar.py): construction, kron-power encode twin, SC
decoding under AWGN, batch vmap."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.polar import make_polar, polar_decode, polar_encode


def _kron_g(n):
    f = np.array([[1, 0], [1, 1]])
    g = np.array([[1]])
    while g.shape[0] < n:
        g = np.kron(f, g)
    return g


def test_construction_and_encode_twin():
    code = make_polar(64, 32)
    assert code.frozen.sum() == 32 and code.data_pos.size == 32
    # the most reliable synthetic channel (index N-1) always carries data
    assert not code.frozen[63]
    assert code.frozen[0]                       # the worst is frozen
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (4, 32))
    x = np.asarray(polar_encode(code, jnp.asarray(u)))
    ufull = np.zeros((4, 64), int)
    ufull[:, code.data_pos] = u
    np.testing.assert_array_equal(x, (ufull @ _kron_g(64)) % 2)


def test_clean_roundtrip():
    code = make_polar(128, 64)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, 64)
    x = np.asarray(polar_encode(code, jnp.asarray(u)))
    info, uhat = jax.jit(lambda l: polar_decode(code, l))(
        jnp.asarray(4.0 * (1 - 2.0 * x), jnp.float32))
    np.testing.assert_array_equal(np.asarray(info), u)
    # frozen positions decode to 0 by construction
    assert np.asarray(uhat)[code.frozen].sum() == 0


def test_sc_corrects_awgn():
    """Polar(256,128) SC at 2.5 dB Eb/N0: hard decisions carry errors on
    every block, SC decodes most blocks exactly."""
    code = make_polar(256, 128)
    rate = code.k / code.n
    rng = np.random.default_rng(2)
    nblk = 32
    u = rng.integers(0, 2, (nblk, code.k))
    x = np.asarray(polar_encode(code, jnp.asarray(u))).astype(np.float64)
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (2.5 / 10)))
    y = (1 - 2 * x) + sigma * rng.standard_normal(x.shape)
    hard_errs = int(((y < 0) != (x > 0.5)).sum())
    assert hard_errs > nblk              # channel noisy on every block
    llr = jnp.asarray(2 / sigma ** 2 * y, jnp.float32)
    dec = jax.jit(jax.vmap(lambda l: polar_decode(code, l)))
    info, _ = dec(llr)
    ok_blocks = int((np.asarray(info) == u).all(axis=-1).sum())
    assert ok_blocks >= int(0.8 * nblk), ok_blocks


def test_invalid_params_raise():
    import pytest
    with pytest.raises(ValueError):
        make_polar(100, 50)              # not a power of two
    with pytest.raises(ValueError):
        make_polar(64, 64)

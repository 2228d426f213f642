"""Reed-Solomon codec vs a per-symbol reference twin (srcdsp_tpu.rs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcdsp_tpu.rs import (
    _EXP, _LOG, _gf_mul, make_rs_code, rs_decode, rs_encode,
)


def _gf_mul_slow(a: int, b: int, prim: int = 0x11D) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= prim
        b >>= 1
    return r


def _poly_eval(cw: np.ndarray, xlog: int) -> int:
    """Evaluate codeword poly (highest-power-first) at alpha^xlog."""
    acc = 0
    for c in cw:
        acc = _gf_mul(acc, int(_EXP[xlog])) ^ int(c)
    return acc


def test_gf_tables():
    assert _EXP[0] == 1 and _LOG[1] == 0
    rng = np.random.default_rng(0)
    for _ in range(200):
        a, b = int(rng.integers(0, 256)), int(rng.integers(0, 256))
        assert _gf_mul(a, b) == _gf_mul_slow(a, b)


@pytest.mark.parametrize("n,k", [(255, 223), (60, 40), (32, 24)])
def test_encode_roots(n, k):
    """Every encoded word evaluates to zero at all 2t generator roots."""
    code = make_rs_code(n, k)
    rng = np.random.default_rng(1)
    msg = jnp.asarray(rng.integers(0, 256, (3, k), dtype=np.uint8))
    cw = np.asarray(rs_encode(code, msg))
    assert cw.shape == (3, n)
    np.testing.assert_array_equal(cw[:, :k], np.asarray(msg))  # systematic
    for b in range(3):
        for j in range(1, 2 * code.t + 1):
            assert _poly_eval(cw[b], j) == 0, (b, j)


@pytest.mark.parametrize("n,k", [(255, 223), (60, 40)])
def test_roundtrip_up_to_t_errors(n, k):
    code = make_rs_code(n, k)
    t = code.t
    rng = np.random.default_rng(2)
    batch = 4
    msg = jnp.asarray(rng.integers(0, 256, (batch, k), dtype=np.uint8))
    cw = np.asarray(rs_encode(code, msg))
    dec = jax.jit(lambda r: rs_decode(code, r))

    for nerr in (0, 1, t // 2, t):
        recv = cw.copy()
        for b in range(batch):
            pos = rng.choice(n, size=nerr, replace=False)
            for p_ in pos:
                recv[b, p_] ^= int(rng.integers(1, 256))
        out, ok = dec(jnp.asarray(recv))
        assert np.all(np.asarray(ok)), f"nerr={nerr}"
        np.testing.assert_array_equal(np.asarray(out), np.asarray(msg))


def test_beyond_t_flags_failure():
    code = make_rs_code(60, 40)
    t = code.t
    rng = np.random.default_rng(3)
    msg = jnp.asarray(rng.integers(0, 256, (4, 40), dtype=np.uint8))
    cw = np.asarray(rs_encode(code, msg))
    recv = cw.copy()
    for b in range(4):
        pos = rng.choice(60, size=t + 3, replace=False)
        for p_ in pos:
            recv[b, p_] ^= int(rng.integers(1, 256))
    out, ok = rs_decode(code, jnp.asarray(recv))
    # each block either flags failure or (vanishingly unlikely) miscorrects
    # to a DIFFERENT codeword — it must never claim ok with the right msg
    # unrecovered, and with this seed all four flag failure
    assert not np.any(np.asarray(ok))


def test_burst_and_parity_errors():
    """Errors confined to the parity tail and a contiguous burst."""
    code = make_rs_code(255, 223)
    rng = np.random.default_rng(4)
    msg = jnp.asarray(rng.integers(0, 256, (1, 223), dtype=np.uint8))
    cw = np.asarray(rs_encode(code, msg))
    recv = cw.copy()
    recv[0, 240:240 + 15] ^= np.asarray(rng.integers(1, 256, 15), np.uint8)
    out, ok = rs_decode(code, jnp.asarray(recv))
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(msg))

    recv = cw.copy()
    recv[0, 100:116] ^= np.asarray(rng.integers(1, 256, 16), np.uint8)
    out, ok = rs_decode(code, jnp.asarray(recv))
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(msg))


def test_validates():
    with pytest.raises(ValueError):
        make_rs_code(255, 222)   # odd n-k
    with pytest.raises(ValueError):
        make_rs_code(256, 200)   # n > 255

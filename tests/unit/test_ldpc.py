"""LDPC codec: construction properties, encode parity, min-sum decode
(clean + AWGN + loop twin + batch)."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ldpc import (
    LdpcCode, ldpc_decode, ldpc_encode, make_ldpc_code, make_regular_ldpc,
)


def _code(n=96, dv=3, dc=6, seed=0):
    return make_ldpc_code(make_regular_ldpc(n, dv, dc, seed=seed))


def test_regular_construction():
    h = make_regular_ldpc(120, 3, 6, seed=1)
    assert h.shape == (60, 120)
    np.testing.assert_array_equal(h.sum(axis=0), 3)   # column weight dv
    assert h.sum() == 120 * 3                          # edge count conserved
    # 4-cycle reduction: no column pair shares more than one check
    gram = h.astype(int).T @ h.astype(int)
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1


def test_encode_satisfies_all_checks_and_is_systematic():
    code = _code()
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (8, code.k))
    c = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    h = np.asarray(code.h).astype(int)
    np.testing.assert_array_equal((c @ h.T) % 2, 0)
    # systematic: info bits appear verbatim at the generator's info columns
    perm = np.argsort(np.asarray(code.col_perm))
    np.testing.assert_array_equal(c[:, perm[code.n - code.k:]], u)


def test_decode_clean_roundtrip():
    code = _code()
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, (4, code.k))
    c = np.asarray(ldpc_encode(code, jnp.asarray(u)))
    llr = jnp.asarray(4.0 * (1.0 - 2.0 * c))      # exact hard LLRs
    bits, info, ok = jax.jit(lambda l: ldpc_decode(code, l, iters=5))(llr)
    assert bool(jnp.all(ok))
    np.testing.assert_array_equal(np.asarray(bits), c)
    np.testing.assert_array_equal(np.asarray(info), u)


def test_decode_corrects_awgn_errors():
    """BPSK over AWGN at 3 dB Eb/N0 (rate 1/2): hard decisions carry
    errors; min-sum repairs every block of this small batch."""
    code = _code(n=252, seed=3)
    rate = code.k / code.n
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, (16, code.k))
    c = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    x = 1.0 - 2.0 * c
    ebn0 = 10 ** (3.0 / 10)
    sigma = np.sqrt(1.0 / (2 * rate * ebn0))
    y = x + sigma * rng.standard_normal(x.shape)
    hard_errs = int(np.sum((y < 0) != (x < 0)))
    assert hard_errs > 20, hard_errs                   # channel is noisy
    llr = jnp.asarray((2.0 / sigma**2) * y, dtype=jnp.float32)
    bits, info, ok = jax.jit(lambda l: ldpc_decode(code, l, iters=40))(llr)
    assert bool(jnp.all(ok))
    np.testing.assert_array_equal(np.asarray(info), u)


def _minsum_twin(h, llr, iters, alpha):
    """Per-edge python loop reference of normalized min-sum."""
    m, n = h.shape
    msg = np.zeros((m, n))
    for _ in range(iters):
        # variable -> check
        tot = llr + msg.sum(axis=0)
        v2c = (tot[None, :] - msg) * h
        c2v = np.zeros_like(msg)
        for i in range(m):
            cols = np.flatnonzero(h[i])
            for j in cols:
                others = cols[cols != j]
                prod = np.prod(np.sign(v2c[i, others]))
                c2v[i, j] = alpha * prod * np.min(np.abs(v2c[i, others]))
        msg = c2v
    return llr + msg.sum(axis=0)


def test_matches_loop_twin():
    code = _code(n=48, seed=5)
    rng = np.random.default_rng(4)
    llr = rng.standard_normal(code.n).astype(np.float32) * 2.0
    h = np.asarray(code.h)
    want = _minsum_twin(h.astype(np.float64), llr.astype(np.float64),
                        iters=3, alpha=0.8125)
    bits, _, _ = ldpc_decode(code, jnp.asarray(llr), iters=3)
    np.testing.assert_array_equal(np.asarray(bits), (want < 0).astype(int))


def test_vmap_batch():
    code = _code(n=66, seed=6)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, (3, code.k))
    c = ldpc_encode(code, jnp.asarray(u))
    llr = 3.0 * (1.0 - 2.0 * c.astype(jnp.float32))
    f = jax.vmap(lambda l: ldpc_decode(code, l, iters=4))
    bits, info, ok = f(llr)
    assert bool(jnp.all(ok))
    np.testing.assert_array_equal(np.asarray(info), u)


def test_unroll_matches_scan():
    """unroll=True (the restricted-backend form) is the same computation."""
    code = _code(n=96, seed=7)
    rng = np.random.default_rng(8)
    u = rng.integers(0, 2, (2, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    llr = jnp.asarray(3.0 * (1 - 2 * cw) + 0.8 * rng.standard_normal(cw.shape),
                      jnp.float32)
    b1, i1, ok1 = ldpc_decode(code, llr, iters=7)
    b2, i2, ok2 = ldpc_decode(code, llr, iters=7, unroll=True)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))

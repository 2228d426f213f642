"""Turbo codec (turbo.py): RSC loop twin + termination, BCJR clean/noisy,
iterative turbo gain."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.turbo import (
    bcjr_decode, make_rsc, make_turbo, rsc_encode, turbo_decode,
    turbo_encode,
)


def _twin(code, bits):
    """Pure-python RSC reference; returns (sys, par, final register)."""
    k, fb, g = code.k, code.fb, code.g
    st = [0] * (k - 1)
    sysb, parb = [], []

    def step(u):
        fbreg = 0
        for i in range(1, k):
            if (fb >> (k - 1 - i)) & 1:
                fbreg ^= st[i - 1]
        a = u ^ fbreg
        p = a if (g >> (k - 1)) & 1 else 0
        for i in range(1, k):
            if (g >> (k - 1 - i)) & 1:
                p ^= st[i - 1]
        st.insert(0, a)
        st.pop()
        return p

    for u in bits:
        sysb.append(int(u))
        parb.append(step(int(u)))
    for _ in range(k - 1):
        fbreg = 0
        for i in range(1, k):
            if (fb >> (k - 1 - i)) & 1:
                fbreg ^= st[i - 1]
        sysb.append(fbreg)
        parb.append(step(fbreg))
    return np.array(sysb), np.array(parb), st


def test_rsc_matches_twin_and_terminates():
    code = make_rsc()
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 64)
    sys_b, par_b = (np.asarray(a) for a in rsc_encode(code, jnp.asarray(bits)))
    s2, p2, st = _twin(code, bits)
    np.testing.assert_array_equal(sys_b, s2)
    np.testing.assert_array_equal(par_b, p2)
    assert st == [0] * (code.k - 1)                 # register flushed
    np.testing.assert_array_equal(sys_b[:64], bits)  # systematic


def test_bcjr_clean_and_prior_helps():
    code = make_rsc()
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 128)
    sys_b, par_b = (np.asarray(a).astype(np.float64)
                    for a in rsc_encode(code, jnp.asarray(bits)))
    ls = jnp.asarray(4.0 * (1 - 2 * sys_b), jnp.float32)
    lp = jnp.asarray(4.0 * (1 - 2 * par_b), jnp.float32)
    post, ext = bcjr_decode(code, ls, lp, terminated=True)
    np.testing.assert_array_equal((np.asarray(post)[:128] < 0).astype(int),
                                  bits)
    # heavy noise: a truthful prior repairs errors the channel alone cannot
    sigma = 1.4
    noisy_s = (1 - 2 * sys_b) + sigma * rng.standard_normal(sys_b.shape)
    noisy_p = (1 - 2 * par_b) + sigma * rng.standard_normal(par_b.shape)
    lsn = jnp.asarray(2 / sigma ** 2 * noisy_s, jnp.float32)
    lpn = jnp.asarray(2 / sigma ** 2 * noisy_p, jnp.float32)
    p0, _ = bcjr_decode(code, lsn, lpn, terminated=True)
    e0 = int(((np.asarray(p0)[:128] < 0).astype(int) != bits).sum())
    la = jnp.asarray(6.0 * (1 - 2 * sys_b), jnp.float32)
    p1, _ = bcjr_decode(code, lsn, lpn, la, terminated=True)
    e1 = int(((np.asarray(p1)[:128] < 0).astype(int) != bits).sum())
    assert e0 > 0 and e1 < e0, (e0, e1)


def test_turbo_iteration_gain():
    """1.5 dB Eb/N0, rate ~1/3, N=256: one iteration leaves errors, three
    clear them (the defining turbo behavior, same channel draw)."""
    tc = make_turbo(256, seed=1)
    rng = np.random.default_rng(0)
    _ = rng.integers(0, 2, 64)                      # align with smoke run
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, 256)
    s, p1, p2 = (np.asarray(a).astype(np.float64)
                 for a in turbo_encode(tc, jnp.asarray(u)))
    rate = 256 / (s.size + p1.size + p2.size)
    sigma = np.sqrt(1 / (2 * rate * 10 ** (1.5 / 10)))

    def ch(b):
        return jnp.asarray(2 / sigma ** 2 * ((1 - 2 * b)
                           + sigma * rng.standard_normal(b.shape)),
                           jnp.float32)

    lls, llp1, llp2 = ch(s), ch(p1), ch(p2)
    b1, _ = turbo_decode(tc, lls, llp1, llp2, iters=1)
    e1 = int((np.asarray(b1) != u).sum())
    b6, _ = turbo_decode(tc, lls, llp1, llp2, iters=6)
    e6 = int((np.asarray(b6) != u).sum())
    assert e1 > 0, "channel too clean to show iteration gain"
    assert e6 == 0, (e1, e6)


def test_turbo_jit_and_shapes():
    tc = make_turbo(128, seed=3)
    rng = np.random.default_rng(4)
    u = rng.integers(0, 2, 128)
    s, p1, p2 = turbo_encode(tc, jnp.asarray(u))
    assert s.shape[-1] == 128 + tc.rsc.k - 1 and p2.shape[-1] == 128
    f = jax.jit(lambda a, b, c: turbo_decode(tc, a, b, c, iters=4))
    bits, post = f(4.0 * (1 - 2.0 * s.astype(jnp.float32)),
                   4.0 * (1 - 2.0 * p1.astype(jnp.float32)),
                   4.0 * (1 - 2.0 * p2.astype(jnp.float32)))
    np.testing.assert_array_equal(np.asarray(bits), u)


def test_turbo_decode_batch_matches_vmapped():
    """The lane-native [T, B] batched decoder is bit-identical to
    vmap(turbo_decode): same max/add arithmetic per element, only the
    layout differs (states on sublanes, codewords on lanes)."""
    from srcdsp_tpu.fec import bpsk_soft
    from srcdsp_tpu.turbo import turbo_decode_batch

    tc = make_turbo(128, seed=3)
    rng = np.random.default_rng(4)
    bsz = 8
    u = rng.integers(0, 2, (bsz, 128))
    s, p1, p2 = jax.vmap(lambda b: turbo_encode(tc, b))(jnp.asarray(u))
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    mk = lambda c, k: 4.0 * jnp.asarray(bpsk_soft(c, k, noise_std=0.8))
    ls, lp1, lp2 = mk(s, keys[0]), mk(p1, keys[1]), mk(p2, keys[2])

    b_ref, post_ref = jax.vmap(
        lambda a, b, c: turbo_decode(tc, a, b, c, iters=3))(ls, lp1, lp2)
    b_new, post_new = turbo_decode_batch(tc, ls, lp1, lp2, iters=3)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_new))
    np.testing.assert_array_equal(np.asarray(post_ref),
                                  np.asarray(post_new))

"""Reed-Solomon codec over GF(256), TPU-native.

Complements the convolutional/Viterbi layer (`fec.py`) with the classic
block code (the reference family stops at demodulated bits — SURVEY.md
§2 [B]; this is a beyond-parity component in the same spirit as X4/X5).

TPU mapping — the insight is that every GF(256)-LINEAR map is also
GF(2)-linear on the bit level, so the two bulk stages run as dense f32
MXU matmuls mod 2 (exactly the `gf2.py` trick, batched over codewords):

- ENCODE: systematic parity p(x) = m(x)·x^{2t} mod g(x) is GF-linear in
  the message symbols with FIXED multipliers R_i[j] = coeffs of
  x^{power(i)} mod g — one [B, 8k] @ [8k, 16t] matmul mod 2.
- SYNDROMES: S_j = r(α^{j}) has fixed multipliers α^{j·power(i)} — one
  [B, 8n] @ [8n, 16t] matmul mod 2 (also how decode SUCCESS is verified,
  by re-running it on the corrected word).

The small sequential core (Berlekamp–Massey over the 2t syndromes) is a
`lax.scan` with where-selected updates (vmap-friendly, no cond); Chien
search and Forney's formula are vectorized over all n positions with the
t+1 locator terms unrolled at trace time. Variable·variable GF products
use log/exp tables (`jnp.take` — standard-TPU/CPU tier, like fec.py's
scan; the axon subset lacks gather).

Shortened codes fall out for free: positions are indexed by their
polynomial power n-1-i, so any n <= 255 uses the same tables.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

_PRIM = 0x11D  # x^8+x^4+x^3+x^2+1 (CCSDS/DVB primitive polynomial)


def _build_tables(prim: int = _PRIM):
    exp = np.zeros(510, np.int32)
    log = np.zeros(256, np.int32)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= prim
    exp[255:510] = exp[0:255]
    return exp, log


_EXP, _LOG = _build_tables()


def _gf_mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _gf_mul_bitmat(c: int) -> np.ndarray:
    """[8, 8] GF(2) matrix of multiply-by-constant-c: row b = bits of
    c * x^b (LSB-first), so bits(c*m) = bits(m) @ M mod 2."""
    m = np.zeros((8, 8), np.uint8)
    for b in range(8):
        prod = _gf_mul(c, 1 << b)
        m[b] = [(prod >> j) & 1 for j in range(8)]
    return m


def _poly_mod_g(num: np.ndarray, g: np.ndarray) -> np.ndarray:
    """num(x) mod g(x), coefficient arrays highest-power-first."""
    num = num.copy()
    dg = g.size - 1
    for i in range(num.size - dg):
        c = int(num[i])
        if c:
            for j in range(g.size):
                num[i + j] ^= _gf_mul(c, int(g[j]))
    return num[-dg:]


class RsCode(NamedTuple):
    n: int
    k: int
    t: int
    enc_bits: jax.Array    # [8k, 16t] GF(2) encode matrix
    syn_bits: jax.Array    # [8n, 16t] GF(2) syndrome matrix
    exp: jax.Array         # [510] GF exp table
    log: jax.Array         # [256] GF log table
    chien_pow: jax.Array   # [n, t+1] exponents of alpha^{-(n-1-i)j} mod 255
    forney_pow: jax.Array  # [n, 2t]  exponents for Omega/Lambda' evaluation


def make_rs_code(n: int = 255, k: int = 223) -> RsCode:
    """Build an RS(n, k) code over GF(256), narrow-sense (roots α^1..α^2t),
    t = (n-k)//2 symbol-error correction. n <= 255, n-k even."""
    if not (2 <= k < n <= 255) or (n - k) % 2:
        raise ValueError(f"need 2 <= k < n <= 255 with n-k even, got {n},{k}")
    t = (n - k) // 2
    p = 2 * t

    # generator g(x) = prod_{j=1..2t} (x - alpha^j), highest-first
    g = np.array([1], np.int32)
    for j in range(1, p + 1):
        root = int(_EXP[j])
        nxt = np.zeros(g.size + 1, np.int32)
        for i, c in enumerate(g):
            nxt[i] ^= _gf_mul(int(c), 1)      # x * g
            nxt[i + 1] ^= _gf_mul(int(c), root)
        g = nxt

    # encode matrix: message index i has power n-1-i; its parity
    # contribution is m_i * (x^{n-1-i} mod g)
    enc = np.zeros((8 * k, 8 * p), np.uint8)
    for i in range(k):
        num = np.zeros(n - i, np.int32)
        num[0] = 1                             # x^{n-1-i}
        r = _poly_mod_g(num, g)                # [2t] highest-first
        for j in range(p):
            enc[8 * i: 8 * i + 8, 8 * j: 8 * j + 8] = _gf_mul_bitmat(int(r[j]))

    # syndrome matrix: S_j = sum_i r_i * alpha^{(j+1)*(n-1-i)}, j=0..2t-1
    syn = np.zeros((8 * n, 8 * p), np.uint8)
    for i in range(n):
        pw = n - 1 - i
        for j in range(p):
            c = int(_EXP[((j + 1) * pw) % 255])
            syn[8 * i: 8 * i + 8, 8 * j: 8 * j + 8] = _gf_mul_bitmat(c)

    # Chien exponents: Lambda(X_i^{-1}) with X_i = alpha^{n-1-i}:
    # term j needs alpha^{-j*(n-1-i)} = alpha^{(255 - (j*(n-1-i)) % 255)}
    ii = np.arange(n)[:, None]
    jj = np.arange(t + 1)[None, :]
    chien = (-(jj * (n - 1 - ii))) % 255
    jj2 = np.arange(p)[None, :]
    forney = (-(jj2 * (n - 1 - ii))) % 255

    return RsCode(
        n=n, k=k, t=t,
        enc_bits=jnp.asarray(enc, jnp.float32),
        syn_bits=jnp.asarray(syn, jnp.float32),
        exp=jnp.asarray(_EXP), log=jnp.asarray(_LOG),
        chien_pow=jnp.asarray(chien), forney_pow=jnp.asarray(forney),
    )


def _bytes_to_bits(x: jax.Array) -> jax.Array:
    """[..., S] uint8 -> [..., 8S] f32 bits, LSB-first per byte."""
    b = jnp.right_shift(x[..., None].astype(jnp.int32),
                        jnp.arange(8, dtype=jnp.int32)) & 1
    return b.reshape(*x.shape[:-1], -1).astype(jnp.float32)


def _bits_to_bytes(b: jax.Array) -> jax.Array:
    """[..., 8S] {0,1} -> [..., S] uint8, LSB-first per byte."""
    bb = b.reshape(*b.shape[:-1], -1, 8).astype(jnp.int32)
    w = jnp.left_shift(jnp.ones((), jnp.int32), jnp.arange(8))
    return jnp.sum(bb * w, axis=-1).astype(jnp.uint8)


def rs_encode(code: RsCode, msg: jax.Array) -> jax.Array:
    """Systematic encode. msg [B, k] uint8 -> codeword [B, n] uint8
    (message symbols first, then 2t parity symbols). One MXU matmul."""
    bits = _bytes_to_bits(msg)                       # [B, 8k]
    pbits = jnp.mod(bits @ code.enc_bits, 2.0)       # exact: sums < 2^24
    return jnp.concatenate([msg, _bits_to_bytes(pbits)], axis=-1)


def _syndromes(code: RsCode, recv: jax.Array) -> jax.Array:
    bits = _bytes_to_bits(recv)                      # [B, 8n]
    sb = jnp.mod(bits @ code.syn_bits, 2.0)
    return _bits_to_bytes(sb).astype(jnp.int32)      # [B, 2t]


def _gfv_mul(exp, log, a, b):
    """Elementwise GF product of int32 arrays (0-safe)."""
    prod = jnp.take(exp, jnp.take(log, a) + jnp.take(log, b))
    return jnp.where((a == 0) | (b == 0), 0, prod)


def _berlekamp_massey(code: RsCode, s: jax.Array):
    """BM over one codeword's syndromes s [2t] int32 -> (lam [t+1], L).
    Where-selected updates only (vmap/batch-friendly)."""
    t = code.t
    p = 2 * t
    exp, log = code.exp, code.log
    tp1 = t + 1

    lam0 = jnp.zeros(tp1, jnp.int32).at[0].set(1)
    bpoly0 = jnp.zeros(tp1, jnp.int32).at[0].set(1)
    carry0 = (lam0, bpoly0, jnp.int32(0), jnp.int32(1), jnp.int32(1))

    idx = jnp.arange(tp1)

    def step(carry, r):
        lam, bpoly, ll, mm, bb = carry
        # discrepancy d = sum_j lam[j] * s[r-j], terms with r-j < 0 drop
        sj = jnp.where(r - idx >= 0, s[jnp.clip(r - idx, 0, p - 1)], 0)
        terms = _gfv_mul(exp, log, lam, sj)
        # XOR-reduce over tp1 static terms
        d = jnp.zeros((), jnp.int32)
        for j in range(tp1):
            d = jnp.bitwise_xor(d, terms[j])
        # coef = d / b ; shifted = x^m * bpoly
        coef = jnp.take(exp, (jnp.take(log, d) - jnp.take(log, bb)) % 255)
        coef = jnp.where(d == 0, 0, coef)
        src = jnp.clip(idx - mm, 0, tp1 - 1)
        shifted = jnp.where(idx - mm >= 0, bpoly[src], 0)
        lam_new = jnp.bitwise_xor(lam, _gfv_mul(exp, log, shifted,
                                                jnp.full(tp1, coef)))
        upd = d != 0
        grow = upd & (2 * ll <= r)
        lam_out = jnp.where(upd, lam_new, lam)
        bpoly_out = jnp.where(grow, lam, bpoly)
        ll_out = jnp.where(grow, r + 1 - ll, ll)
        bb_out = jnp.where(grow, d, bb)
        mm_out = jnp.where(grow, 1, mm + 1)
        return (lam_out, bpoly_out, ll_out, mm_out, bb_out), None

    (lam, _, ll, _, _), _ = jax.lax.scan(step, carry0, jnp.arange(p))
    return lam, ll


def rs_decode(code: RsCode, recv: jax.Array):
    """Decode recv [B, n] uint8 -> (msg [B, k] uint8, ok [B] bool).

    Corrects up to t symbol errors per codeword; ok=False flags
    uncorrectable blocks (verified by re-computing the syndromes of the
    corrected word — catches >t-error miscorrection attempts)."""
    n, k, t = code.n, code.k, code.t
    p = 2 * t
    exp, log = code.exp, code.log
    s = _syndromes(code, recv)                       # [B, 2t]
    clean = jnp.all(s == 0, axis=-1)                 # [B]

    lam, _ = jax.vmap(functools.partial(_berlekamp_massey, code))(s)

    # Chien search: E[i] = Lambda(alpha^{-(n-1-i)}) for every position
    def chien_eval(lam1):
        loglam = jnp.take(log, lam1)                 # [t+1]
        acc = jnp.zeros(n, jnp.int32)
        for j in range(t + 1):
            term = jnp.take(exp, (loglam[j] + code.chien_pow[:, j]) % 255)
            term = jnp.where(lam1[j] == 0, 0, term)
            acc = jnp.bitwise_xor(acc, term)
        return acc

    evals = jax.vmap(chien_eval)(lam)                # [B, n]
    is_err = evals == 0                              # error locations

    # Omega(x) = S(x) * Lambda(x) mod x^{2t}; S(x) = s_0 + s_1 x + ...
    def omega(lam1, s1):
        om = jnp.zeros(p, jnp.int32)
        for j in range(t + 1):
            for i2 in range(p):
                if i2 + j < p:
                    om = om.at[i2 + j].set(jnp.bitwise_xor(
                        om[i2 + j], _gfv_mul(exp, log, lam1[j], s1[i2])))
        return om

    om = jax.vmap(omega)(lam, s)                     # [B, 2t]

    # Forney (narrow-sense, fcr=1): e_i = Omega(Xi^-1) / Lambda'(Xi^-1)
    # with Lambda'(x) = sum_{j odd} lam_j x^{j-1}
    def forney_eval(lam1, om1):
        logom = jnp.take(log, om1)
        num = jnp.zeros(n, jnp.int32)
        for j in range(p):
            term = jnp.take(exp, (logom[j] + code.forney_pow[:, j]) % 255)
            num = jnp.bitwise_xor(num, jnp.where(om1[j] == 0, 0, term))
        loglam = jnp.take(log, lam1)
        den = jnp.zeros(n, jnp.int32)
        for j in range(1, t + 1, 2):
            # lam_j * x^{j-1} at x = Xi^{-1}: exponents from chien_pow col
            # j minus one power: chien_pow[:, j-1] corresponds to x^{j-1}
            term = jnp.take(exp, (loglam[j] + code.chien_pow[:, j - 1]) % 255)
            den = jnp.bitwise_xor(den, jnp.where(lam1[j] == 0, 0, term))
        logden = jnp.take(log, den)
        ev = jnp.take(exp, (jnp.take(log, num) - logden) % 255)
        return jnp.where((num == 0) | (den == 0), 0, ev)

    evals_e = jax.vmap(forney_eval)(lam, om)         # [B, n]
    errs = jnp.where(is_err, evals_e, 0).astype(jnp.uint8)
    corrected = jnp.bitwise_xor(recv, errs)
    corrected = jnp.where(clean[:, None], recv, corrected)

    # success check: corrected word must be a codeword
    ok = jnp.all(_syndromes(code, corrected) == 0, axis=-1)
    return corrected[:, :k], ok


__all__ = ["RsCode", "make_rs_code", "rs_encode", "rs_decode"]

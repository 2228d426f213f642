"""Binary BCH codec over GF(2^m) — the block-code family between the
Hamming-class short codes (rds.py's (26,16)) and Reed-Solomon (rs.py):
n = 2^m - 1 bits, corrects t BIT errors (POCSAG's (31,21) t=2, pager
and telemetry standards' workhorse).

Same TPU mapping as rs.py (whose docstring explains the trick): the
bulk stages are GF(2)-linear, so

- ENCODE: parity p(x) = m(x)·x^{n-k} mod g(x) is one [B, k] @ [k, n-k]
  f32 matmul mod 2 (g = lcm of the minimal polynomials of
  alpha^1..alpha^{2t}, built at design time from conjugacy classes);
- SYNDROMES: S_j = r(alpha^j) is one [B, n] @ [n, 2t*m] bit matmul
  mod 2, then bit-pack to field elements.

The sequential core (Berlekamp–Massey) is the rs.py scan with the
tables parameterized to GF(2^m); Chien search is vectorized over all n
positions with the t+1 locator terms unrolled. Binary BCH needs no
Forney step — error VALUES are 1, so correction is an XOR at the
located bits. Success is certified by re-syndroming: a corrected word
that is not a codeword is flagged ok=False. (As with any bounded-
distance decoder, a >t-error word that happens to land within distance
t of a DIFFERENT codeword decodes to that codeword with ok=True — the
outer protocol layer's checks, e.g. POCSAG's parity bit, guard that
case.)

Shortening: any leading-information shortening n' = n - s works by
zero-padding (positions keep their polynomial powers); pass `shorten=`
to bch_encode/bch_decode — decode additionally rejects words whose
"corrections" land in the implicit zero prefix.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["BchCode", "make_bch_code", "bch_encode", "bch_decode"]

# standard primitive polynomials per field degree m
_PRIMS = {3: 0xB, 4: 0x13, 5: 0x25, 6: 0x43, 7: 0x89, 8: 0x11D,
          9: 0x211, 10: 0x409}


def _build_tables(m: int):
    prim = _PRIMS[m]
    n = (1 << m) - 1
    exp = np.zeros(2 * n, np.int32)
    log = np.zeros(n + 1, np.int32)
    x = 1
    for i in range(n):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & (1 << m):
            x ^= prim
    exp[n: 2 * n] = exp[:n]
    return exp, log


def _minimal_poly(s: int, m: int, exp, log) -> np.ndarray:
    """Minimal polynomial of alpha^s over GF(2): product over the
    conjugacy class {s*2^j mod n} of (x - alpha^c). Coefficients land
    in GF(2); returned MSB-first as 0/1 ints."""
    n = (1 << m) - 1
    conj = []
    c = s % n
    while c not in conj:
        conj.append(c)
        c = (c * 2) % n

    def gf_mul(a, b):
        if a == 0 or b == 0:
            return 0
        return int(exp[(log[a] + log[b]) % n])

    poly = [1]                     # in GF(2^m), highest degree first
    for c in conj:
        root = int(exp[c])
        nxt = [0] * (len(poly) + 1)
        for i, pc in enumerate(poly):
            nxt[i] ^= gf_mul(pc, 1)          # x * poly
            nxt[i + 1] ^= gf_mul(pc, root)   # root * poly
        poly = nxt
    assert all(pc in (0, 1) for pc in poly), "minimal poly not binary"
    return np.asarray(poly, np.int64)


def _poly_mul_gf2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a) + len(b) - 1, np.int64)
    for i, ai in enumerate(a):
        if ai:
            out[i: i + len(b)] ^= b
    return out % 2


class BchCode(NamedTuple):
    n: int
    k: int
    t: int
    m: int
    gen: np.ndarray          # [n-k+1] generator bits, MSB first
    enc_bits: jax.Array      # [k, n-k] parity matmul matrix
    syn_bits: jax.Array      # [n, 2t*m] syndrome matmul matrix
    exp: jax.Array           # [2(2^m-1)] GF tables
    log: jax.Array
    chien_pow: jax.Array     # [n, t+1] exponents for Chien evaluation


def make_bch_code(m: int, t: int) -> BchCode:
    """Primitive binary BCH with n = 2^m - 1 correcting t errors.
    k falls out of deg(g); e.g. (m=5, t=2) -> (31, 21) (POCSAG),
    (m=6, t=3) -> (63, 45), (m=8, t=2) -> (255, 239)."""
    exp_np, log_np = _build_tables(m)
    n = (1 << m) - 1
    g = np.asarray([1], np.int64)
    seen = set()
    for s in range(1, 2 * t + 1):
        c0 = s % n
        cls = frozenset((c0 * (1 << j)) % n for j in range(m))
        if cls in seen:
            continue
        seen.add(cls)
        g = _poly_mul_gf2(g, _minimal_poly(s, m, exp_np, log_np))
    r = len(g) - 1                 # n - k
    k = n - r
    if k <= 0:
        raise ValueError(f"t={t} too large for m={m}")

    def x_mod_g(power: int) -> np.ndarray:
        num = np.zeros(power + 1, np.int64)
        num[0] = 1
        rem = num.copy()
        for i in range(len(rem) - r):
            if rem[i]:
                rem[i: i + r + 1] ^= g
        return rem[-r:] % 2

    # parity of message bit i (message MSB first at power n-1-i):
    # x^{n-1-i} mod g
    enc = np.stack([x_mod_g(n - 1 - i) for i in range(k)])
    # syndrome S_j = sum_i r_i alpha^{j(n-1-i)}: row i = concat_j of
    # alpha^{j(n-1-i)} bits (m bits MSB first per syndrome)
    syn = np.zeros((n, 2 * t * m), np.int64)
    for i in range(n):
        p = n - 1 - i
        for j in range(1, 2 * t + 1):
            v = int(exp_np[(j * p) % n])
            for b in range(m):
                syn[i, (j - 1) * m + b] = (v >> (m - 1 - b)) & 1
    # Chien: evaluate Lambda at alpha^{-p} for position power p:
    # term j exponent = -p*j mod n
    pw = np.asarray([n - 1 - i for i in range(n)])
    chien = np.stack([(-pw * j) % n for j in range(t + 1)], axis=1)
    return BchCode(
        n=n, k=k, t=t, m=m, gen=g.astype(np.int64),
        enc_bits=jnp.asarray(enc.astype(np.float32)),
        syn_bits=jnp.asarray(syn.astype(np.float32)),
        exp=jnp.asarray(exp_np), log=jnp.asarray(log_np),
        chien_pow=jnp.asarray(chien.astype(np.int32)))


def bch_encode(code: BchCode, msg: jax.Array,
               shorten: int = 0) -> jax.Array:
    """msg [B, k - shorten] {0,1} -> codewords [B, n - shorten]
    (systematic: message bits then parity). shorten > 0 drops the
    leading information positions (transmitted as implicit zeros)."""
    if shorten:
        if not 0 < shorten < code.k:
            raise ValueError(f"shorten must be in [0, k), got {shorten}")
        z = jnp.zeros((*msg.shape[:-1], shorten), msg.dtype)
        msg = jnp.concatenate([z, msg], axis=-1)
    par = jnp.mod(jnp.dot(msg.astype(jnp.float32), code.enc_bits,
                          precision=jax.lax.Precision.HIGHEST), 2.0)
    out = jnp.concatenate([msg.astype(jnp.int32),
                           par.astype(jnp.int32)], axis=-1)
    return out[..., shorten:] if shorten else out


def _syndromes(code: BchCode, recv: jax.Array) -> jax.Array:
    sb = jnp.mod(jnp.dot(recv.astype(jnp.float32), code.syn_bits,
                         precision=jax.lax.Precision.HIGHEST), 2.0)
    sb = sb.reshape(*sb.shape[:-1], 2 * code.t, code.m).astype(jnp.int32)
    w = (1 << jnp.arange(code.m - 1, -1, -1)).astype(jnp.int32)
    return jnp.sum(sb * w, axis=-1)                  # [B, 2t] field elts


def _gfv_mul(exp, log, nn, a, b):
    prod = jnp.take(exp, (jnp.take(log, a) + jnp.take(log, b)) % nn)
    return jnp.where((a == 0) | (b == 0), 0, prod)


def _berlekamp_massey(code: BchCode, s: jax.Array):
    """rs.py's BM scan with GF(2^m) tables; s [2t] -> lam [t+1]."""
    t = code.t
    p = 2 * t
    exp, log = code.exp, code.log
    nn = code.n
    tp1 = t + 1
    lam0 = jnp.zeros(tp1, jnp.int32).at[0].set(1)
    bpoly0 = jnp.zeros(tp1, jnp.int32).at[0].set(1)
    carry0 = (lam0, bpoly0, jnp.int32(0), jnp.int32(1), jnp.int32(1))
    idx = jnp.arange(tp1)

    def step(carry, r):
        lam, bpoly, ll, mm, bb = carry
        sj = jnp.where(r - idx >= 0, s[jnp.clip(r - idx, 0, p - 1)], 0)
        terms = _gfv_mul(exp, log, nn, lam, sj)
        d = jnp.zeros((), jnp.int32)
        for j in range(tp1):
            d = jnp.bitwise_xor(d, terms[j])
        coef = jnp.take(exp, (jnp.take(log, d) - jnp.take(log, bb)) % nn)
        coef = jnp.where(d == 0, 0, coef)
        src = jnp.clip(idx - mm, 0, tp1 - 1)
        shifted = jnp.where(idx - mm >= 0, bpoly[src], 0)
        lam_new = jnp.bitwise_xor(
            lam, _gfv_mul(exp, log, nn, shifted, jnp.full(tp1, coef)))
        upd = d != 0
        grow = upd & (2 * ll <= r)
        lam_out = jnp.where(upd, lam_new, lam)
        bpoly_out = jnp.where(grow, lam, bpoly)
        ll_out = jnp.where(grow, r + 1 - ll, ll)
        bb_out = jnp.where(grow, d, bb)
        mm_out = jnp.where(grow, 1, mm + 1)
        return (lam_out, bpoly_out, ll_out, mm_out, bb_out), None

    (lam, _, _, _, _), _ = jax.lax.scan(step, carry0, jnp.arange(p))
    return lam


def bch_decode(code: BchCode, recv: jax.Array, shorten: int = 0):
    """recv [B, n - shorten] {0,1} -> (msg [B, k - shorten] int32,
    ok [B] bool). Corrects up to t bit errors; ok=False marks words
    whose corrected form still fails the syndrome check, or (shortened
    codes) whose "corrections" land in the implicit zero prefix."""
    n, k, t = code.n, code.k, code.t
    exp, log, nn = code.exp, code.log, code.n
    recv = recv.astype(jnp.int32)
    if shorten:
        if not 0 < shorten < code.k:
            raise ValueError(f"shorten must be in [0, k), got {shorten}")
        z = jnp.zeros((*recv.shape[:-1], shorten), recv.dtype)
        recv = jnp.concatenate([z, recv], axis=-1)
    s = _syndromes(code, recv)
    clean = jnp.all(s == 0, axis=-1)
    lam = jax.vmap(functools.partial(_berlekamp_massey, code))(s)

    def chien_eval(lam1):
        loglam = jnp.take(log, lam1)
        acc = jnp.zeros(n, jnp.int32)
        for j in range(t + 1):
            term = jnp.take(exp, (loglam[j] + code.chien_pow[:, j]) % nn)
            term = jnp.where(lam1[j] == 0, 0, term)
            acc = jnp.bitwise_xor(acc, term)
        return acc

    evals = jax.vmap(chien_eval)(lam)                # [B, n]
    errs = (evals == 0).astype(jnp.int32)            # binary: value is 1
    corrected = jnp.bitwise_xor(recv, errs)
    corrected = jnp.where(clean[:, None], recv, corrected)
    ok = jnp.all(_syndromes(code, corrected) == 0, axis=-1)
    if shorten:
        # a "correction" inside the implicit zero prefix is impossible
        # for a legal transmission -> the word had > t errors
        ok = ok & jnp.all(corrected[:, :shorten] == 0, axis=-1)
        return corrected[:, shorten:k], ok
    return corrected[:, :k], ok

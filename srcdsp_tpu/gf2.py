"""GF(2) linear sequence machines: LFSR scramblers and CRC as MXU matmuls.

Beyond-parity component. Scramblers and CRCs are per-bit shift-register
recurrences — like IIR filters (ops/iir.py), the most TPU-hostile loop
shape there is. But every LFSR/CRC is a LINEAR system over GF(2):

    s[t+1] = (A s[t] + B u[t]) mod 2        A [p,p], B [p]
    y[t]   = (C s[t] + D u[t]) mod 2        C [p],   D scalar

so the exact block trick of ops/iir.py applies verbatim, with mod-2
arithmetic: precompute (host, numpy, exact)

    G [L,p] rows C A^j            y_k  = (G s_k + H u_k) mod 2
    H [L,L] lower-tri C A^(i-j-1) B, diag D
    F [p,L] cols A^(L-1-i) B      s_k+1 = (A^L s_k + F u_k) mod 2

and run whole L-bit blocks as dense f32 matmuls followed by mod 2. The
integer sums are exact in f32 for L < 2^24 (entries are 0/1), so the MXU
computes exact GF(2) algebra. The only sequential work left is the [p]
inter-block state chain (a lax.scan of tiny matvecs). Arbitrary input
lengths split into full blocks plus one exact tail block whose matrices
are built (and cached) at trace time — no padding, so carried state stays
bit-exact under any stream split.

This gives:
- **Additive (free-running) scramblers** — 802.11/DVB style: keystream =
  G s only (no data feedback), XORed onto the bits.
- **CRC** — the Galois-form CRC register is exactly (A, B) above with A =
  companion matrix of the polynomial; a whole block of input bits enters
  through one F matmul. Non-reflected CRCs (CCITT family) map directly;
  reflected variants (CRC-32/ethernet) are the same machine fed bit-
  reversed bytes with bit-reversed output — helpers included.

No reference counterpart exists (SURVEY §0; BASELINE.json scope ends at
demodulation); tests verify against independent Python bit-loop twins and
published check values (CRC-16/CCITT 0x29B1, CRC-32 0xCBF43926 for
"123456789").
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import F32

I32 = jnp.int32


class Gf2Params(NamedTuple):
    """Precomputed block matrices for one GF(2) machine at one length L."""

    al: jax.Array    # [p, p] A^L mod 2
    f: jax.Array     # [p, L] input -> next state
    g: jax.Array     # [L, p] entry state -> outputs
    h: jax.Array     # [L, L] inputs -> outputs (lower-tri)


class Gf2Machine:
    """Host-side spec (A, B, C, D over GF(2)) + per-length matrix cache.

    Closed over by jitted code; matrices for each distinct block length are
    built once at trace time with exact numpy mod-2 arithmetic.
    """

    def __init__(self, a: np.ndarray, b: np.ndarray, c: np.ndarray,
                 d: int, block: int = 512):
        self.a = np.asarray(a, np.uint8) & 1
        self.b = (np.asarray(b, np.uint8) & 1).reshape(-1)
        self.c = (np.asarray(c, np.uint8) & 1).reshape(-1)
        self.d = int(d) & 1
        self.p = self.a.shape[0]
        self.block = int(block)
        if self.a.shape != (self.p, self.p) or self.b.size != self.p \
                or self.c.size != self.p:
            raise ValueError("inconsistent A/B/C shapes")
        self._cache: dict[int, Gf2Params] = {}

    def matrices(self, length: int) -> Gf2Params:
        if length not in self._cache:
            self._cache[length] = self._build(length)
        return self._cache[length]

    def _build(self, length: int) -> Gf2Params:
        a, b, c, p = self.a, self.b, self.c, self.p
        pw = np.empty((length + 1, p, p), np.uint8)
        pw[0] = np.eye(p, dtype=np.uint8)
        for j in range(1, length + 1):
            pw[j] = (pw[j - 1] @ a) & 1
        g = np.empty((length, p), np.uint8)
        f = np.empty((p, length), np.uint8)
        h = np.zeros((length, length), np.uint8)
        cab = np.empty((length, p), np.uint8)      # rows c @ A^j (for H)
        for j in range(length):
            g[j] = (c @ pw[j]) & 1
            f[:, length - 1 - j] = (pw[j] @ b) & 1
            cab[j] = g[j]
            if self.d:
                h[j, j] = 1
        for i in range(length):
            for j in range(i):
                h[i, j] = int(cab[i - j - 1] @ b) & 1
        return Gf2Params(al=jnp.asarray(pw[length], F32),
                         f=jnp.asarray(f, F32),
                         g=jnp.asarray(g, F32),
                         h=jnp.asarray(h, F32))


def gf2_init(machine: Gf2Machine, state_bits: int | Sequence[int]) -> jax.Array:
    """Initial state vector [p] from an integer (bit i -> s_i) or bit list."""
    if isinstance(state_bits, (int, np.integer)):
        bits = [(int(state_bits) >> i) & 1 for i in range(machine.p)]
    else:
        bits = list(state_bits)
        if len(bits) != machine.p:
            raise ValueError("state bit list length != p")
    return jnp.asarray(bits, F32)


def _apply_one(par: Gf2Params, s: jax.Array, ub: jax.Array):
    """One length-L segment: ub [..., L] -> (s', y [..., L])."""
    hi = jax.lax.Precision.HIGHEST
    y = jnp.mod(jnp.einsum("lm,...m->...l", par.h, ub, precision=hi)
                + jnp.einsum("lp,...p->...l", par.g, s, precision=hi), 2.0)
    s_n = jnp.mod(jnp.einsum("pm,...m->...p", par.f, ub, precision=hi)
                  + jnp.einsum("qp,...p->...q", par.al, s, precision=hi), 2.0)
    return s_n, y


def gf2_apply(machine: Gf2Machine, s: jax.Array,
              u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Run the machine over bits u [..., N] (any N >= 0).

    Returns (state', y [..., N] as 0/1 int32). Full blocks run under one
    lax.scan (batched matmuls); a ragged tail uses exact tail-length
    matrices — no padding, so streaming splits are bit-exact.
    """
    u = jnp.asarray(u, F32)
    s = jnp.asarray(s, F32)
    lead = u.shape[:-1]
    n = u.shape[-1]
    l = machine.block
    k, tail = divmod(n, l)
    outs = []
    if k:
        par = machine.matrices(l)
        ub = jnp.moveaxis(
            u[..., : k * l].reshape(lead + (k, l)), -2, 0)      # [K, ..., L]
        s, yb = jax.lax.scan(lambda c, x: _apply_one(par, c, x), s, ub)
        outs.append(jnp.moveaxis(yb, 0, -2).reshape(lead + (k * l,)))
    if tail:
        s, y_t = _apply_one(machine.matrices(tail), s, u[..., k * l:])
        outs.append(y_t)
    if not outs:
        return s, jnp.zeros(lead + (0,), I32)
    return s, jnp.concatenate(outs, axis=-1).astype(I32)


# ---------------------------------------------------------------------------
# Additive scrambler (free-running LFSR keystream XORed onto the data)
# ---------------------------------------------------------------------------

def make_scrambler(taps: Sequence[int], order: int,
                   block: int = 512) -> Gf2Machine:
    """Fibonacci LFSR keystream generator.

    State bit s_i (stored at index i-1) is the feedback value delayed i
    steps. Output = feedback = XOR of s_i for i in `taps`; the register
    shifts the feedback into s_1. 802.11: ``make_scrambler((4, 7), 7)``
    (x^7 + x^4 + 1); DVB: ``make_scrambler((14, 15), 15)``.
    """
    p = int(order)
    fb = np.zeros(p, np.uint8)
    for t in taps:
        if not 1 <= t <= p:
            raise ValueError("tap outside register")
        fb[t - 1] = 1
    a = np.zeros((p, p), np.uint8)
    a[0] = fb                    # s_1' = feedback
    for i in range(1, p):
        a[i, i - 1] = 1          # shift
    return Gf2Machine(a, np.zeros(p), fb, 0, block)


def scramble(machine: Gf2Machine, s: jax.Array,
             bits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """XOR the keystream onto bits [..., N]. Self-inverse (descrambles)."""
    zeros = jnp.zeros(jnp.shape(bits), F32)
    s_fin, key = gf2_apply(machine, s, zeros)
    out = jnp.bitwise_xor(jnp.asarray(bits, I32), key)
    return s_fin, out


# ---------------------------------------------------------------------------
# CRC
# ---------------------------------------------------------------------------

class CrcSpec(NamedTuple):
    machine: Gf2Machine
    width: int
    init: int
    xorout: int
    reflect: bool


def make_crc(poly: int, width: int, init: int = 0, xorout: int = 0,
             reflect: bool = False, block: int = 512) -> CrcSpec:
    """Generic CRC. `poly` excludes the top x^width term (e.g. CCITT 0x1021).

    reflect=True gives the reflected (LSB-first) family — CRC-32 is
    ``make_crc(0x04C11DB7, 32, 0xFFFFFFFF, 0xFFFFFFFF, reflect=True)`` fed
    with LSB-first bits per byte (see `bytes_to_bits(..., lsb_first=True)`).
    """
    p = int(width)
    if not 1 <= p <= 32:
        raise ValueError("CRC width must be in [1, 32]")
    a = np.zeros((p, p), np.uint8)
    b = np.zeros(p, np.uint8)
    # register bits r_0..r_{p-1} (r_{p-1} = MSB). Per input bit u:
    #   fb = r_{p-1} ^ u ;  r' = (r << 1) ^ (fb ? poly : 0)
    # => r'_i = r_{i-1} + poly_i (r_{p-1} + u)   (r_{-1} = 0)
    for i in range(p):
        if i > 0:
            a[i, i - 1] = 1
        if (poly >> i) & 1:
            a[i, p - 1] ^= 1
            b[i] = 1
    return CrcSpec(machine=Gf2Machine(a, b, np.zeros(p), 0, block),
                   width=p, init=init, xorout=xorout, reflect=bool(reflect))


def crc_init(spec: CrcSpec) -> jax.Array:
    return gf2_init(spec.machine, spec.init)


def crc_update(spec: CrcSpec, s: jax.Array, bits: jax.Array) -> jax.Array:
    """Absorb bits [..., N] (MSB-first per byte; LSB-first when reflected).
    Returns the new register state vector — stream by chaining calls."""
    s_fin, _ = gf2_apply(spec.machine, s, bits)
    return s_fin


def crc_value(spec: CrcSpec, s: jax.Array) -> jax.Array:
    """Register state -> integer CRC (applies reflection + xorout)."""
    bits = jnp.asarray(jnp.round(s), I32)               # [..., p] s_i = bit i
    idx = np.arange(spec.width)
    if spec.reflect:
        idx = idx[::-1].copy()                          # bit-reverse output
    weights = jnp.asarray(np.uint32(1) << idx.astype(np.uint32), jnp.uint32)
    val = jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1)
    return val ^ jnp.asarray(np.uint32(spec.xorout))


def bytes_to_bits(data: bytes, lsb_first: bool = False) -> np.ndarray:
    """Byte string -> 0/1 bit array; lsb_first=True for reflected CRCs."""
    arr = np.frombuffer(data, np.uint8)
    bits = np.unpackbits(arr.reshape(-1, 1), axis=1)
    if lsb_first:
        bits = bits[:, ::-1]
    return bits.reshape(-1).astype(np.int32)

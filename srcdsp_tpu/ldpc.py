"""LDPC codec: GF(2) bit-matrix MXU encoding + normalized min-sum decoding.

Beyond-parity component (the reference's scope is demodulation —
SURVEY.md §2 C1-C12; modern SDR stacks pair the demods in this framework
with LDPC inner codes, e.g. 802.11n/ac, DVB-S2, CCSDS).

TPU-native design:

- **Code construction is host-side numpy** (design time, like ops/design.py):
  a deterministic Gallager-style regular (dv, dc) parity-check matrix with
  4-cycle reduction, plus GF(2) Gaussian elimination to derive a systematic
  generator G. Arbitrary user H matrices are accepted too.
- **Encoding is one MXU matmul**: over GF(2), c = [u | u @ P^T] mod 2 — the
  same bits-as-f32-matmul trick as rs.py / gf2.py. All message blocks in a
  batch encode as a single [B, K] x [K, N-K] matmul.
- **Decoding is dense masked min-sum** on the VPU: messages live as dense
  [M, N] f32 arrays (zeros off the support of H). Check-node updates use a
  sign-product + two-minimum reduction per row — `min2` is obtained by
  masking out the argmin one-hot, all vectorized, no gather/scatter and no
  data-dependent control flow. A fixed-iteration `lax.scan` keeps shapes
  static; the returned syndrome flag reports convergence instead of an
  early exit (the TPU-native pattern used across this framework, cf.
  ops/farrow.py's static-capacity ragged output).

Dense [M, N] masks are the right trade on TPU for the short/medium blocks
used with the demod chains here (n <= a few thousand): the VPU streams the
whole message array from VMEM, while an edge-list (sparse) form would
gather/scatter through lanes. Sparsity is exploited arithmetically (masked
+inf / zeros), not structurally.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import F32, F32_BIG

__all__ = [
    "LdpcCode", "make_regular_ldpc", "make_ldpc_code",
    "ldpc_encode", "ldpc_decode", "minsum_c2v",
]


class LdpcCode(NamedTuple):
    """Static code description. All arrays are host-built numpy -> jnp.

    h: [M, N] f32 {0,1} parity-check mask (dense).
    gp: [K, M] f32 {0,1} parity part of the systematic generator:
        parity = (u @ gp) mod 2, codeword = [u | parity].
    col_perm: [N] int32 permutation mapping the systematic column order
        [info | parity] back to H's original column order (encode output
        and decode input use H's order).
    n, k: code dimensions (N = n columns, K = n - rank(H) info bits).
    """

    h: jax.Array
    gp: jax.Array
    col_perm: jax.Array
    n: int
    k: int


# ---------------------------------------------------------------------------
# Host-side construction (design time)
# ---------------------------------------------------------------------------

def make_regular_ldpc(n: int, dv: int = 3, dc: int = 6,
                      seed: int = 0) -> np.ndarray:
    """Deterministic Gallager-style regular LDPC parity-check matrix.

    n columns of weight dv, m = n*dv/dc rows of weight dc. Built from dv
    stacked permuted block bands (Gallager's construction), then 4-cycle
    reduction: while any column pair shares >1 check, re-draw one of the
    offending column's entries. Returns [m, n] uint8.
    """
    if n % dc != 0:
        raise ValueError(f"n={n} not divisible by dc={dc}")
    rng = np.random.default_rng(seed)
    # Gallager bands: dv stacked bands, each covering every column exactly
    # once with n/dc rows of weight dc; band 0 is the systematic fill,
    # bands 1.. are column permutations of it. m = dv * n / dc total rows.
    rows_per_band = n // dc
    m = dv * rows_per_band
    band = np.zeros((rows_per_band, n), dtype=np.uint8)
    for r in range(rows_per_band):
        band[r, r * dc:(r + 1) * dc] = 1
    blocks = [band[:, rng.permutation(n)] for _ in range(dv)]
    h = np.concatenate(blocks, axis=0)

    # 4-cycle reduction via DEGREE-PRESERVING edge swaps: whenever columns
    # (c1, c2) share >1 check row r, exchange edge (r, c2) with a random
    # edge (r2, c3) — row and column weights are both conserved, so the
    # code stays exactly (dv, dc)-regular.
    for _ in range(200):
        gram = (h.astype(np.int32).T @ h.astype(np.int32))
        np.fill_diagonal(gram, 0)
        bad = np.argwhere(np.triu(gram) > 1)
        if bad.size == 0:
            break
        for c1, c2 in bad:
            shared = np.flatnonzero(h[:, c1] & h[:, c2])
            if shared.size <= 1:
                continue
            r = shared[rng.integers(shared.size)]
            for _attempt in range(30):
                r2 = int(rng.integers(m))
                cols3 = np.flatnonzero(h[r2])
                c3 = int(cols3[rng.integers(cols3.size)])
                if r2 != r and c3 != c2 and h[r, c3] == 0 and h[r2, c2] == 0:
                    h[r, c2] = 0
                    h[r, c3] = 1
                    h[r2, c3] = 0
                    h[r2, c2] = 1
                    break
    return h


def _gf2_systematize(h: np.ndarray):
    """Row-reduce H over GF(2) to [I_M | P] up to a column permutation.

    Returns (h_reduced [Mr, N] with identity in its FIRST Mr permuted
    columns, perm [N] such that h_sys = h_rref[:, perm], rank Mr).
    Dependent rows (rank deficiency) are dropped.
    """
    h = h.copy().astype(np.uint8)
    m, n = h.shape
    perm = list(range(n))
    row = 0
    for col in range(n):
        if row >= m:
            break
        # find a pivot for position (row, ...) among remaining columns
        found = False
        for cc in range(col, n):
            piv = np.flatnonzero(h[row:, perm[cc]])
            if piv.size:
                perm[col], perm[cc] = perm[cc], perm[col]
                found = True
                break
        if not found:
            break
        p = row + piv[0]
        if p != row:
            h[[row, p]] = h[[p, row]]
        c = perm[col]
        elim = np.flatnonzero(h[:, c])
        elim = elim[elim != row]
        h[elim] ^= h[row]
        row += 1
    rank = row
    return h[:rank], np.array(perm, dtype=np.int64), rank


def make_ldpc_code(h: np.ndarray) -> LdpcCode:
    """Build the codec from a parity-check matrix [M, N] of {0,1}.

    Derives a systematic generator by GF(2) elimination: with column
    permutation pi, H[:, pi] = [I | P] (dependent rows dropped), so
    G_sys = [P^T | I_K] over the permuted columns — info bits occupy the
    LAST K permuted columns; `col_perm` restores H's native column order.
    """
    h = np.asarray(h, dtype=np.uint8)
    hr, perm, rank = _gf2_systematize(h)
    m, n = hr.shape
    k = n - rank
    if k <= 0:
        raise ValueError("H has full column rank: code has no info bits")
    # H[:, perm] = [I_rank | P], P: [rank, K]
    p = hr[:, perm[rank:]]
    # parity(u) solves  I*par + P*u = 0  ->  par = P u  (mod 2)
    gp = p.T.astype(np.float32)                       # [K, rank]
    # systematic layout is [parity | info] over perm; emit codewords in H's
    # native column order via the inverse permutation.
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    # native order c[j] = sys[inv[j]] where sys = [par | u]
    return LdpcCode(
        h=jnp.asarray(h.astype(np.float32)),
        gp=jnp.asarray(gp),
        col_perm=jnp.asarray(inv, dtype=jnp.int32),
        n=int(n), k=int(k),
    )


# ---------------------------------------------------------------------------
# Device-side encode / decode
# ---------------------------------------------------------------------------

def ldpc_encode(code: LdpcCode, u: jax.Array) -> jax.Array:
    """Encode info bits -> codeword bits in H's native column order.

    u: [..., K] of {0,1}. One MXU matmul mod 2 for the parity bits
    (cf. rs.py:166's bit-matrix encode).
    """
    uf = u.astype(F32)
    # gp is [K, rank]; parity = (u @ gp) mod 2 -> [..., rank]
    par = jnp.mod(uf @ code.gp, F32(2.0))
    sys = jnp.concatenate([par, uf], axis=-1)             # [..., N] permuted
    out = jnp.take(sys, code.col_perm, axis=-1)
    return out.astype(jnp.int32)


def minsum_c2v(h: jax.Array, v2c: jax.Array, alpha: float) -> jax.Array:
    """Normalized min-sum check-node update on dense masked messages.

    v2c: [..., M, N] variable->check messages (zeros off the support of
    h). The per-edge magnitude is min1 everywhere except the minimum edge,
    which gets min2 — realized by an EQUALITY select instead of argmin +
    one_hot: when the row minimum is unique, `mag == min1` marks exactly
    the argmin edge; when duplicated, excluding any one copy still leaves
    another, so min2 := min1 — handled by the duplicate count. Equality
    on f32 is exact here (min1 is a copy of a mag value). This form uses
    only elementwise ops + axis reductions (no argmin/one_hot/gather), so
    it also lowers on restricted backends.
    """
    big = F32(float(F32_BIG))
    mag = jnp.where(h > 0, jnp.abs(v2c), big)
    sgn = jnp.where(v2c < 0, F32(-1.0), F32(1.0))
    row_sgn = jnp.prod(jnp.where(h > 0, sgn, F32(1.0)), axis=-1,
                       keepdims=True)
    min1 = jnp.min(mag, axis=-1, keepdims=True)
    is_min = (mag == min1).astype(F32)
    dup = jnp.sum(is_min, axis=-1, keepdims=True) > 1.5
    min_excl = jnp.min(jnp.where(is_min > 0, big, mag), axis=-1,
                       keepdims=True)
    min2 = jnp.where(dup, min1, min_excl)
    emag = jnp.where(is_min > 0, min2, min1)
    emag = jnp.where(emag >= big, F32(0.0), emag)
    return F32(alpha) * row_sgn * sgn * emag * h


def ldpc_decode(code: LdpcCode, llr: jax.Array, iters: int = 25,
                alpha: float = 0.8125, unroll: bool = False):
    """Normalized min-sum decode. llr: [..., N] with llr>0 favoring bit 0
    (the standard 2r/sigma^2 convention for BPSK 0->+1, 1->-1).

    Returns (bits [..., N] int32, info [..., K] int32, ok [...] bool) where
    ok means every parity check is satisfied after `iters` iterations.
    Fixed iteration count + convergence flag (static shapes; no early
    exit). unroll=True replaces the lax.scan with a trace-time Python loop
    — the whole decode then uses only elementwise/reduce/matmul ops and
    runs on restricted backends (e.g. the axon on-chip subset, which has
    no scan).
    """
    h = code.h                       # [M, N]
    batch = llr.shape[:-1]
    lf = llr.astype(F32)

    def body(msg_cv, _):
        # variable -> check: extrinsic LLR per edge
        tot = lf[..., None, :] + jnp.sum(msg_cv, axis=-2, keepdims=True)
        v2c = (tot - msg_cv) * h     # [..., M, N] zeros off support
        return minsum_c2v(h, v2c, alpha), None

    msg0 = jnp.zeros((*batch, *h.shape), dtype=F32)
    if unroll:
        msg = msg0
        for _ in range(iters):
            msg, _ = body(msg, None)
    else:
        msg, _ = jax.lax.scan(body, msg0, None, length=iters)
    post = lf + jnp.sum(msg, axis=-2)
    bits = (post < 0).astype(jnp.int32)
    syn = jnp.mod(bits.astype(F32) @ h.T.astype(F32), F32(2.0))
    ok = jnp.all(syn == 0, axis=-1)
    # info bits live at native positions col_perm[rank:] — equivalently,
    # gather the LAST K systematic slots back out of the native order.
    inv = jnp.argsort(code.col_perm)          # native -> systematic
    info = jnp.take(bits, inv[code.n - code.k:], axis=-1)
    return bits, info, ok

"""Quasi-cyclic LDPC + layered min-sum (beyond parity; builds on ldpc.py).

Production LDPC (802.11n/ac, 5G NR, DVB-S2) is quasi-cyclic: H is an
[Mb, Nb] protograph of Z x Z circulant blocks (shift s, or -1 for a zero
block). Two things fall out of that structure, both implemented here:

- **Construction** (`make_qc_base`, `qc_expand`, `make_qc_ldpc`): expand
  any base matrix of shifts into the dense H that ldpc.py's engine
  consumes (user-supplied standard tables plug straight in), or draw a
  deterministic girth-conditioned base matrix: shifts are rejected unless
  every 2x2 submatrix satisfies s11 - s12 + s22 - s21 != 0 (mod Z) — the
  exact algebraic condition for the expanded graph to be 4-cycle-free.

- **Layered decoding** (`ldpc_decode_layered`): within one block-row, the
  Z expanded rows touch DISJOINT columns (each circulant has one 1 per
  row/column), so a block-row is a conflict-free layer. Processing layers
  sequentially with immediate posterior updates (serial schedule)
  converges in roughly HALF the iterations of ldpc.py's flooding
  schedule — the classic layered-BP result, verified in the tests on the
  same channel draws. Each layer update is the same dense masked
  sign/two-min reduction as ldpc.py, on a [Z, N] slice; the layer loop is
  a `lax.scan` over stacked layer slices (static shapes, no gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ldpc import LdpcCode, make_ldpc_code, minsum_c2v
from srcdsp_tpu.types import F32

__all__ = ["make_qc_base", "qc_expand", "make_qc_ldpc",
           "ldpc_decode_layered", "make_dual_diagonal_base",
           "qc_encode_dual_diagonal", "load_qc_table"]


def make_qc_base(mb: int, nb: int, z: int, seed: int = 0) -> np.ndarray:
    """Deterministic girth-conditioned base matrix [mb, nb] of shifts.

    Fully dense protograph (every block a circulant; column weight mb).
    Shifts are drawn and re-drawn until every 2x2 submatrix satisfies
    the no-4-cycle condition; mb*nb must be modest (standard protographs
    are, e.g. 4x24). Raises if z is too small to satisfy the condition.
    """
    rng = np.random.default_rng(seed)
    base = np.zeros((mb, nb), np.int64)
    for j in range(nb):
        for i in range(mb):
            for _attempt in range(200):
                s = int(rng.integers(z))
                ok = True
                for i2 in range(i):
                    for j2 in range(j):
                        d = (base[i, j2] - base[i2, j2] + base[i2, j]
                             - s) % z
                        if d == 0:
                            ok = False
                            break
                    if not ok:
                        break
                if ok:
                    base[i, j] = s
                    break
            else:
                raise ValueError(f"no 4-cycle-free shift found at ({i},{j}) "
                                 f"— increase z (got {z})")
    return base


def qc_expand(base: np.ndarray, z: int) -> np.ndarray:
    """Expand a shift protograph into dense H [mb*z, nb*z] uint8.
    base[i, j] = shift (0..z-1) or -1 for the all-zero block."""
    base = np.asarray(base, np.int64)
    mb, nb = base.shape
    h = np.zeros((mb * z, nb * z), np.uint8)
    eye = np.eye(z, dtype=np.uint8)
    for i in range(mb):
        for j in range(nb):
            s = base[i, j]
            if s < 0:
                continue
            # row r of the block has its 1 at column (r + s) mod z
            h[i * z:(i + 1) * z, j * z:(j + 1) * z] = np.roll(eye, int(s),
                                                              axis=1)
    return h


def make_qc_ldpc(base: np.ndarray, z: int) -> LdpcCode:
    """Expanded QC code through ldpc.py's generator derivation. The
    LdpcCode is byte-compatible with ldpc_decode AND ldpc_decode_layered
    (which additionally exploits the block-row layer structure via z)."""
    return make_ldpc_code(qc_expand(base, z))


def ldpc_decode_layered(code: LdpcCode, llr: jax.Array, z: int,
                        iters: int = 12, alpha: float = 0.8125):
    """Layered normalized min-sum. llr: [..., N]; `z` = circulant size of
    the code's construction (M % z == 0; each block-row is one layer).

    Same return contract as ldpc.ldpc_decode: (bits, info, ok). Converges
    in roughly half the flooding iterations because each layer sees the
    posteriors already updated by the layers before it in the SAME
    iteration (serial schedule).
    """
    h = code.h                                  # [M, N]
    m = h.shape[0]
    if m % z != 0:
        raise ValueError(f"M={m} not divisible by layer size z={z}")
    layers = m // z
    hl = h.reshape(layers, z, h.shape[1])       # [L, Z, N]
    batch = llr.shape[:-1]
    post0 = llr.astype(F32)
    msg0 = jnp.zeros((layers, *batch, z, h.shape[1]), F32)

    def layer_update(carry, inputs):
        post, = carry
        msg_l, h_l = inputs                     # [..., Z, N], [Z, N]
        v2c = (post[..., None, :] - msg_l) * h_l
        c2v = minsum_c2v(h_l, v2c, alpha)
        # within a layer the Z rows touch disjoint columns, so the
        # immediate posterior update is conflict-free
        post = post + jnp.sum(c2v - msg_l, axis=-2)
        return (post,), c2v

    def iteration(carry, _):
        post, msg = carry
        (post,), msg = jax.lax.scan(layer_update, (post,), (msg, hl))
        return (post, msg), None

    (post, _), _ = jax.lax.scan(iteration, (post0, msg0), None,
                                length=iters)
    bits = (post < 0).astype(jnp.int32)
    syn = jnp.mod(bits.astype(F32) @ h.T.astype(F32), F32(2.0))
    ok = jnp.all(syn == 0, axis=-1)
    inv = jnp.argsort(code.col_perm)
    info = jnp.take(bits, inv[code.n - code.k:], axis=-1)
    return bits, info, ok


# ---------------------------------------------------------------------------
# Standards-shaped construction + O(N) structured encoding
# ---------------------------------------------------------------------------
#
# Production QC codes (802.11n/ac, 802.16e, 5G NR) put the parity part of
# the base matrix in DUAL-DIAGONAL form so encoding is O(N) back-
# substitution instead of a dense [K, M] generator matmul. The exact
# standard shift TABLES are not available in this environment (no
# network; site-packages grepped 2026-08-19 — no sionna/commpy/anything
# shipping them), so `make_dual_diagonal_base` draws a girth-conditioned
# systematic part around the standard parity structure, and
# `load_qc_table` parses the usual textual table format so a real
# standard table pastes straight in when one is available.

def load_qc_table(text: str) -> np.ndarray:
    """Parse a textual QC shift table: one base-matrix row per line,
    integers separated by whitespace (or commas), `-1` (or `-`) for the
    all-zero block — the format 802.11n/802.16e/5G tables are usually
    published in. Returns [mb, nb] int64."""
    rows = []
    for line in text.strip().splitlines():
        line = line.replace(",", " ").strip()
        if not line or line.startswith("#"):
            continue
        rows.append([-1 if tok == "-" else int(tok)
                     for tok in line.split()])
    if not rows or any(len(r) != len(rows[0]) for r in rows):
        raise ValueError("ragged or empty shift table")
    return np.asarray(rows, np.int64)


def make_dual_diagonal_base(mb: int, nb: int, z: int, seed: int = 0,
                            p0_shift: int = 1) -> np.ndarray:
    """Standards-shaped base matrix: girth-conditioned systematic part +
    the 802.11n-style dual-diagonal parity part.

    Parity block-columns: column 0 carries shifts [p0_shift, ..., 0 (at
    one middle row), ..., p0_shift] so the block-row sum telescopes to
    p0 = sum(lambda_i); columns 1..mb-1 are the zero-shift dual diagonal
    (identity at rows j-1 and j). Encode with qc_encode_dual_diagonal
    (O(N)); decode with ldpc_decode_layered / the Pallas QC kernel.
    """
    if nb <= mb:
        raise ValueError(f"need nb > mb, got {nb} <= {mb}")
    if mb < 3:
        raise ValueError(f"dual-diagonal parity needs mb >= 3, got {mb}")
    rng = np.random.default_rng(seed)
    base = -np.ones((mb, nb), np.int64)
    kb = nb - mb
    # parity structure (fixed)
    mid = mb // 2
    base[0, kb] = p0_shift % z
    base[mid, kb] = 0
    base[mb - 1, kb] = p0_shift % z
    for j in range(mb - 1):
        base[j, kb + 1 + j] = 0
        base[j + 1, kb + 1 + j] = 0
    # systematic part: draw shifts rejecting any 4-cycle against ALL
    # already-placed entries (same algebraic condition as make_qc_base)
    def makes_4cycle(i, j, s):
        for j2 in range(nb):
            if j2 == j or base[i, j2] < 0:
                continue
            for i2 in range(mb):
                if i2 == i or base[i2, j2] < 0 or base[i2, j] < 0:
                    continue
                if (s - base[i, j2] + base[i2, j2] - base[i2, j]) % z == 0:
                    return True
        return False

    for j in range(kb):
        for i in range(mb):
            for _attempt in range(400):
                s = int(rng.integers(z))
                if not makes_4cycle(i, j, s):
                    base[i, j] = s
                    break
            else:
                raise ValueError(f"no 4-cycle-free shift at ({i},{j}); "
                                 f"increase z (got {z})")
    return base


def qc_encode_dual_diagonal(base: np.ndarray, z: int, u):
    """O(N) structured QC encode for a dual-diagonal base matrix.

    u: [..., K] bits with K = (nb - mb) * z. Returns codewords
    [..., nb * z] in the expanded H's native column order
    ([info | p0 | q_0..q_{mb-2}]), ready for ldpc_decode_layered /
    qc_decode_layered_pallas (whose hard decisions put info in the first
    K native columns).

    Derivation: block-row i reads lambda_i = sum_j shift(s_ij) u_j (a
    circulant with shift s maps x -> roll(x, -s)); summing all block
    rows telescopes the dual diagonal away and the two p0_shift entries
    cancel mod 2, leaving shift(0) p0 = sum_i lambda_i, i.e.
    p0 = sum lambda_i; then q_0 = lambda_0 + A_0 p0 and
    q_i = q_{i-1} + lambda_i + A_i p0 back-substitute in one pass.
    """
    base = np.asarray(base, np.int64)
    mb, nb = base.shape
    kb = nb - mb
    u = jnp.asarray(u)
    if u.shape[-1] != kb * z:
        raise ValueError(f"u last dim {u.shape[-1]} != K = {kb * z}")
    ui = u.astype(jnp.int32)
    blocks = [ui[..., j * z:(j + 1) * z] for j in range(kb)]

    def shift(x, s):
        return jnp.roll(x, -int(s), axis=-1)

    lam = []
    for i in range(mb):
        acc = jnp.zeros_like(ui[..., :z])
        for j in range(kb):
            s = base[i, j]
            if s >= 0:
                acc = jnp.bitwise_xor(acc, shift(blocks[j], s))
        lam.append(acc)
    p0 = lam[0]
    for i in range(1, mb):
        p0 = jnp.bitwise_xor(p0, lam[i])

    def a_term(i):
        s = base[i, kb]
        if s < 0:
            return None
        return shift(p0, s)

    qs = []
    prev = jnp.zeros_like(p0)
    for i in range(mb - 1):
        t = jnp.bitwise_xor(prev, lam[i])
        a = a_term(i)
        if a is not None:
            t = jnp.bitwise_xor(t, a)
        qs.append(t)
        prev = t
    return jnp.concatenate([ui, p0] + qs, axis=-1)

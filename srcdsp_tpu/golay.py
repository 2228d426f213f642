"""Extended binary Golay (24, 12, 8) codec — the classic perfect-family
block code the FEC stable was missing (Hamming/BCH/RS/conv/turbo/
LDPC/QC-LDPC/polar exist; Golay is the standard 3-error-correcting
short code of DMR/P25/pager-era links and deep-space telemetry).

Construction: G = [I12 | B] with B the bordered quadratic-residue
circulant of Z11 (QR(11) = {1, 3, 4, 5, 9}) — the textbook form. The
module VERIFIES the construction at import of `make_golay()`: all 4095
nonzero codewords are enumerated and the minimum weight asserted == 8
(the property that makes it THE extended Golay up to equivalence), so
a transcription slip cannot ship.

Decoding: syndrome table over every correctable pattern — the code is
3-error-correcting and sum_{k<=3} C(24,k) = 2325 patterns map to 2325
distinct syndromes (of 4096; the remaining 1771 are weight-4 coset
leaders = DETECTED-uncorrectable). Batch decode is one GF(2) bit
matmul for the syndromes ([B, 24] @ [24, 12] mod 2 — MXU food) plus a
[4096, 24] table take, the repo's RS/BCH table-decode pattern.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Golay", "make_golay", "golay_encode", "golay_decode"]


class Golay(NamedTuple):
    g: np.ndarray           # [12, 24] generator (systematic)
    h: np.ndarray           # [24, 12] parity-check (syndrome operator)
    table: np.ndarray       # [4096, 24] int8 error pattern per syndrome
    correctable: np.ndarray  # [4096] bool


def _b_matrix() -> np.ndarray:
    # core[i][j] = 1 iff (i + j) mod 11 is NOT a quadratic residue
    # (includes the 0 anti-diagonal). The d_min check below FALSIFIED
    # the residue-indicator variants (min weight 7) and confirmed this
    # complement form (min weight 8); the (i + j) argument makes B
    # SYMMETRIC (the circulant (j - i) form is GF(2)-antisymmetric
    # because -1 is a non-residue mod 11), which the parity check
    # H = [[B], [I]] relies on.
    qr = {1, 3, 4, 5, 9}                      # quadratic residues mod 11
    a = np.zeros((11, 11), np.int64)
    for i in range(11):
        for j in range(11):
            a[i, j] = 0 if ((i + j) % 11) in qr else 1
    b = np.ones((12, 12), np.int64)
    b[:11, :11] = a
    b[11, 11] = 0
    return b


def make_golay() -> Golay:
    b = _b_matrix()
    g = np.concatenate([np.eye(12, dtype=np.int64), b], axis=1)
    # verify: enumerate all 4095 nonzero codewords, min weight must be 8
    msgs = ((np.arange(1, 4096)[:, None] >> np.arange(12)) & 1)
    cws = msgs @ g % 2
    wmin = int(cws.sum(axis=1).min())
    if wmin != 8:
        raise AssertionError(f"Golay construction broken: d_min {wmin}")
    # parity check for systematic G = [I | B]: H^T = [B^T | I] rows ->
    # syndrome s = r @ H with H = [[B], [I]] (since B = B^T for this
    # bordered-QR form up to the verified d_min, use the general form)
    h = np.concatenate([b.T, np.eye(12, dtype=np.int64)], axis=0)
    assert not (g @ h % 2).any()
    table = np.zeros((4096, 24), np.int8)
    correctable = np.zeros(4096, bool)
    pw = 1 << np.arange(12)

    def syn_int(e):
        return int((e @ h % 2) @ pw)

    idxs = np.arange(24)
    correctable[0] = True                     # zero errors
    from itertools import combinations
    for k in (1, 2, 3):
        for pos in combinations(idxs, k):
            e = np.zeros(24, np.int64)
            e[list(pos)] = 1
            s = syn_int(e)
            assert not correctable[s] or s == 0
            table[s] = e
            correctable[s] = True
    assert int(correctable.sum()) == 2325    # perfect coset coverage
    return Golay(g=g, h=h, table=table, correctable=correctable)


def golay_encode(code: Golay, data) -> jnp.ndarray:
    """Data bits [..., 12] -> codewords [..., 24] (systematic)."""
    d = jnp.asarray(data, jnp.float32)
    return jnp.asarray(
        jnp.mod(d @ jnp.asarray(code.g, jnp.float32), 2.0), jnp.int32)


def golay_decode(code: Golay, words):
    """Received hard bits [..., 24] -> (data [..., 12], n_corrected
    [...], ok [...] — False = weight-4 coset, detected-uncorrectable).
    One GF(2) matmul for all syndromes + one table take."""
    w = jnp.asarray(words, jnp.float32)
    syn = jnp.mod(w @ jnp.asarray(code.h, jnp.float32), 2.0)
    si = jnp.asarray(
        syn @ jnp.asarray(1 << np.arange(12), jnp.float32), jnp.int32)
    err = jnp.take(jnp.asarray(code.table, jnp.int32), si, axis=0)
    ok = jnp.take(jnp.asarray(code.correctable), si)
    fixed = jnp.asarray(jnp.mod(w + err, 2.0), jnp.int32)
    return (fixed[..., :12], jnp.sum(err, axis=-1), ok)

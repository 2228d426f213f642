"""Pallas LDPC min-sum decoder kernels (SURVEY.md §2 beyond-parity FEC tier).

Round 2 measured the XLA-lowered dense decode at 7.5 Mb/s coded on-chip
while the demod chains run at 19 Gs/s — any coded link was decoder-bound
by ~1000x (VERDICT round 2 #3). The dense [B, M, N] message tensor is the
problem: every min-sum iteration streams B*M*N floats through HBM. These
kernels keep the message state in VMEM for ALL iterations and touch HBM
once per codeword batch.

Two kernels, one edge-form data model:

- **`ldpc_decode_pallas`** (generic H, short/medium codes): messages live
  per-EDGE as [dc*M_pad, B] (row-major) / [dv*N_pad, B] (column-major)
  f32 planes with codewords along lanes. The static row<->column edge
  permutation is applied as a 0/1 PERMUTATION MATMUL on the MXU — the
  same trick that fixed config-4's tail (kernels/fsk_fused.py
  class_major) and the config-3 unscramble. Messages are quantized to
  the bf16 grid before each permutation, which makes the DEFAULT
  single-pass bf16 matmul **bit-exact** (one 1.0 per row; products and
  sums of on-grid values are exact in the f32 accumulator), so the whole
  decode is reproducible bit-for-bit against the jnp reference tier
  (`ldpc_decode_edges_ref`) — quantized normalized min-sum is the
  standard hardware-decoder variant (6-8 bit messages; bf16's 8-bit
  mantissa is at the generous end). The P matrix is [dv*N_pad, dc*M_pad]
  bf16 in VMEM, so this kernel is for n up to ~1k (the regular (3,6)
  n=504 code of bench/ldpc_onchip.py fits with room to spare); the QC
  kernel below covers production block lengths.

- **`qc_decode_layered_pallas`** (quasi-cyclic H, any size): exploits the
  circulant structure the way decoder ASICs do — a layer's Z checks
  touch each block-column through a cyclic shift, so the column gather
  is `pltpu.roll` on sublanes (no gather, no matmul, no P matrix). The
  serial layered schedule (immediate posterior updates) halves the
  iteration count vs flooding (qcldpc.ldpc_decode_layered's result).
  All-elementwise f32 + rolls => bit-exact vs its jnp reference
  (`qc_decode_layered_ref`) with no quantization needed. The bit-exact
  contract is JIT-TO-JIT ON THE SAME BACKEND: XLA contracts mul+add into
  FMA inside jit, so an eagerly-executed reference rounds
  `alpha*es*em - old` differently by ~1 ulp (measured), and the Mosaic
  hardware lowering contracts differently again — across backends the
  guarantee is exact DECISIONS (verified on-chip vs CPU at n=1536),
  with posteriors ~1 ulp apart. (The edge-form kernel above is bit-exact
  across backends because every value is quantized to the bf16 grid.)

Reference parity note: the reference library family has no FEC layer
(SURVEY.md §2 C1-C12); this extends the framework's beyond-parity FEC
stack (ldpc.py / qcldpc.py) with the serving-speed decode path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.ldpc import LdpcCode
from srcdsp_tpu.types import F32

__all__ = [
    "EdgePlan", "plan_edges", "ldpc_decode_edges_ref", "ldpc_decode_pallas",
    "make_ldpc_kernel", "make_ldpc_decoder",
    "QcPlan", "plan_qc", "qc_decode_layered_ref", "qc_decode_layered_pallas",
    "make_qc_kernel", "make_qc_decoder", "make_qc_decoder_t",
]

BIG = 1e30  # finite mask value (matches ldpc.minsum_c2v's F32_BIG role)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _q(x: jax.Array) -> jax.Array:
    """Quantize to the bf16 grid (round-to-nearest-even), stay f32."""
    return x.astype(jnp.bfloat16).astype(F32)


# ---------------------------------------------------------------------------
# Generic-H edge plan (host-side, design time)
# ---------------------------------------------------------------------------

class EdgePlan(NamedTuple):
    """Static edge-form decode plan for a dense parity-check matrix.

    Edge slots are padded to rectangular [dc, M_pad] / [dv, N_pad] grids
    (flattened into the leading axis); `perm` carries row-major c2v
    messages into column-major order (and its transpose goes back).
    Invalid slots have zero P rows/columns and are masked with +BIG
    magnitudes in the check update, so irregular codes work unchanged.
    """

    perm: np.ndarray       # [dv*N_pad, dc*M_pad] f32 {0,1}
    row_valid: np.ndarray  # [dc*M_pad, 1] f32 {0,1} real row-edge slots
    col_src: np.ndarray    # [dv*N_pad] int32 row-slot feeding each col slot (-1 none)
    row_src: np.ndarray    # [dc*M_pad] int32 col-slot feeding each row slot (-1 none)
    n: int
    m: int
    n_pad: int
    m_pad: int
    dv: int                # max column degree
    dc: int                # max row degree


def plan_edges(h: np.ndarray) -> EdgePlan:
    """Build the static edge permutation plan from H [M, N] of {0,1}."""
    h = np.asarray(h) != 0
    m, n = h.shape
    dc = int(h.sum(axis=1).max())
    dv = int(h.sum(axis=0).max())
    if dc < 2:
        raise ValueError("need row degree >= 2 for a check update")
    # pad to bf16 sublane tiles (16) so static slab slices stay aligned
    m_pad = _round_up(m, 16)
    n_pad = _round_up(n, 16)
    e_row = dc * m_pad
    e_col = dv * n_pad
    perm = np.zeros((e_col, e_row), np.float32)
    row_valid = np.zeros((e_row, 1), np.float32)
    col_src = np.full(e_col, -1, np.int32)
    row_src = np.full(e_row, -1, np.int32)
    col_fill = np.zeros(n, np.int64)  # next free slot index per column
    for r in range(m):
        for d, c in enumerate(np.flatnonzero(h[r])):
            q_slot = d * m_pad + r
            p_slot = int(col_fill[c]) * n_pad + int(c)
            col_fill[c] += 1
            perm[p_slot, q_slot] = 1.0
            row_valid[q_slot, 0] = 1.0
            col_src[p_slot] = q_slot
            row_src[q_slot] = p_slot
    return EdgePlan(perm=perm, row_valid=row_valid, col_src=col_src,
                    row_src=row_src, n=n, m=m, n_pad=n_pad, m_pad=m_pad,
                    dv=dv, dc=dc)


# ---------------------------------------------------------------------------
# Shared check-node math (IDENTICAL jnp code in kernel and reference —
# op-for-op, so f32 IEEE semantics make the two tiers bit-equal)
# ---------------------------------------------------------------------------

def _minsum_slabs(v: list, valid: list, alpha: float) -> list:
    """Normalized min-sum over dc edge slabs.

    v[d]: [R, B] quantized v2c message of each row's d-th edge;
    valid[d]: [R, 1] {0,1}. Exclusive min/sign per slab via prefix/suffix
    trees (pure selections — no rounding), then alpha-scale + bf16-grid
    quantize. Invalid slots emit exact 0. Matches ldpc.minsum_c2v's
    conventions (sign(0)=+1; all-masked rows emit 0).
    """
    big = F32(BIG)
    dc = len(v)
    mag = [jnp.where(valid[d] > 0, jnp.abs(v[d]), big) for d in range(dc)]
    sgn = [jnp.where(valid[d] > 0,
                     jnp.where(v[d] < 0, F32(-1.0), F32(1.0)),
                     F32(1.0)) for d in range(dc)]
    pre_m, pre_s = [mag[0]], [sgn[0]]
    for d in range(1, dc):
        pre_m.append(jnp.minimum(pre_m[-1], mag[d]))
        pre_s.append(pre_s[-1] * sgn[d])
    suf_m, suf_s = [None] * dc, [None] * dc
    suf_m[dc - 1], suf_s[dc - 1] = mag[dc - 1], sgn[dc - 1]
    for d in range(dc - 2, -1, -1):
        suf_m[d] = jnp.minimum(mag[d], suf_m[d + 1])
        suf_s[d] = sgn[d] * suf_s[d + 1]
    out = []
    for d in range(dc):
        if d == 0:
            em, es = suf_m[1], suf_s[1]
        elif d == dc - 1:
            em, es = pre_m[dc - 2], pre_s[dc - 2]
        else:
            em = jnp.minimum(pre_m[d - 1], suf_m[d + 1])
            es = pre_s[d - 1] * suf_s[d + 1]
        c = _q(F32(alpha) * es * em)
        c = jnp.where(em >= big, F32(0.0), c)   # degree-1 rows: no update
        out.append(jnp.where(valid[d] > 0, c, F32(0.0)))
    return out


def _edge_iterations(lf, c_slabs, rv_slabs, permute_cv, permute_vc,
                     iters: int, alpha: float, dv: int):
    """The flooding schedule on edge slabs; permutations injected so the
    kernel (matmul) and reference (gather) share every arithmetic op."""
    for _ in range(iters):
        post = lf
        for j in range(dv):
            post = post + c_slabs[j]
        v_slabs = [_q(post - c_slabs[j]) for j in range(dv)]
        r_slabs = permute_vc(v_slabs)             # col-major -> row-major
        new_r = _minsum_slabs(r_slabs, rv_slabs, alpha)
        c_slabs = permute_cv(new_r)               # row-major -> col-major
    post = lf
    for j in range(dv):
        post = post + c_slabs[j]
    return post


# ---------------------------------------------------------------------------
# jnp reference tier (CPU bit-exactness oracle for the kernel)
# ---------------------------------------------------------------------------

def ldpc_decode_edges_ref(plan: EdgePlan, llr: jax.Array, iters: int = 10,
                          alpha: float = 0.8125) -> jax.Array:
    """Quantized edge-form flooding min-sum, plain jnp (gather-based).

    llr: [N, B] (codewords along lanes, already transposed). Returns the
    posterior [N, B] f32 — bit-identical to the Pallas kernel's output on
    every backend (both paths use IEEE f32 elementwise ops and exact
    permutations; see module docstring).
    """
    p = plan
    lf = _q(llr.astype(F32))
    lf = jnp.pad(lf, ((0, p.n_pad - p.n), (0, 0)))
    b = lf.shape[-1]
    rs = jnp.asarray(np.where(p.row_src < 0, 0, p.row_src), jnp.int32)
    rm = jnp.asarray((p.row_src >= 0).astype(np.float32)[:, None])
    cs = jnp.asarray(np.where(p.col_src < 0, 0, p.col_src), jnp.int32)
    cm = jnp.asarray((p.col_src >= 0).astype(np.float32)[:, None])
    rv = [jnp.asarray(p.row_valid[d * p.m_pad:(d + 1) * p.m_pad])
          for d in range(p.dc)]

    def permute_vc(v_slabs):
        flat = jnp.concatenate(v_slabs, axis=0)
        out = jnp.take(flat, rs, axis=0) * rm
        return [out[d * p.m_pad:(d + 1) * p.m_pad] for d in range(p.dc)]

    def permute_cv(r_slabs):
        flat = jnp.concatenate(r_slabs, axis=0)
        out = jnp.take(flat, cs, axis=0) * cm
        return [out[j * p.n_pad:(j + 1) * p.n_pad] for j in range(p.dv)]

    c0 = [jnp.zeros((p.n_pad, b), F32) for _ in range(p.dv)]
    post = _edge_iterations(lf, c0, rv, permute_cv, permute_vc,
                            iters, alpha, p.dv)
    return post[:p.n]


# ---------------------------------------------------------------------------
# Pallas kernel (generic H)
# ---------------------------------------------------------------------------

def _ldpc_kernel(llr_ref, p_ref, rv_ref, post_ref, *, n_pad: int,
                 m_pad: int, dv: int, dc: int, iters: int, alpha: float):
    lf = _q(llr_ref[:].astype(F32))
    b = lf.shape[-1]
    rv = [rv_ref[d * m_pad:(d + 1) * m_pad, :] for d in range(dc)]

    def permute_vc(v_slabs):
        flat = jnp.concatenate(v_slabs, axis=0).astype(jnp.bfloat16)
        # V_row[q] = sum_p P[p, q] * V_col[p]  (contract both axis 0)
        out = jax.lax.dot_general(
            p_ref[:], flat, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=F32)
        return [out[d * m_pad:(d + 1) * m_pad] for d in range(dc)]

    def permute_cv(r_slabs):
        flat = jnp.concatenate(r_slabs, axis=0).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            p_ref[:], flat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=F32)
        return [out[j * n_pad:(j + 1) * n_pad] for j in range(dv)]

    c0 = [jnp.zeros((n_pad, b), F32) for _ in range(dv)]
    post_ref[:] = _edge_iterations(lf, c0, rv, permute_cv, permute_vc,
                                   iters, alpha, dv)


def make_ldpc_kernel(plan: EdgePlan, iters: int = 10, alpha: float = 0.8125,
                     b_tile: int = 128, interpret: bool = False):
    """Build the batched decode fn: llr [N, B] -> posterior [N, B] f32.

    B must be a multiple of b_tile. The P matrix and message planes live
    in VMEM across all iterations; the grid walks batch tiles.

    The returned fn is INTERNALLY jitted with the P matrix and masks as
    ARGUMENTS, not closure constants: on the tunnel-attached backend a
    closure-constant array is re-shipped on every call — measured 26 ms
    fixed per call (any batch) vs 0.10 ms with P passed as an argument
    (a 265x difference; BASELINE.md round-3 notes). Do NOT wrap the
    returned fn in another jax.jit: an outer trace would re-embed the
    captured arrays as constants and reintroduce the penalty.
    """
    p = plan
    e_col, e_row = p.perm.shape
    kern = functools.partial(_ldpc_kernel, n_pad=p.n_pad, m_pad=p.m_pad,
                             dv=p.dv, dc=p.dc, iters=iters, alpha=alpha)

    def _call(llr, perm, rv):
        b = llr.shape[1]
        lf = jnp.pad(llr.astype(F32), ((0, p.n_pad - p.n), (0, 0)))
        post = pl.pallas_call(
            kern,
            grid=(b // b_tile,),
            in_specs=[
                pl.BlockSpec((p.n_pad, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_col, e_row), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_row, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p.n_pad, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((p.n_pad, b), F32),
            # the unrolled iterations keep P + several message planes
            # live; the default 16M scoped-vmem stack is ~2M short at
            # b_tile=128 (measured OOM: 18.22M)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lf, perm, rv)
        return post[:p.n]

    _call = jax.jit(_call)
    perm_dev = jnp.asarray(p.perm, jnp.bfloat16)
    rv_dev = jnp.asarray(p.row_valid, F32)

    def run(llr: jax.Array) -> jax.Array:
        n, b = llr.shape
        if n != p.n or b % b_tile:
            raise ValueError(f"llr [{n},{b}] vs plan n={p.n}, tile {b_tile}")
        return _call(llr, perm_dev, rv_dev)

    return run


def make_ldpc_decoder(code: LdpcCode, plan: EdgePlan, iters: int = 10,
                      alpha: float = 0.8125, b_tile: int = 128,
                      interpret: bool = False):
    """Build the serving decode fn: llr [B, N] -> (bits, info, ok).

    Same contract as ldpc.ldpc_decode. One jitted computation with every
    code array passed as an argument (see make_ldpc_kernel's note on
    closure constants); the info-bit gather indices are computed host-
    side (no traced argsort). Do not wrap in another jax.jit.
    """
    p = plan
    e_col, e_row = p.perm.shape
    kern = functools.partial(_ldpc_kernel, n_pad=p.n_pad, m_pad=p.m_pad,
                             dv=p.dv, dc=p.dc, iters=iters, alpha=alpha)
    inv = np.argsort(np.asarray(code.col_perm))
    info_idx = jnp.asarray(inv[code.n - code.k:], jnp.int32)
    perm_dev = jnp.asarray(p.perm, jnp.bfloat16)
    rv_dev = jnp.asarray(p.row_valid, F32)
    ht = jnp.asarray(code.h.T, F32)

    def _dec(llr, perm, rv, ht, info_idx):
        b = llr.shape[0]
        b_pad = _round_up(max(b, b_tile), b_tile)
        lf = jnp.pad(llr.astype(F32), ((0, b_pad - b), (0, 0)))
        lf = jnp.pad(lf.T, ((0, p.n_pad - p.n), (0, 0)))
        post = pl.pallas_call(
            kern,
            grid=(b_pad // b_tile,),
            in_specs=[
                pl.BlockSpec((p.n_pad, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_col, e_row), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_row, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p.n_pad, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((p.n_pad, b_pad), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lf, perm, rv)
        bits = (post[:p.n, :b].T < 0).astype(jnp.int32)
        syn = jnp.mod(bits.astype(F32) @ ht, F32(2.0))
        ok = jnp.all(syn == 0, axis=-1)
        info = jnp.take(bits, info_idx, axis=-1)
        return bits, info, ok

    _dec = jax.jit(_dec)
    return lambda llr: _dec(llr, perm_dev, rv_dev, ht, info_idx)


def ldpc_decode_pallas(code: LdpcCode, plan: EdgePlan, llr: jax.Array,
                       iters: int = 10, alpha: float = 0.8125,
                       b_tile: int = 128, interpret: bool = False):
    """One-shot convenience wrapper over make_ldpc_decoder (which serving
    code should call directly to amortize the build)."""
    return make_ldpc_decoder(code, plan, iters=iters, alpha=alpha,
                             b_tile=b_tile, interpret=interpret)(llr)


# ---------------------------------------------------------------------------
# Quasi-cyclic layered kernel (structured codes, any block length)
# ---------------------------------------------------------------------------

class QcPlan(NamedTuple):
    """Static plan for a QC base matrix: per layer, the participating
    block-columns and their circulant shifts (host lists — all static)."""

    layers: tuple          # tuple of (cols tuple, shifts tuple) per layer
    z: int
    nb: int
    n_blocks: int          # total non-zero circulants (message slabs)


def plan_qc(base: np.ndarray, z: int) -> QcPlan:
    if z % 8:
        raise ValueError(f"z={z} must be a multiple of 8 (sublane tile)")
    base = np.asarray(base, np.int64)
    layers = []
    for i in range(base.shape[0]):
        cols = tuple(int(j) for j in np.flatnonzero(base[i] >= 0))
        if len(cols) < 2:
            raise ValueError(f"layer {i} has degree < 2")
        shifts = tuple(int(base[i, j]) % z for j in cols)
        layers.append((cols, shifts))
    return QcPlan(layers=tuple(layers), z=z, nb=base.shape[1],
                  n_blocks=sum(len(c) for c, _ in layers))


def _qc_iterations(post, msgs, plan: QcPlan, iters: int, alpha: float,
                   roll):
    """Serial layered schedule; `roll` injected (pltpu.roll vs jnp.roll).

    post: [nb*z, B]; msgs: list of n_blocks [z, B] c2v slabs, ordered
    layer-major. Returns (post, msgs). Shifts: check r of a layer reads
    block-column j at row (r + s) mod z => roll by -s; the posterior
    delta rolls back by +s.
    """
    z = plan.z
    for _ in range(iters):
        slab = 0
        for cols, shifts in plan.layers:
            dcl = len(cols)
            vp = [roll(post[c * z:(c + 1) * z], -s)
                  for c, s in zip(cols, shifts)]
            old = msgs[slab:slab + dcl]
            v = [vp[d] - old[d] for d in range(dcl)]
            new = _minsum_slabs_qc(v, alpha)
            for d, (c, s) in enumerate(zip(cols, shifts)):
                post = _add_rows(post, c * z, roll(new[d] - old[d], s), z)
                msgs[slab + d] = new[d]
            slab += dcl
    return post, msgs


def _add_rows(post, start, delta, z):
    """post[start:start+z] += delta with static offsets (concat form —
    works identically in jnp and inside the kernel). Empty edge slices
    are skipped: Mosaic hardware rejects zero-length slice operands
    (interpret mode tolerates them; measured 2026-08-19)."""
    parts = []
    if start > 0:
        parts.append(post[:start])
    parts.append(post[start:start + z] + delta)
    if start + z < post.shape[0]:
        parts.append(post[start + z:])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _minsum_slabs_qc(v: list, alpha: float) -> list:
    """Min-sum for QC layers: every slab is fully valid (each circulant
    has exactly one 1 per row), and messages stay full f32 (no matmuls,
    so no quantization is needed for exactness)."""
    dc = len(v)
    mag = [jnp.abs(v[d]) for d in range(dc)]
    sgn = [jnp.where(v[d] < 0, F32(-1.0), F32(1.0)) for d in range(dc)]
    pre_m, pre_s = [mag[0]], [sgn[0]]
    for d in range(1, dc):
        pre_m.append(jnp.minimum(pre_m[-1], mag[d]))
        pre_s.append(pre_s[-1] * sgn[d])
    suf_m, suf_s = [None] * dc, [None] * dc
    suf_m[dc - 1], suf_s[dc - 1] = mag[dc - 1], sgn[dc - 1]
    for d in range(dc - 2, -1, -1):
        suf_m[d] = jnp.minimum(mag[d], suf_m[d + 1])
        suf_s[d] = sgn[d] * suf_s[d + 1]
    out = []
    for d in range(dc):
        if d == 0:
            em, es = suf_m[1], suf_s[1]
        elif d == dc - 1:
            em, es = pre_m[dc - 2], pre_s[dc - 2]
        else:
            em = jnp.minimum(pre_m[d - 1], suf_m[d + 1])
            es = pre_s[d - 1] * suf_s[d + 1]
        out.append(F32(alpha) * es * em)
    return out


def qc_decode_layered_ref(plan: QcPlan, llr: jax.Array, iters: int = 6,
                          alpha: float = 0.8125) -> jax.Array:
    """jnp reference for the QC layered kernel. llr: [nb*z, B] -> post."""
    post = llr.astype(F32)
    msgs = [jnp.zeros((plan.z, llr.shape[-1]), F32)
            for _ in range(plan.n_blocks)]
    roll = lambda x, s: jnp.roll(x, s, axis=0)
    post, _ = _qc_iterations(post, msgs, plan, iters, alpha, roll)
    return post


def _qc_kernel(llr_ref, post_ref, *, plan: QcPlan, iters: int,
               alpha: float):
    post = llr_ref[:].astype(F32)
    msgs = [jnp.zeros((plan.z, post.shape[-1]), F32)
            for _ in range(plan.n_blocks)]
    roll = lambda x, s: pltpu.roll(x, s % plan.z, axis=0)
    post, _ = _qc_iterations(post, msgs, plan, iters, alpha, roll)
    post_ref[:] = post


def make_qc_kernel(plan: QcPlan, iters: int = 6, alpha: float = 0.8125,
                   b_tile: int = 128, interpret: bool = False):
    """Batched QC layered decode: llr [nb*z, B] -> posterior [nb*z, B].
    Internally jitted (no large closure constants — the shifts are static
    ints baked into the kernel body, not arrays); don't re-wrap in jit.
    interpret=True compile time grows superlinearly with iters * blocks
    (XLA:CPU on the unrolled graph) — keep interpret tests at iters<=4."""
    n = plan.nb * plan.z
    kern = functools.partial(_qc_kernel, plan=plan, iters=iters,
                             alpha=alpha)

    def _call(llr):
        b = llr.shape[1]
        return pl.pallas_call(
            kern,
            grid=(b // b_tile,),
            in_specs=[pl.BlockSpec((n, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, b), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(llr.astype(F32))

    _call = jax.jit(_call)

    def run(llr: jax.Array) -> jax.Array:
        nn, b = llr.shape
        if nn != n or b % b_tile:
            raise ValueError(f"llr [{nn},{b}] vs plan n={n}, tile {b_tile}")
        return _call(llr)

    return run


def make_qc_decoder(code: LdpcCode, plan: QcPlan, iters: int = 6,
                    alpha: float = 0.8125, b_tile: int = 128,
                    interpret: bool = False):
    """Build the serving QC layered decode: llr [B, N] -> (bits, info, ok).
    Same contract as qcldpc.ldpc_decode_layered; code arrays are jit
    ARGUMENTS (see make_ldpc_kernel's closure-constant note)."""
    n = plan.nb * plan.z
    kern = functools.partial(_qc_kernel, plan=plan, iters=iters,
                             alpha=alpha)
    inv = np.argsort(np.asarray(code.col_perm))
    info_idx = jnp.asarray(inv[code.n - code.k:], jnp.int32)
    ht = jnp.asarray(code.h.T, F32)

    def _dec(llr, ht, info_idx):
        b = llr.shape[0]
        b_pad = _round_up(max(b, b_tile), b_tile)
        lf = jnp.pad(llr.astype(F32), ((0, b_pad - b), (0, 0))).T
        post = pl.pallas_call(
            kern,
            grid=(b_pad // b_tile,),
            in_specs=[pl.BlockSpec((n, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, b_pad), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(lf)
        bits = (post[:, :b].T < 0).astype(jnp.int32)
        syn = jnp.mod(bits.astype(F32) @ ht, F32(2.0))
        ok = jnp.all(syn == 0, axis=-1)
        info = jnp.take(bits, info_idx, axis=-1)
        return bits, info, ok

    _dec = jax.jit(_dec)
    return lambda llr: _dec(llr, ht, info_idx)


def make_qc_decoder_t(code: LdpcCode, plan: QcPlan, iters: int = 6,
                      alpha: float = 0.8125, b_tile: int = 128,
                      interpret: bool = False):
    """Column-major serving QC decode: llr_t [N, B] -> (bits_t [N, B]
    int32, ok [B]).

    The row-major make_qc_decoder spends more device time on its
    pad + [B,N]->[N,B] transpose + bits-transpose-back relayouts than on
    the decode itself when fed from a plane-form demod (profiled on the
    coherent modem: 0.69 ms decode vs ~2.3 ms layout at B=4096 n=1536).
    This entry takes LLRs already column-major — the natural layout out
    of demap bit-planes — runs the same kernel, and returns decisions
    column-major; the syndrome check runs as one [M, N] x [N, B] matmul
    with no transposes anywhere. B must be a multiple of b_tile."""
    n = plan.nb * plan.z
    kern = functools.partial(_qc_kernel, plan=plan, iters=iters,
                             alpha=alpha)
    h = jnp.asarray(code.h, F32)

    def _dec(llr_t, h):
        b = llr_t.shape[1]
        post = pl.pallas_call(
            kern,
            grid=(b // b_tile,),
            in_specs=[pl.BlockSpec((n, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, b), F32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(llr_t.astype(F32))
        bits_t = (post < 0).astype(jnp.int32)
        syn = jnp.mod(h @ bits_t.astype(F32), F32(2.0))     # [M, B]
        ok = jnp.all(syn == 0, axis=0)
        return bits_t, ok

    _dec = jax.jit(_dec)

    def run(llr_t: jax.Array):
        nn, b = llr_t.shape
        if nn != n or b % b_tile:
            raise ValueError(f"llr_t [{nn},{b}] vs n={n}, tile {b_tile}")
        return _dec(llr_t, h)

    return run


def qc_decode_layered_pallas(code: LdpcCode, plan: QcPlan, llr: jax.Array,
                             iters: int = 6, alpha: float = 0.8125,
                             b_tile: int = 128, interpret: bool = False):
    """One-shot convenience wrapper over make_qc_decoder."""
    return make_qc_decoder(code, plan, iters=iters, alpha=alpha,
                           b_tile=b_tile, interpret=interpret)(llr)

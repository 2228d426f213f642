"""Pallas max-log BCJR kernel: the turbo decoder's inner loop resident
in VMEM (round-4 verdict item 2 / ROADMAP's named coding-tier lever).

Why a kernel: the XLA tier (`turbo.bcjr_decode_batch`) materializes the
[T, S, 2, B] branch-metric tensor and the [T, S, B] alpha/beta planes in
HBM and re-reads them across the forward, backward, and posterior passes
of every half-iteration — the decode is HBM-bound at ~134 Mb/s. Here one
pallas_call per BCJR keeps everything resident: branch metrics are
recomputed on the fly from the [T, B] LLR rows (two reads of the small
inputs instead of five of the big intermediates), and only the [T*S, B]
beta plane ever hits scratch VMEM.

Kernel shape rules honored (verify-skill findings):
- all dynamic VMEM offsets are multiples of 8 rows: LLR rows are read a
  [8, B] CHUNK at a time with static in-chunk row slices (a [1, B] row
  at a traced offset is not sublane-aligned); each beta step is itself
  an [S=8, B] tile so per-step beta stores ARE aligned;
- posterior rows accumulate per chunk into one [8, B] store;
- state "gathers" are static: S = 8, so alpha[prev[s, b]] is an 8-way
  static row concat (the trellis tables are build-time constants).

Arithmetic is BIT-IDENTICAL to bcjr_decode_batch (tested): same
operation association, and the reference's subtle normalization
convention is reproduced exactly — the recurrence carries the
NORMALIZED metric while the value consumed by the posterior pass is the
UN-normalized step output, so the kernel carries both planes.

RSC structure exploited: for codes whose forward polynomial taps the
current input (g MSB set — the 3GPP 13/15 default), par[s, 1] =
1 - par[s, 0], so gamma[s, 1] = -gamma[s, 0] and one [S, B] plane gr
holds every branch metric (builder asserts the property).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.turbo import RscCode, TurboCode
from srcdsp_tpu.types import F32

__all__ = ["make_bcjr_kernel", "turbo_decode_pallas"]

_NEG = np.float32(-1e30)


def _rows(x, idx):
    """Static 8-way sublane gather: rows idx (python ints) of [S, B]."""
    return jnp.concatenate([x[i:i + 1] for i in idx], axis=0)


def _bcjr_kernel(ls_ref, lp_ref, post_ref, betas, *, t_len: int,
                 terminated: bool, sgn0: tuple, nxt0: tuple, nxt1: tuple,
                 prev0: tuple, prev1: tuple):
    s_count = 8
    b = ls_ref.shape[-1]
    n8, tail = divmod(t_len, 8)
    # [S, 1] sign column from inlined scalars (a jnp.asarray here would
    # be a captured constant, which pallas_call rejects)
    sg = jnp.concatenate([jnp.full((1, 1), v, F32) for v in sgn0], axis=0)
    neg = jnp.full((s_count, b), _NEG, F32)
    a0 = jnp.concatenate([jnp.zeros((1, b), F32), neg[1:]], axis=0)
    bN = a0 if terminated else jnp.zeros((s_count, b), F32)

    def gamma_row(tile_ls, tile_lp, r):
        # gr[s] = 0.5*ls + 0.5*lp*(1-2*par[s,0]); gamma[s,1] = -gr[s]
        return (F32(0.5) * tile_ls[r:r + 1]
                + F32(0.5) * tile_lp[r:r + 1] * sg)

    def bwd_step(beta_n, gr):
        # nbeta[s] = max(gr[s] + beta[nxt[s,0]], -gr[s] + beta[nxt[s,1]])
        nbeta = jnp.maximum(gr + _rows(beta_n, nxt0),
                            (-gr) + _rows(beta_n, nxt1))
        return nbeta  # UN-normalized (reference stores this)

    def bwd_chunk(jc, carry, rows):
        """Process steps u = 8*jc + r for r in `rows` (descending)."""
        beta_store, beta_n = carry
        tile_ls = ls_ref[pl.ds(8 * jc, 8), :]
        tile_lp = lp_ref[pl.ds(8 * jc, 8), :]
        for r in rows:
            u = 8 * jc + r
            betas[pl.ds(8 * u, 8), :] = beta_store
            gr = gamma_row(tile_ls, tile_lp, r)
            nbeta = bwd_step(beta_n, gr)
            beta_store = nbeta
            beta_n = nbeta - jnp.max(nbeta, axis=0, keepdims=True)
        return beta_store, beta_n

    # ---- backward: u from t_len-1 down to 0; betas[u] = beta AFTER u
    carry = (bN, bN)
    if tail:
        carry = bwd_chunk(n8, carry, list(range(tail - 1, -1, -1)))

    def bwd_body(i, c):
        return bwd_chunk(n8 - 1 - i, c, [7, 6, 5, 4, 3, 2, 1, 0])

    carry = jax.lax.fori_loop(0, n8, bwd_body, carry)

    # ---- forward + posterior
    def fwd_chunk(jc, carry, nrows):
        alpha_u, alpha_n = carry
        tile_ls = ls_ref[pl.ds(8 * jc, 8), :]
        tile_lp = lp_ref[pl.ds(8 * jc, 8), :]
        posts = []
        for r in range(8):
            if r < nrows:
                u = 8 * jc + r
                beta_t = betas[pl.ds(8 * u, 8), :]
                gr = gamma_row(tile_ls, tile_lp, r)
                # posterior at u uses the UN-normalized alpha history
                m0 = jnp.max(
                    (alpha_u + gr) + _rows(beta_t, nxt0),
                    axis=0, keepdims=True)
                m1 = jnp.max(
                    (alpha_u + (-gr)) + _rows(beta_t, nxt1),
                    axis=0, keepdims=True)
                posts.append(m0 - m1)
                # recurrence from the NORMALIZED alpha
                av = alpha_n + gr
                bv = alpha_n + (-gr)
                nalpha = jnp.maximum(_rows(av, prev0), _rows(bv, prev1))
                alpha_u = nalpha
                alpha_n = nalpha - jnp.max(nalpha, axis=0, keepdims=True)
            else:
                posts.append(jnp.zeros((1, b), F32))
        post_ref[pl.ds(8 * jc, 8), :] = jnp.concatenate(posts, axis=0)
        return alpha_u, alpha_n

    def fwd_body(i, c):
        return fwd_chunk(i, c, 8)

    carry = (a0, a0)
    carry = jax.lax.fori_loop(0, n8, fwd_body, carry)
    if tail:
        fwd_chunk(n8, carry, tail)


def make_bcjr_kernel(code: RscCode, t_len: int, terminated: bool,
                     b_tile: int = 128, interpret: bool = False):
    """Build the VMEM-resident max-log BCJR for a fixed block length.

    Returns fn(ls_tot [t_len, B], lp [t_len, B]) -> post [t_len, B] with
    ls_tot = systematic-channel LLR + a-priori (what bcjr_decode_batch
    calls `ls`); extrinsic = post - ls_tot computed by the caller. B must
    be a multiple of b_tile. Bit-identical to bcjr_decode_batch."""
    s_count = 1 << (code.k - 1)
    if s_count != 8:
        raise ValueError("kernel is specialized to 8-state codes")
    par = np.asarray(code.parity)
    if not np.all(par[:, 1] == 1 - par[:, 0]):
        raise ValueError("kernel needs par[s,1] == 1 - par[s,0] "
                         "(forward polynomial must tap the current bit)")
    t_pad = -(-t_len // 8) * 8
    kern = functools.partial(
        _bcjr_kernel, t_len=t_len, terminated=terminated,
        sgn0=tuple(float(1 - 2 * p) for p in par[:, 0]),
        nxt0=tuple(int(v) for v in code.next_state[:, 0]),
        nxt1=tuple(int(v) for v in code.next_state[:, 1]),
        prev0=tuple(int(v) for v in code.prev_state[:, 0]),
        prev1=tuple(int(v) for v in code.prev_state[:, 1]))

    def fn(ls_tot, lp):
        t, bsz = ls_tot.shape
        if t != t_len or bsz % b_tile:
            raise ValueError(f"[{t},{bsz}] vs t_len={t_len}, "
                             f"b_tile={b_tile}")
        pad = ((0, t_pad - t), (0, 0))
        post = pl.pallas_call(
            kern,
            grid=(bsz // b_tile,),
            in_specs=[
                pl.BlockSpec((t_pad, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_pad, b_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_pad, b_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_pad, bsz), F32),
            scratch_shapes=[pltpu.VMEM((t_pad * 8, b_tile), F32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(jnp.pad(ls_tot.astype(F32), pad), jnp.pad(lp.astype(F32), pad))
        return post[:t_len]

    return fn


def turbo_decode_pallas(tc: TurboCode, llr_sys: jax.Array,
                        llr_par1: jax.Array, llr_par2: jax.Array,
                        iters: int = 6, b_tile: int = 128,
                        interpret: bool = False):
    """turbo_decode_batch with the BCJR halves as Pallas kernels.

    Same contract: llr_sys/llr_par1 [B, T + k - 1], llr_par2 [B, T],
    returns (bits [B, T] int32, posterior [B, T]). The iteration
    structure, interleaver takes, and extrinsic bookkeeping stay XLA
    (cheap [T, B] row gathers); only the two BCJRs per iteration run as
    kernels. Decisions bit-identical to turbo_decode_batch (tested)."""
    t = llr_par2.shape[-1]
    kk = tc.rsc.k - 1
    perm = jnp.asarray(tc.perm)
    inv = jnp.argsort(perm)
    s1 = llr_sys.T.astype(F32)                     # [T+kk, B]
    p1 = llr_par1.T.astype(F32)
    p2 = llr_par2.T.astype(F32)
    sys2 = jnp.take(s1[:t], perm, axis=0)
    bsz = s1.shape[-1]
    zeros_tail = jnp.zeros((kk, bsz), F32)
    bcjr1 = make_bcjr_kernel(tc.rsc, t + kk, True, b_tile=b_tile,
                             interpret=interpret)
    bcjr2 = make_bcjr_kernel(tc.rsc, t, False, b_tile=b_tile,
                             interpret=interpret)

    def body(ext2_info, _):
        la1 = jnp.concatenate([ext2_info, zeros_tail], axis=0)
        ls1 = s1 + la1
        ext1 = bcjr1(ls1, p1) - ls1
        la2 = jnp.take(ext1[:t], perm, axis=0)
        ls2 = sys2 + la2
        post2 = bcjr2(ls2, p2)
        ext2 = post2 - ls2
        return jnp.take(ext2, inv, axis=0), jnp.take(post2, inv, axis=0)

    ext, posts = jax.lax.scan(body, jnp.zeros((t, bsz), F32), None,
                              length=iters)
    post = posts[-1].T                             # [B, T]
    return (post < 0).astype(jnp.int32), post

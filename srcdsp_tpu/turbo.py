"""Turbo codec: RSC encoders + max-log BCJR + iterative decoding
(beyond parity; completes the coding layer next to fec.py's Viterbi,
rs.py, and ldpc.py).

TPU-native shape of the classic 3GPP-style turbo receiver:

- **RSC encoder** (`rsc_encode`): the recursive systematic convolutional
  constituent code as a `lax.scan` over the [K-1]-bit register (the
  feedback makes it a true recurrence — unlike fec.py's feedforward
  encoder it cannot be a conv), plus the standard feedback-driven tail
  that returns the register to zero.
- **max-log BCJR** (`bcjr_decode`): branch metrics for ALL (state, bit)
  edges at every step are one broadcast expression on a [T, S, 2] array;
  the forward (alpha) and backward (beta) recursions are two `lax.scan`s
  over static gather tables; the per-bit soft output is a max-reduction
  over edges. Everything is static-shaped; batches vmap.
- **Turbo decoder** (`turbo_decode`): two BCJRs per iteration exchanging
  EXTRINSIC LLRs through the interleaver permutation (static gathers).
  Constituent 1 is tail-terminated; constituent 2 is left open (beta
  initialized uniform) — the standard asymmetric termination.

LLR convention shared with ldpc.py / demap.py: positive favors bit 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import F32

I32 = jnp.int32
_NEG = np.float32(-1e30)


class RscCode(NamedTuple):
    """Static tables for one rate-1/2 RSC constituent code.

    k: constraint length; S = 2^(k-1) states = register contents, most
    recent feedback bit in the MSB. fb/g: feedback / forward polynomials
    (k-bit ints, MSB = the current feedback bit a_t).
    """

    k: int
    fb: int
    g: int
    next_state: np.ndarray   # [S, 2] i32 state after input bit u
    parity: np.ndarray       # [S, 2] i32 parity bit emitted
    tail_bit: np.ndarray     # [S] i32 input that zeroes the feedback
    prev_state: np.ndarray   # [S, 2] i32 predecessor of s' for input u
    prev_parity: np.ndarray  # [S, 2] i32 parity on that edge


def make_rsc(k: int = 4, fb: int = 0o13, g: int = 0o15) -> RscCode:
    """Defaults are the 3GPP/LTE constituent code (K=4, 1 + D + D^3
    feedback, 1 + D^2 + D^3 forward)."""
    s_count = 1 << (k - 1)
    nxt = np.zeros((s_count, 2), np.int64)
    par = np.zeros((s_count, 2), np.int64)
    tail = np.zeros(s_count, np.int64)

    def reg_bits(s):
        return [(s >> (k - 2 - i)) & 1 for i in range(k - 1)]

    for s in range(s_count):
        r = reg_bits(s)
        # feedback contribution of the register (fb bit i taps a_{t-i})
        fb_reg = 0
        for i in range(1, k):
            if (fb >> (k - 1 - i)) & 1:
                fb_reg ^= r[i - 1]
        tail[s] = fb_reg                        # u = fb_reg makes a_t = 0
        for u in (0, 1):
            a = u ^ fb_reg
            # parity taps (g bit 0 = current a_t)
            p = a if (g >> (k - 1)) & 1 else 0
            for i in range(1, k):
                if (g >> (k - 1 - i)) & 1:
                    p ^= r[i - 1]
            par[s, u] = p
            nxt[s, u] = (a << (k - 2)) | (s >> 1)
    prev = np.zeros((s_count, 2), np.int64)
    prev_par = np.zeros((s_count, 2), np.int64)
    for s in range(s_count):
        for u in (0, 1):
            prev[nxt[s, u], u] = s
            prev_par[nxt[s, u], u] = par[s, u]
    return RscCode(k=k, fb=fb, g=g,
                   next_state=nxt.astype(np.int32),
                   parity=par.astype(np.int32),
                   tail_bit=tail.astype(np.int32),
                   prev_state=prev.astype(np.int32),
                   prev_parity=prev_par.astype(np.int32))


def rsc_encode(code: RscCode, bits: jax.Array, terminate: bool = True
               ) -> tuple[jax.Array, jax.Array]:
    """Encode. Returns (systematic [T(+k-1)], parity [T(+k-1)]) int32;
    with terminate=True the k-1 tail inputs (which return the register to
    zero) are appended to BOTH streams."""
    nxt = jnp.asarray(code.next_state)
    par = jnp.asarray(code.parity)
    tail = jnp.asarray(code.tail_bit)

    def step(s, u):
        return nxt[s, u], (u, par[s, u])

    s, (sys_b, par_b) = jax.lax.scan(step, jnp.int32(0),
                                     bits.astype(I32))
    if not terminate:
        return sys_b, par_b

    def tail_step(st, _):
        u = tail[st]
        return nxt[st, u], (u, par[st, u])

    s, (sys_t, par_t) = jax.lax.scan(tail_step, s, None, length=code.k - 1)
    return (jnp.concatenate([sys_b, sys_t]),
            jnp.concatenate([par_b, par_t]))


def bcjr_decode(code: RscCode, llr_sys: jax.Array, llr_par: jax.Array,
                la: jax.Array | None = None, terminated: bool = True
                ) -> tuple[jax.Array, jax.Array]:
    """max-log BCJR over one constituent code.

    llr_sys/llr_par: [T] channel LLRs (positive = bit 0) for systematic
    and parity streams (including tail positions when terminated). la:
    a-priori LLR per INFO position ([T] — pass zeros-extended tails if
    terminated). Returns (posterior LLR [T], extrinsic LLR [T]).
    """
    s_count = 1 << (code.k - 1)
    t = llr_sys.shape[-1]
    la = jnp.zeros_like(llr_sys) if la is None else la
    ls = (llr_sys + la).astype(F32)
    lp = llr_par.astype(F32)
    par = jnp.asarray(code.parity, F32)            # [S, 2]
    nxt = jnp.asarray(code.next_state)             # [S, 2]
    prev = jnp.asarray(code.prev_state)
    prev_par = jnp.asarray(code.prev_parity, F32)

    # gamma[t, s, b] = 0.5*ls_t*(1-2b) + 0.5*lp_t*(1-2*par[s, b])
    bsign = jnp.asarray([1.0, -1.0], F32)          # (1-2b)
    gam = (0.5 * ls[:, None, None] * bsign[None, None, :]
           + 0.5 * lp[:, None, None] * (1.0 - 2.0 * par)[None, :, :])

    a0 = jnp.full((s_count,), _NEG, F32).at[0].set(0.0)

    # alpha'[s'] = max_b alpha[prev[s', b]] + gamma[t, prev[s', b], b]:
    # gather gamma at (prev[s', b], b) via static flat indices
    flat_idx = prev * 2 + jnp.arange(2)[None, :]   # [S, 2] into [S*2]

    def fwd_step(alpha, g_t):
        gflat = g_t.reshape(-1)                    # [S*2]
        cand = alpha[prev] + gflat[flat_idx]
        nalpha = jnp.max(cand, axis=-1)
        return nalpha - jnp.max(nalpha), nalpha

    _, alphas = jax.lax.scan(fwd_step, a0, gam)    # alphas[t] = alpha AFTER t
    alphas = jnp.concatenate([a0[None], alphas[:-1]], axis=0)  # alpha BEFORE t

    bN = (jnp.full((s_count,), _NEG, F32).at[0].set(0.0) if terminated
          else jnp.zeros((s_count,), F32))

    def bwd_step(beta, g_t):
        # beta'[s] = max_b gamma[t, s, b] + beta[next[s, b]]
        cand = g_t + beta[nxt]
        nbeta = jnp.max(cand, axis=-1)
        return nbeta - jnp.max(nbeta), nbeta

    _, betas_r = jax.lax.scan(bwd_step, bN, gam[::-1])
    betas = jnp.concatenate([betas_r[::-1][1:], bN[None]], axis=0)  # beta AFTER t

    # posterior per bit: max over edges with b, metric alpha[s]+gam+beta[next]
    beta_next = jnp.stack([betas[:, nxt[:, 0]], betas[:, nxt[:, 1]]],
                          axis=-1)               # [T, S, 2]
    metric = alphas[:, :, None] + gam + beta_next
    m0 = jnp.max(metric[:, :, 0], axis=-1)
    m1 = jnp.max(metric[:, :, 1], axis=-1)
    post = m0 - m1
    ext = post - ls                                 # remove sys + prior
    return post.astype(F32), ext.astype(F32)


class TurboCode(NamedTuple):
    rsc: RscCode
    perm: np.ndarray       # [T] interleaver (info positions)


def make_turbo(block_len: int, seed: int = 0, k: int = 4,
               fb: int = 0o13, g: int = 0o15) -> TurboCode:
    rng = np.random.default_rng(seed)
    return TurboCode(rsc=make_rsc(k, fb, g),
                     perm=rng.permutation(block_len).astype(np.int64))


def turbo_encode(tc: TurboCode, bits: jax.Array):
    """Rate ~1/3: (systematic+tail1 [T+k-1], parity1 [T+k-1],
    parity2 [T] from the interleaved bits, unterminated)."""
    sys1, par1 = rsc_encode(tc.rsc, bits, terminate=True)
    inter = jnp.take(bits, jnp.asarray(tc.perm), axis=-1)
    _, par2 = rsc_encode(tc.rsc, inter, terminate=False)
    return sys1, par1, par2


def turbo_decode(tc: TurboCode, llr_sys: jax.Array, llr_par1: jax.Array,
                 llr_par2: jax.Array, iters: int = 6):
    """Iterative max-log turbo decoding.

    llr_sys/llr_par1: [T + k - 1] (info + tail); llr_par2: [T]
    (constituent 2, unterminated). Returns (bits [T] int32,
    posterior LLR [T]).
    """
    t = llr_par2.shape[-1]
    kk = tc.rsc.k - 1
    perm = jnp.asarray(tc.perm)
    inv = jnp.argsort(perm)
    sys2 = jnp.take(llr_sys[:t], perm, axis=-1)
    zeros_tail = jnp.zeros((kk,), F32)

    def body(ext2_info, _):
        # decoder 1 (terminated): prior = extrinsic from decoder 2
        la1 = jnp.concatenate([ext2_info, zeros_tail])
        _, ext1 = bcjr_decode(tc.rsc, llr_sys, llr_par1, la1,
                              terminated=True)
        # decoder 2 (open): prior = interleaved extrinsic from decoder 1
        la2 = jnp.take(ext1[:t], perm, axis=-1)
        post2, ext2 = bcjr_decode(tc.rsc, sys2, llr_par2, la2,
                                  terminated=False)
        return jnp.take(ext2, inv, axis=-1), jnp.take(post2, inv, axis=-1)

    ext, posts = jax.lax.scan(body, jnp.zeros((t,), F32), None,
                              length=iters)
    post = posts[-1]
    return (post < 0).astype(jnp.int32), post


def bcjr_decode_batch(code: RscCode, llr_sys: jax.Array,
                      llr_par: jax.Array, la: jax.Array | None = None,
                      terminated: bool = True
                      ) -> tuple[jax.Array, jax.Array]:
    """Batched max-log BCJR with the LANE-NATIVE layout: [T, B] inputs,
    alpha/beta carried as [S, B] (states on sublanes, codewords on
    lanes). vmap(bcjr_decode) carries [B, S] instead — with S = 8 that
    uses 16 of 128 lanes per vector op; this form fills all lanes and
    turns the trellis gathers into static leading-axis row picks.
    Same max/add arithmetic per element as bcjr_decode (decisions match
    the vmapped form exactly on every tested fixture). Returns
    (posterior [T, B], extrinsic [T, B])."""
    s_count = 1 << (code.k - 1)
    b = llr_sys.shape[-1]
    la = jnp.zeros_like(llr_sys) if la is None else la
    ls = (llr_sys + la).astype(F32)                # [T, B]
    lp = llr_par.astype(F32)
    par = jnp.asarray(code.parity, F32)            # [S, 2]
    nxt = np.asarray(code.next_state)              # [S, 2] static
    prev = np.asarray(code.prev_state)
    bsign = jnp.asarray([1.0, -1.0], F32)
    # gamma[t, s, b2, B]
    gam = (0.5 * ls[:, None, None, :] * bsign[None, None, :, None]
           + 0.5 * lp[:, None, None, :]
           * (1.0 - 2.0 * par)[None, :, :, None])

    neg = jnp.full((s_count, b), _NEG, F32)
    a0 = neg.at[0].set(0.0)
    pidx = jnp.asarray(prev.reshape(-1))           # [S*2]
    gprev = jnp.asarray((prev * 2 + np.arange(2)[None, :]).reshape(-1))

    def fwd_step(alpha, g_t):
        gflat = g_t.reshape(2 * s_count, b)        # [(s,b2) flat, B]
        cand = (jnp.take(alpha, pidx, axis=0)
                + jnp.take(gflat, gprev, axis=0)).reshape(s_count, 2, b)
        nalpha = jnp.max(cand, axis=1)             # [S, B]
        return nalpha - jnp.max(nalpha, axis=0, keepdims=True), nalpha

    _, alphas = jax.lax.scan(fwd_step, a0, gam)
    alphas = jnp.concatenate([a0[None], alphas[:-1]], axis=0)

    bN = a0 if terminated else jnp.zeros((s_count, b), F32)
    nidx = jnp.asarray(nxt.reshape(-1))

    def bwd_step(beta, g_t):
        bn = jnp.take(beta, nidx, axis=0).reshape(s_count, 2, b)
        cand = g_t + bn
        nbeta = jnp.max(cand, axis=1)
        return nbeta - jnp.max(nbeta, axis=0, keepdims=True), nbeta

    _, betas_r = jax.lax.scan(bwd_step, bN, gam[::-1])
    betas = jnp.concatenate([betas_r[::-1][1:], bN[None]], axis=0)

    bn_all = jnp.take(betas, nidx, axis=1).reshape(-1, s_count, 2, b)
    metric = alphas[:, :, None, :] + gam + bn_all
    m0 = jnp.max(metric[:, :, 0, :], axis=1)       # [T, B]
    m1 = jnp.max(metric[:, :, 1, :], axis=1)
    post = m0 - m1
    ext = post - ls
    return post.astype(F32), ext.astype(F32)


def turbo_decode_batch(tc: TurboCode, llr_sys: jax.Array,
                       llr_par1: jax.Array, llr_par2: jax.Array,
                       iters: int = 6):
    """Batched turbo decode in the lane-native [T, B] layout (see
    bcjr_decode_batch). llr_sys/llr_par1: [B, T + k - 1]; llr_par2:
    [B, T] — the same batch-leading convention as vmap(turbo_decode);
    transposition to [T, B] happens inside. Returns
    (bits [B, T] int32, posterior [B, T])."""
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

    def body(ext2_info, _):
        la1 = jnp.concatenate([ext2_info, zeros_tail], axis=0)
        _, ext1 = bcjr_decode_batch(tc.rsc, s1, p1, la1, terminated=True)
        la2 = jnp.take(ext1[:t], perm, axis=0)
        post2, ext2 = bcjr_decode_batch(tc.rsc, sys2, p2, la2,
                                        terminated=False)
        return jnp.take(ext2, inv, axis=0), jnp.take(post2, inv, axis=0)

    ext, posts = jax.lax.scan(body, jnp.zeros((t, bsz), F32), None,
                              length=iters)
    post = posts[-1].T                             # [B, T]
    return (post < 0).astype(jnp.int32), post

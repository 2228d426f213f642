"""Convolutional FEC: encoder + Viterbi decoder (beyond-parity component).

The reference family (BASELINE.json: FIR/NCO/resample/FSK/PSK) stops at the
demodulator; every fielded FSK/PSK link then runs forward error correction,
so a complete receiver framework owes a decoder. A Viterbi decoder is the
classic "inherently sequential, branchy" DSP loop; the TPU-native
decomposition used here splits it into

1. **Branch metrics as ONE MXU matmul** — for a rate-1/n code all 2^K edge
   hypotheses share the same n received soft values per step, so the whole
   [T, n] soft block times the static [n, 2S] expected-symbol matrix
   (entries +-1) yields every branch metric for every step in a single
   dense matmul before any sequential work starts.
2. **Vectorized add-compare-select under `lax.scan`** — the only true
   recurrence is the [S] path-metric vector; each step is two static
   gathers + max/argmax over the whole state vector at once (no per-state
   Python), with a max-subtract renormalization to keep metrics bounded.
3. **Traceback as a reverse `lax.scan`** over the stored [T, S] decision
   bits — no host loop, no dynamic shapes.

Throughput scales by vmapping whole codewords/channels over a batch axis
(the [S]-wide recurrence is VPU work; batching fills the lanes).

Encoder: out[t, j] = parity(window_K(u, t) & g_j) — a binary FIR. Computed
as an f32 `conv_general_dilated` followed by mod 2 (tap count < 2^24 keeps
the integer sums exact in f32), so it is one fused conv on any backend.

Conventions (standard NASA/CCSDS): generator g_j is a K-bit integer whose
MSB taps the CURRENT input bit; decoder state s = the previous K-1 input
bits with the newest in the MSB. BPSK soft mapping bit b -> 1 - 2b (+1 for
0); soft inputs to `viterbi_decode` are correlation metrics (e.g. raw
matched-filter outputs or LLRs, positive = bit 0 more likely). Erasures
(punctured positions) are soft zeros — `depuncture` inserts them.

Terminated mode appends K-1 zero tail bits (encoder) and starts traceback
from state 0 (decoder): the standard block-coded framing.

No reference counterpart exists (SURVEY §0: empty mount; BASELINE.json
scope ends at demodulation) — tests verify against an independent
pure-Python bit-loop twin plus coded-vs-uncoded BER behavior.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import F32

I32 = jnp.int32


class ConvCode(NamedTuple):
    """Static tables for one rate-1/n convolutional code.

    Built on the host in numpy; every array is a small static constant
    closed over by the jitted encode/decode functions.
    """

    k: int                 # constraint length
    n: int                 # output bits per input bit (rate 1/n)
    gens: tuple            # generator polynomials (K-bit ints, MSB = current bit)
    taps: np.ndarray       # [n, K] f32 0/1 conv taps, taps[j, i] = bit i of g_j
                           # (i=0 -> current input bit)
    exp_pm1: np.ndarray    # [n, 2S] f32 +-1 expected BPSK symbols per edge,
                           # edge index e = s*2 + b (state s, input bit b)
    prev: np.ndarray       # [S, 2] i32 predecessor states of each new state
    prev_edge: np.ndarray  # [S, 2] i32 edge index (s_prev*2 + b_new) per choice


def make_conv_code(k: int, gens: Sequence[int]) -> ConvCode:
    """Build the static tables for constraint length `k`, generators `gens`.

    Generators are given as integers (octal literals like 0o133 read
    naturally); each must fit in k bits. Example: K=7 rate-1/2 NASA code is
    ``make_conv_code(7, (0o133, 0o171))``.
    """
    gens = tuple(int(g) for g in gens)
    if k < 2 or k > 16:
        raise ValueError("constraint length must be in [2, 16]")
    for g in gens:
        if not 0 < g < (1 << k):
            raise ValueError(f"generator {g:o} does not fit in {k} bits")
    n = len(gens)
    s_count = 1 << (k - 1)

    # taps[j, i]: does g_j tap input bit u[t-i]?  MSB of g_j = current bit.
    taps = np.zeros((n, k), np.float32)
    for j, g in enumerate(gens):
        for i in range(k):
            taps[j, i] = (g >> (k - 1 - i)) & 1

    # Edge e = (s, b): register r = (b << (k-1)) | s   (b = current bit,
    # s = previous k-1 bits, newest in MSB of s). Output j = parity(r & g_j).
    # Next state s' = r >> 1  ==  (b << (k-2)) | (s >> 1).
    exp = np.zeros((n, 2 * s_count), np.float32)
    for s in range(s_count):
        for b in (0, 1):
            r = (b << (k - 1)) | s
            for j, g in enumerate(gens):
                bit = bin(r & g).count("1") & 1
                exp[j, s * 2 + b] = 1.0 - 2.0 * bit
    # Predecessors of s': the new input bit is the MSB of s',
    # and s_prev >> 1 == s' with that MSB cleared.
    low_mask = (s_count >> 1) - 1 if k > 2 else 0
    prev = np.zeros((s_count, 2), np.int32)
    prev_edge = np.zeros((s_count, 2), np.int32)
    for sp in range(s_count):
        b_new = sp >> (k - 2)
        low = sp & low_mask
        for i in (0, 1):
            s_prev = (low << 1) | i
            prev[sp, i] = s_prev
            prev_edge[sp, i] = s_prev * 2 + b_new
    return ConvCode(k=k, n=n, gens=gens, taps=taps, exp_pm1=exp,
                    prev=prev, prev_edge=prev_edge)


def conv_encode(code: ConvCode, bits: jax.Array,
                terminate: bool = True) -> jax.Array:
    """Encode bits [..., T] (0/1) -> coded bits [..., n*(T+tail)].

    Output interleaving: per input bit, the n generator outputs are
    adjacent (g_0 first) — the standard serialized order. `terminate`
    appends k-1 zeros so the encoder (and decoder traceback) end in
    state 0.
    """
    bits = jnp.asarray(bits)
    lead = bits.shape[:-1]
    t_in = bits.shape[-1]
    if terminate:
        bits = jnp.concatenate(
            [bits, jnp.zeros(lead + (code.k - 1,), bits.dtype)], axis=-1)
        t_in = t_in + code.k - 1
    x = bits.reshape((-1, 1, t_in)).astype(F32)
    # conv_general_dilated is a CORRELATION; flip so position K-1 (the last
    # sample in the left-padded window, i.e. u[t]) meets the MSB tap.
    taps = jnp.asarray(code.taps[:, ::-1].copy())[:, None, :]   # [n, 1, K]
    # 'Full' left pad: window covers u[t-K+1 .. t] with zeros before t=0.
    y = jax.lax.conv_general_dilated(
        x, taps, window_strides=(1,), padding=[(code.k - 1, 0)])
    y = jnp.mod(y, 2.0).astype(I32)                    # [B, n, T]
    y = jnp.swapaxes(y, -1, -2)                        # [B, T, n]
    return y.reshape(lead + (t_in * code.n,))


def bpsk_soft(coded_bits: jax.Array, key: jax.Array | None = None,
              noise_std: float = 0.0) -> jax.Array:
    """Map coded bits to +-1 BPSK soft symbols (bit 0 -> +1), plus AWGN."""
    s = 1.0 - 2.0 * jnp.asarray(coded_bits, F32)
    if key is not None and noise_std > 0.0:
        s = s + noise_std * jax.random.normal(key, s.shape, F32)
    return s


def depuncture(soft: jax.Array, pattern: Sequence[int]) -> jax.Array:
    """Re-insert erasures (soft 0) at punctured positions.

    `pattern` is the transmit mask over one puncture period (1 = sent);
    `soft` holds only the sent values, [..., T_sent]. Returns [..., T_full]
    with zeros (erasures) at the punctured slots. T_sent must cover a whole
    number of periods.
    """
    pat = np.asarray(pattern, np.int32)
    per, sent_per = pat.size, int(pat.sum())
    lead = soft.shape[:-1]
    t_sent = soft.shape[-1]
    if t_sent % sent_per:
        raise ValueError("punctured length must be a whole number of periods")
    periods = t_sent // sent_per
    full = jnp.zeros(lead + (periods, per), soft.dtype)
    idx = np.nonzero(pat)[0]
    full = full.at[..., idx].set(soft.reshape(lead + (periods, sent_per)))
    return full.reshape(lead + (periods * per,))


def puncture(coded: jax.Array, pattern: Sequence[int]) -> jax.Array:
    """Keep only positions where `pattern` (tiled) is 1. [..., T] -> [..., T_sent]."""
    pat = np.asarray(pattern, np.int32)
    per = pat.size
    lead = coded.shape[:-1]
    t = coded.shape[-1]
    if t % per:
        raise ValueError("coded length must be a whole number of periods")
    idx = np.nonzero(pat)[0]
    return coded.reshape(lead + (t // per, per))[..., idx].reshape(
        lead + (t // per * idx.size,))


def viterbi_decode(code: ConvCode, soft: jax.Array,
                   terminated: bool = True) -> jax.Array:
    """Maximum-likelihood decode of soft symbols [..., n*T] -> bits [..., T_info].

    `soft` are correlation metrics per coded bit (positive = bit 0), n per
    trellis step in encoder order; length must be a multiple of n. With
    `terminated`, the last k-1 decoded (tail) bits are stripped and the
    traceback starts from state 0.
    """
    soft = jnp.asarray(soft, F32)
    lead = soft.shape[:-1]
    if soft.shape[-1] % code.n:
        raise ValueError("soft length must be a multiple of n")
    t_steps = soft.shape[-1] // code.n
    if terminated and t_steps <= code.k - 1:
        raise ValueError("terminated block shorter than the tail")
    r = soft.reshape((-1, t_steps, code.n))            # [B, T, n]
    b_dim = r.shape[0]

    exp = jnp.asarray(code.exp_pm1)                    # [n, 2S]
    prev = jnp.asarray(code.prev)                      # [S, 2]
    prev_edge = jnp.asarray(code.prev_edge)            # [S, 2]
    s_count = 1 << (code.k - 1)

    # 1) all branch metrics in one matmul: bm[B, T, 2S]
    bm = jnp.einsum("btn,ne->bte", r, exp,
                    precision=jax.lax.Precision.HIGHEST)

    # 2) add-compare-select over time. Path metrics start pinned to state 0
    #    (the encoder's true start state).
    neg = jnp.asarray(-1e30, F32)
    pm0 = jnp.full((b_dim, s_count), neg).at[:, 0].set(0.0)

    def acs(pm, bm_t):
        cand = pm[:, prev] + bm_t[:, prev_edge]        # [B, S, 2]
        choice = jnp.argmax(cand, axis=-1)             # [B, S] decision bits
        pm_new = jnp.max(cand, axis=-1)
        pm_new = pm_new - jnp.max(pm_new, axis=-1, keepdims=True)
        return pm_new, (choice.astype(jnp.int8), pm_new)

    pm_fin, (choices, _) = jax.lax.scan(
        acs, pm0, jnp.swapaxes(bm, 0, 1))              # choices [T, B, S]

    # 3) traceback (reverse scan). Decoded bit at step t = MSB of the state
    #    AFTER step t; predecessor chosen by the stored decision.
    start = (jnp.zeros((b_dim,), I32) if terminated
             else jnp.argmax(pm_fin, axis=-1).astype(I32))

    def back(state, ch_t):
        bit = state >> (code.k - 2)
        d = jnp.take_along_axis(ch_t, state[:, None], axis=-1)[:, 0]
        state_prev = prev[state, d.astype(I32)]
        return state_prev, bit

    _, bits_rev = jax.lax.scan(back, start, choices, reverse=True)
    bits = jnp.swapaxes(bits_rev, 0, 1)                # [B, T]
    if terminated:
        bits = bits[:, : t_steps - (code.k - 1)]
    return bits.reshape(lead + (bits.shape[-1],)).astype(I32)


def viterbi_decode_hard(code: ConvCode, hard_bits: jax.Array,
                        terminated: bool = True) -> jax.Array:
    """Hard-decision decode: 0/1 coded bits -> info bits (Hamming metric)."""
    return viterbi_decode(code, 1.0 - 2.0 * jnp.asarray(hard_bits, F32),
                          terminated=terminated)

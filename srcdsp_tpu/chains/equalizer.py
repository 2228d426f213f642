"""Adaptive channel equalizers: block LMS (trained / decision-directed)
and blind CMA (beyond-parity component).

The reference family has no equalizer; any PSK/QAM link over a
frequency-selective channel needs one. Per-sample LMS is a sequential
scalar recurrence (TPU-hostile); the TPU-native form is BLOCK-adaptive
filtering — the standard block-LMS algorithm, which is mathematically the
same gradient descent with the gradient averaged over a block:

- Each scan step processes B output samples as ONE [B, L] frame matrix:
  y = X w (MXU matmul), error e per mode, gradient X^H e (second matmul),
  w <- w + (mu/B) X^H e. The only sequential dependency left is the
  once-per-block weight update carried through `lax.scan` — B times fewer
  sequential steps than per-sample LMS, each of them MXU work.
- Frames are built gather-free (shifted-slice concat, ops.spectrum
  pattern); the fractionally-spaced variant (sps > 1 input samples per
  output) folds the stride into the framing, not a separate decimator.

Modes:
- 'train':  e = d - y against known symbols (preamble-directed).
- 'dd':     e = slice(y) - y decision-directed on the PSK constellation.
- 'cma':    e = y (R2 - |y|^2), Godard's blind constant-modulus error;
            converges without a reference at the cost of a phase
            ambiguity (resolve downstream with differential coding or
            one pilot — same policy as chains.qam).

All three share one scan core; weights, carried input tail, and the
running MSE are the scan state. Functions return (w, y, mse_per_block) so
convergence is observable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

__all__ = [
    "EqState", "eq_init", "lms_equalize", "cma_equalize", "psk_slicer",
    "make_eq_frames", "RlsState", "rls_init", "rls_equalize",
    "DfeState", "dfe_init", "dfe_equalize",
]


class EqState(NamedTuple):
    w: jax.Array       # [L] complex taps
    tail: jax.Array    # [L-1] carried input samples (sample rate)


def eq_init(ntaps: int, center_spike: bool = True,
            channel_shape: tuple = ()) -> EqState:
    """center_spike=True -> w = delta at the center tap (the standard CMA
    init; also a sane LMS start)."""
    w = jnp.zeros((*channel_shape, ntaps), CF32)
    if center_spike:
        w = w.at[..., ntaps // 2].set(1.0 + 0.0j)
    return EqState(w=w,
                   tail=jnp.zeros((*channel_shape, ntaps - 1), CF32))


def make_eq_frames(xin: jax.Array, ntaps: int, sps: int) -> jax.Array:
    """[..., B*sps + L - 1] -> [..., B, L] rows x_n = [x[n*sps+L-1], ...,
    x[n*sps]] reversed-window frames (so y = X @ w is the usual
    w-dot-delay-line). Gather-free: L+sps-1 shifted slices."""
    b = (xin.shape[-1] - (ntaps - 1)) // sps
    cols = [xin[..., ntaps - 1 - k: ntaps - 1 - k + b * sps: sps][..., None]
            for k in range(ntaps)]
    return jnp.concatenate(cols, axis=-1)


def psk_slicer(y: jax.Array, order: int, offset: float = 0.0) -> jax.Array:
    """Nearest M-PSK point exp(j(offset + 2 pi k/M)) of each sample."""
    ang = jnp.angle(y) - offset
    step = 2.0 * np.pi / order
    q = jnp.round(ang / step) * step + offset
    return jnp.exp(1j * q).astype(CF32)


def _scan_equalize(x: jax.Array, d: jax.Array | None, state: EqState,
                   mu: float, block: int, sps: int, mode: str,
                   order: int, r2: float, offset: float = 0.0):
    ntaps = state.w.shape[-1]
    s = x.shape[-1]
    if s % (block * sps) != 0:
        raise ValueError(f"signal length {s} must divide into blocks of "
                         f"{block * sps} input samples")
    nb = s // (block * sps)
    lead = x.shape[:-1]
    xb = jnp.moveaxis(x.reshape(*lead, nb, block * sps), -2, 0)
    if d is not None:
        db = jnp.moveaxis(d.reshape(*lead, nb, block), -2, 0)
    else:
        db = jnp.zeros((nb, *lead, 0), CF32)   # unused placeholder

    def step(st, inputs):
        xblk, dblk = inputs
        xin = jnp.concatenate([st.tail, xblk], axis=-1)
        frames = make_eq_frames(xin, ntaps, sps)          # [..., B, L]
        y = jnp.einsum("...bl,...l->...b", frames, st.w)
        if mode == "train":
            e = dblk - y
        elif mode == "dd":
            e = psk_slicer(y, order, offset) - y
        elif mode == "cma":
            e = y * (F32(r2) - (jnp.real(y) ** 2 + jnp.imag(y) ** 2))
        else:
            raise ValueError(f"unknown mode {mode!r}")
        grad = jnp.einsum("...bl,...b->...l", jnp.conj(frames), e)
        w2 = st.w + (mu / block) * grad
        tail2 = xin[..., xin.shape[-1] - (ntaps - 1):]
        mse = jnp.mean(jnp.abs(e) ** 2, axis=-1)
        return EqState(w=w2.astype(CF32), tail=tail2), (y, mse)

    st, (ys, mses) = jax.lax.scan(step, state, (xb, db))
    y = jnp.moveaxis(ys, 0, -2).reshape(*lead, nb * block)
    mse = jnp.moveaxis(mses, 0, -1) if lead else mses
    return st, y, mse


def lms_equalize(x: jax.Array, state: EqState, mu: float, block: int = 64,
                 sps: int = 1, d: jax.Array | None = None, order: int = 4,
                 delay: int | None = None, offset: float = 0.0
                 ) -> tuple[EqState, jax.Array, jax.Array]:
    """Block-LMS equalize. x: [..., B_total*sps] received samples.

    With `d` (known symbols [..., B_total]): training mode; `delay` is the
    equalizer's decision delay in SYMBOLS (default ntaps//(2*sps) — the
    center-spike init's group delay at the symbol rate), applied to d
    internally so y[n] trains toward d[n-delay]. Without `d`:
    decision-directed on the `order`-PSK constellation at phase `offset`
    (delay is irrelevant there). Returns (state, y [..., B_total], mse per
    block); y is delayed by `delay`.

    Multi-call streaming note: the internal d shift zero-fills the first
    `delay` targets of EACH call; when splitting one capture across calls,
    pre-shift d once on the whole capture and pass delay=0 (tested)."""
    mode = "train" if d is not None else "dd"
    if d is not None:
        dly = state.w.shape[-1] // (2 * sps) if delay is None else int(delay)
        if dly > 0:
            lead = d.shape[:-1]
            d = jnp.concatenate(
                [jnp.zeros((*lead, dly), d.dtype), d[..., :-dly]], axis=-1)
    return _scan_equalize(x, d, state, mu, block, sps, mode, order, 0.0,
                          offset)


def cma_equalize(x: jax.Array, state: EqState, mu: float, block: int = 64,
                 sps: int = 1, r2: float = 1.0
                 ) -> tuple[EqState, jax.Array, jax.Array]:
    """Blind constant-modulus equalize (Godard p=2). r2 = E|s|^4 / E|s|^2
    (1.0 for PSK). Output carries an unknown phase rotation."""
    return _scan_equalize(x, None, state, mu, block, sps, "cma", 4, r2)


class RlsState(NamedTuple):
    w: jax.Array       # [L] complex taps
    p: jax.Array       # [L, L] inverse correlation matrix
    tail: jax.Array    # [L-1] carried input samples


def rls_init(ntaps: int, delta: float = 0.1,
             center_spike: bool = True) -> RlsState:
    """P0 = I/delta (small delta = weak prior = fast initial adaptation)."""
    w = jnp.zeros((ntaps,), CF32)
    if center_spike:
        w = w.at[ntaps // 2].set(1.0 + 0.0j)
    return RlsState(w=w, p=jnp.eye(ntaps, dtype=CF32) / F32(delta),
                    tail=jnp.zeros((ntaps - 1,), CF32))


def rls_equalize(x: jax.Array, state: RlsState, lam: float = 0.99,
                 sps: int = 1, d: jax.Array | None = None, order: int = 4,
                 delay: int | None = None, offset: float = 0.0
                 ) -> tuple[RlsState, jax.Array, jax.Array]:
    """Recursive least squares: the fast-converging counterpart of
    lms_equalize (locks in ~2-5 L symbols where LMS needs hundreds — the
    classic trade: O(L^2) state/work per symbol instead of O(L)).

    Exponentially-weighted RLS on the regression y_n = u_n^T w minimizing
    sum lam^(n-i) |d_i - y_i|^2. The per-symbol recurrence (w, P) runs
    under `lax.scan`; every step is [L]/[L, L] mat-vec work — sequential
    in n by nature, so use it for ACQUISITION on short preambles and hand
    the converged taps to the block-LMS/DD machinery for the payload
    (EqState(w=rls.w, tail=rls.tail)). Same conventions as lms_equalize:
    training (`d`, delayed internally by `delay` symbols) or
    decision-directed on the order-PSK constellation. Returns
    (state, y, |e|^2 per symbol).
    """
    ntaps = state.w.shape[-1]
    if d is not None:
        dly = ntaps // (2 * sps) if delay is None else int(delay)
        if dly > 0:
            d = jnp.concatenate([jnp.zeros((dly,), d.dtype), d[..., :-dly]])
    xin = jnp.concatenate([state.tail, x.astype(CF32)], axis=-1)
    frames = make_eq_frames(xin, ntaps, sps)            # [B, L]
    db = (d.astype(CF32) if d is not None
          else jnp.zeros((frames.shape[0],), CF32))     # placeholder for DD

    def step(st, inputs):
        u, d_n = inputs
        w, p = st
        y = jnp.sum(u * w)
        target = d_n if d is not None else psk_slicer(y, order, offset)
        e = target - y
        pu = p @ jnp.conj(u)                            # [L]
        denom = F32(float(lam)) + jnp.real(jnp.sum(u * pu))
        g = pu / denom.astype(CF32)
        w2 = w + g * e
        p2 = (p - jnp.outer(g, u @ p)) / F32(float(lam))
        # keep P Hermitian against f32 drift
        p2 = 0.5 * (p2 + jnp.conj(p2.T))
        return (w2.astype(CF32), p2.astype(CF32)), (y, jnp.abs(e) ** 2)

    (w, p), (ys, errs) = jax.lax.scan(step, (state.w, state.p),
                                      (frames, db))
    tail2 = xin[..., xin.shape[-1] - (ntaps - 1):]
    return RlsState(w=w, p=p, tail=tail2), ys, errs


class DfeState(NamedTuple):
    ff: jax.Array      # [Lf] feedforward taps
    fb: jax.Array      # [Lb] feedback taps (on past decisions)
    tail: jax.Array    # [Lf-1] carried input samples
    past: jax.Array    # [Lb] carried past decisions (newest first)


def dfe_init(nff: int, nfb: int, center_spike: bool = True) -> DfeState:
    ff = jnp.zeros((nff,), CF32)
    if center_spike:
        ff = ff.at[nff // 2].set(1.0 + 0.0j)
    return DfeState(ff=ff, fb=jnp.zeros((nfb,), CF32),
                    tail=jnp.zeros((nff - 1,), CF32),
                    past=jnp.zeros((nfb,), CF32))


def dfe_equalize(x: jax.Array, state: DfeState, mu: float, sps: int = 1,
                 d: jax.Array | None = None, order: int = 4,
                 delay: int | None = None, offset: float = 0.0
                 ) -> tuple[DfeState, jax.Array, jax.Array]:
    """Decision-feedback equalizer (LMS-adapted): y_n = ff^T u_n -
    fb^T dec_{n-1..n-Lb}. The feedback path CANCELS postcursor ISI with
    already-decided symbols instead of inverting the channel, so — unlike
    the linear equalizers — it spends no noise enhancement on trailing
    taps (the classic DFE advantage on channels with long postcursors).

    The decision recurrence forces a per-symbol `lax.scan` (like RLS);
    use block LMS/CMA for the throughput path and DFE where the channel
    demands it. Same training conventions as lms_equalize (`d` delayed by
    `delay` symbols; decision-directed on order-PSK without `d`).
    Returns (state, y [Nsym], |e|^2 per symbol).
    """
    nff = state.ff.shape[-1]
    if x.shape[-1] % sps != 0:
        raise ValueError(f"input length {x.shape[-1]} not divisible by "
                         f"sps {sps} (streaming would slip symbol timing)")
    if d is not None:
        dly = nff // (2 * sps) if delay is None else int(delay)
        if dly > 0:
            d = jnp.concatenate([jnp.zeros((dly,), d.dtype), d[..., :-dly]])
    xin = jnp.concatenate([state.tail, x.astype(CF32)], axis=-1)
    frames = make_eq_frames(xin, nff, sps)              # [B, Lf]
    db = (d.astype(CF32) if d is not None
          else jnp.zeros((frames.shape[0],), CF32))

    def step(st, inputs):
        ff, fb, past = st
        u, d_n = inputs
        y = jnp.sum(u * ff) - jnp.sum(past * fb)
        target = d_n if d is not None else psk_slicer(y, order, offset)
        e = target - y
        ff2 = ff + mu * e * jnp.conj(u)
        fb2 = fb - mu * e * jnp.conj(past)
        past2 = jnp.concatenate([target[None], past[:-1]])
        return (ff2.astype(CF32), fb2.astype(CF32), past2.astype(CF32)),             (y, jnp.abs(e) ** 2)

    (ff, fb, past), (ys, errs) = jax.lax.scan(
        step, (state.ff, state.fb, state.past), (frames, db))
    tail2 = xin[..., xin.shape[-1] - (nff - 1):]
    return DfeState(ff=ff, fb=fb, tail=tail2, past=past), ys, errs

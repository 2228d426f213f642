"""IIR filters as exact block state-space matmuls (beyond-parity component).

The reference family (BASELINE.json) lists only FIR filters; software-radio
users nonetheless reach for IIR constantly (DC blockers, notch filters,
channel-select biquads), and a per-sample recurrence

    y[n] = b0 x[n] + ... - a1 y[n-1] - a2 y[n-2] - ...

is the single most TPU-hostile loop in DSP: sequential, scalar, two words
of state. The TPU-native form used here removes the per-sample recurrence
EXACTLY (no impulse-response truncation):

- Convert (b, a) to controllable-canonical state space (A [p,p], B, C, D).
- For a block length L, the whole block's outputs are an affine function
  of the block's entry state s_k and the block's inputs x_k:

      y_k   = G s_k + H x_k          G [L,p]: rows C A^j
      s_k+1 = (A^L) s_k + F x_k      H [L,L]: lower-triangular Toeplitz of
                                       the exact impulse response h[0..L-1]
                                     F [p,L]: columns A^(L-1-i) B

  H/G/F are precomputed once in float64 on the host. The H matmul is a
  dense [*, L] @ [L, L] — MXU work — and carries ~L x the FLOPs of the
  scalar loop, which is the right trade on hardware whose matmul units are
  ~10^4 x faster than its scalar path.
- The surviving inter-block recurrence (K = N/L steps of a [p,p] matvec)
  runs as `lax.associative_scan` over affine pairs — log2(K) rounds of
  batched tiny matmuls instead of K sequential steps.

Numerics: matrices are built in float64 and applied in float32; for stable
filters (spectral radius of A < 1, enforced) the entries are bounded by the
impulse-response envelope. Streaming: state is carried across blocks like
every other T2 op; output matches the double-precision sequential twin to
> 80 dB (tests), with the usual float-reassociation caveat of fir_apply's
docstring for varying splits.

Cascaded biquads (scipy-style SOS) apply sections in sequence — each
section is its own block state-space filter, so the cascade stays exact.

On-chip note: uses only 2-D matmul/elementwise/slice ops plus
associative_scan; the axon restricted backend has no scan, so this op is
CPU/standard-TPU tier (like ops.fftconv's jnp tier).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IirParams:
    """Precomputed block state-space matrices for one section.

    A registered dataclass (not a NamedTuple) so block/order stay STATIC
    under jit — chains embed IirParams inside their own registered params
    and pass them straight through `jax.jit` boundaries."""

    al: jax.Array    # [p, p]  A^L
    f: jax.Array     # [p, L]  state injection: s+ = al @ s + f @ x_block
    g: jax.Array     # [L, p]  output from entry state
    h: jax.Array     # [L, L]  lower-triangular Toeplitz (exact impulse resp)
    block: int = dataclasses.field(metadata=dict(static=True))
    order: int = dataclasses.field(metadata=dict(static=True))


class IirState(NamedTuple):
    """Carried state vector (controllable-canonical coordinates)."""

    s: jax.Array     # [..., p] complex64


def _tf2ss(b: np.ndarray, a: np.ndarray) -> tuple[np.ndarray, ...]:
    """Controllable-canonical (A, B, C, D) in float64. a[0] must be != 0."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim != 1 or b.ndim != 1 or a.size < 2:
        raise ValueError("need 1-D b, a with len(a) >= 2")
    b = b / a[0]
    a = a / a[0]
    p = max(a.size, b.size) - 1
    a = np.concatenate([a, np.zeros(p + 1 - a.size)])
    b = np.concatenate([b, np.zeros(p + 1 - b.size)])
    A = np.zeros((p, p))
    A[0, :] = -a[1:]
    if p > 1:
        A[1:, :-1] = np.eye(p - 1)
    B = np.zeros(p)
    B[0] = 1.0
    C = b[1:] - b[0] * a[1:]
    D = b[0]
    return A, B, C, D


def make_iir_params(b: Sequence[float], a: Sequence[float],
                    block: int = 128) -> IirParams:
    """Build block state-space matrices for the filter b(z)/a(z).

    block is the inner block length L (a lane-tile multiple keeps the H
    matmul on clean MXU tiles). Raises for unstable filters.
    """
    A, B, C, D = _tf2ss(np.asarray(b), np.asarray(a))
    p = A.shape[0]
    if np.max(np.abs(np.linalg.eigvals(A))) >= 1.0 - 1e-12:
        raise ValueError("unstable filter: spectral radius of A >= 1")
    L = int(block)
    if L < 1:
        raise ValueError(f"block must be >= 1, got {L}")
    # powers A^0 .. A^L (float64)
    pw = np.empty((L + 1, p, p))
    pw[0] = np.eye(p)
    for j in range(1, L + 1):
        pw[j] = pw[j - 1] @ A
    F = np.stack([pw[L - 1 - i] @ B for i in range(L)], axis=1)   # [p, L]
    G = np.stack([C @ pw[j] for j in range(L)], axis=0)           # [L, p]
    h = np.empty(L)
    h[0] = D
    for j in range(1, L):
        h[j] = C @ pw[j - 1] @ B
    H = np.zeros((L, L))
    for i in range(L):
        H[i, : i + 1] = h[: i + 1][::-1]
    return IirParams(al=jnp.asarray(pw[L], F32), f=jnp.asarray(F, F32),
                     g=jnp.asarray(G, F32), h=jnp.asarray(H, F32),
                     block=L, order=p)


def iir_init(params: IirParams, channel_shape: tuple = (),
             dtype=CF32) -> IirState:
    """Zero state == filter at rest."""
    return IirState(s=jnp.zeros((*channel_shape, params.order), dtype=dtype))


def iir_apply(params: IirParams, state: IirState, x: jax.Array,
              precision=jax.lax.Precision.HIGHEST,
              inter_block: str = "assoc") -> tuple[IirState, jax.Array]:
    """Filter one block. x: [..., N] with N % params.block == 0.

    The inter-block affine recurrence s_{k+1} = al s_k + u_k runs as an
    associative scan over (M, v) pairs (inter_block="assoc", the
    log2(K)-round default) or as a plain `lax.scan` of K tiny matvecs
    (inter_block="scan" — the form the axon on-chip subset lowers, which
    supports lax.scan but not associative_scan; 2026-08-19 re-probe).
    Everything else is batched matmul either way; the two forms differ
    only in float association of the state path (~1 ulp).
    """
    L, p = params.block, params.order
    n = x.shape[-1]
    if n % L != 0:
        raise ValueError(f"block length {n} not divisible by L={L}")
    k = n // L
    lead = x.shape[:-1]
    xb = x.reshape(*lead, k, L)

    def mm(a_, b_):
        return jnp.matmul(a_, b_, precision=precision)

    # per-block state injections u [..., K, p] (real matrices on complex
    # data: promote explicitly so matmul dtypes agree)
    fT = params.f.T.astype(x.dtype)                      # [L, p]
    u = mm(xb, fT)
    al = params.al.astype(x.dtype)
    s0 = state.s.astype(x.dtype)
    if inter_block == "scan":
        # sequential over blocks: K steps of [..., p] @ [p, p] matvecs
        u_t = jnp.moveaxis(u, len(lead), 0)              # [K, ..., p]

        def step(s, u_k):
            s_next = mm(s, al.T) + u_k       # [..., p] @ [p, p]
            return s_next, s
        s_last, s_entry_t = jax.lax.scan(step, s0, u_t)
        s_entry = jnp.moveaxis(s_entry_t, 0, len(lead))  # [..., K, p]
        s_end_all = jnp.concatenate(
            [s_entry[..., 1:, :], s_last[..., None, :]], axis=-2)
    elif inter_block == "assoc":
        # associative scan of affine pairs (M_k = al, v_k = u_k):
        #   (M, v)_later ∘ (M, v)_earlier = (M_l M_e, M_l v_e + v_l)
        ms = jnp.broadcast_to(al, (*lead, k, p, p))
        def combine(e_early, e_late):
            m1, v1 = e_early
            m2, v2 = e_late
            return mm(m2, m1), jnp.squeeze(mm(m2, v1[..., None]), -1) + v2
        m_cum, v_cum = jax.lax.associative_scan(combine, (ms, u),
                                                axis=len(lead))
        # s at block ENTRY: s_e[0] = s0; s_e[k] = M_cum[k-1] s0 + v_cum[k-1]
        s_end_all = (jnp.squeeze(mm(m_cum, s0[..., None, :, None]), -1)
                     + v_cum)                            # [..., K, p]
        s_entry = jnp.concatenate(
            [s0[..., None, :], s_end_all[..., :-1, :]], axis=-2)
    else:
        raise ValueError(f"inter_block must be 'assoc' or 'scan', "
                         f"got {inter_block!r}")
    # outputs: y = G s_entry + H x  (both MXU matmuls)
    y = (mm(s_entry, params.g.T.astype(x.dtype))
         + mm(xb, params.h.T.astype(x.dtype)))           # [..., K, L]
    s_new = s_end_all[..., -1, :]
    return IirState(s=s_new.astype(state.s.dtype)), \
        y.reshape(*lead, n).astype(x.dtype)


def iir_full(params: IirParams, x: jax.Array,
             precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Whole-signal causal IIR from rest (one-shot convenience)."""
    st = iir_init(params, channel_shape=x.shape[:-1], dtype=x.dtype)
    _, y = iir_apply(params, st, x, precision=precision)
    return y


# ---------- cascaded biquads (scipy-style SOS) ----------

def make_sos_params(sos: np.ndarray, block: int = 128) -> tuple[IirParams, ...]:
    """Per-section params for a scipy-style [K, 6] SOS array."""
    sos = np.asarray(sos, np.float64)
    if sos.ndim != 2 or sos.shape[1] != 6:
        raise ValueError(f"sos must be [K, 6], got {sos.shape}")
    return tuple(make_iir_params(row[:3], row[3:], block=block)
                 for row in sos)


def sos_init(params: Sequence[IirParams], channel_shape: tuple = (),
             dtype=CF32) -> tuple[IirState, ...]:
    return tuple(iir_init(p, channel_shape, dtype) for p in params)


def sos_apply(params: Sequence[IirParams], states: Sequence[IirState],
              x: jax.Array, precision=jax.lax.Precision.HIGHEST
              ) -> tuple[tuple[IirState, ...], jax.Array]:
    """Apply a biquad cascade (sections in sequence, each exact)."""
    new_states = []
    y = x
    for p, st in zip(params, states):
        st2, y = iir_apply(p, st, y, precision=precision)
        new_states.append(st2)
    return tuple(new_states), y


# ---------- conveniences ----------

def dc_block_coeffs(alpha: float = 0.995) -> tuple[np.ndarray, np.ndarray]:
    """First-order DC blocker: H(z) = (1 - z^-1) / (1 - alpha z^-1)."""
    return np.array([1.0, -1.0]), np.array([1.0, -float(alpha)])


def np_iir_full(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Sequential double-precision direct-form-II-transposed twin (tests)."""
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    b = b / a[0]
    a = a / a[0]
    p = max(a.size, b.size) - 1
    b = np.concatenate([b, np.zeros(p + 1 - b.size)])
    a = np.concatenate([a, np.zeros(p + 1 - a.size)])
    y = np.zeros(x.shape, np.complex128)
    z = np.zeros(x.shape[:-1] + (p,), np.complex128)
    for n in range(x.shape[-1]):
        xn = x[..., n]
        yn = b[0] * xn + z[..., 0]
        for j in range(p - 1):
            z[..., j] = b[j + 1] * xn + z[..., j + 1] - a[j + 1] * yn
        z[..., p - 1] = b[p] * xn - a[p] * yn
        y[..., n] = yn
    return y.astype(x.dtype)

"""Digital predistortion (DPD) — transmit PA linearization (beyond parity).

The reference family (BASELINE.json scope) stops at clean-IQ modulation;
a production transmit chain drives a power amplifier whose AM/AM, AM/PM
compression and memory effects destroy EVM and spray adjacent-channel
power. The industry-standard fix is a baseband *memory polynomial*
predistorter identified by *indirect learning* (ILA) — and both halves of
that algorithm are natively MXU-shaped:

- **Apply** is ONE matmul: build the basis matrix
  ``B[n, (k,m)] = x[n-m] * |x[n-m]|^(k-1)`` (odd orders k, memory depth M)
  and the predistorted signal is ``B @ c``. On TPU that is an [N, K*M]
  by [K*M] matmul — the whole nonlinearity rides the MXU, no per-sample
  loop (the classic implementation is exactly the per-sample C++ loop
  this framework replaces everywhere else).
- **Identification** is one least-squares solve on the SAME basis:
  ILA fits a postdistorter from the PA output (scaled by the target
  gain) back to the PA input, then copies it in front. The Gram matrix
  ``B^H B`` is one MXU matmul; the small [KM, KM] solve runs on the
  host/standard tier like the MVDR/MIMO solves.

Streaming follows the framework's T2 contract: the carried state is the
M-1 sample history, so block-wise application is bit-identical to the
one-shot run under any split.

Also here: ``pa_saleh`` (the classic memoryless Saleh AM/AM + AM/PM TWT
model) and ``pa_memory_polynomial`` (a mildly nonlinear PA with memory)
as test/demo fixtures — the same basis machinery evaluates the PA model.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import CF32

__all__ = [
    "mp_basis", "mp_num_coeffs", "pa_saleh", "pa_memory_polynomial",
    "DpdParams", "DpdState", "make_dpd_params", "dpd_init", "dpd_apply",
    "dpd_full", "dpd_identify_ila", "dpd_train_ila", "lin_gain_ls",
]


def _check_order_memory(order: int, memory: int) -> tuple[int, int]:
    if order < 1 or order % 2 == 0:
        raise ValueError(f"order must be odd and >= 1, got {order}")
    if memory < 1:
        raise ValueError(f"memory must be >= 1, got {memory}")
    return order, memory


def mp_num_coeffs(order: int, memory: int) -> int:
    """Number of memory-polynomial coefficients: (order+1)//2 * memory."""
    order, memory = _check_order_memory(order, memory)
    return ((order + 1) // 2) * memory


def mp_basis(x: jax.Array, order: int, memory: int,
             history: jax.Array | None = None) -> jnp.ndarray:
    """Memory-polynomial basis matrix for one block.

    x: [..., N] complex. history: [..., memory-1] complex samples
    preceding the block (zeros from rest when None). Returns
    [..., N, C] with C = mp_num_coeffs(order, memory); column (k, m)
    (k-major over odd orders 1, 3, ..., order; m = 0..memory-1) is
    x[n-m] * |x[n-m]|^(k-1). Trace-time loops only — K*M is small and
    static, so XLA sees one fused stack feeding one matmul.
    """
    order, memory = _check_order_memory(order, memory)
    x = jnp.asarray(x, CF32)
    if history is None:
        history = jnp.zeros(x.shape[:-1] + (memory - 1,), CF32)
    xh = jnp.concatenate([jnp.asarray(history, CF32), x], axis=-1)
    n = x.shape[-1]
    cols = []
    for m in range(memory):
        xd = jax.lax.slice_in_dim(xh, memory - 1 - m, memory - 1 - m + n,
                                  axis=-1)
        mag2 = (jnp.real(xd) ** 2 + jnp.imag(xd) ** 2)
        env = jnp.ones_like(mag2)
        for k in range(1, order + 1, 2):
            cols.append(xd * env.astype(CF32))
            env = env * mag2
    # k-major ordering: regroup the m-major build above.
    num_k = (order + 1) // 2
    cols = [cols[m * num_k + ki] for ki in range(num_k)
            for m in range(memory)]
    return jnp.stack(cols, axis=-1)


# ---------- PA fixture models ----------

def pa_saleh(x: jax.Array, alpha_a: float = 2.1587, beta_a: float = 1.1517,
             alpha_p: float = 4.0033, beta_p: float = 9.1040) -> jnp.ndarray:
    """Saleh memoryless TWT model: AM/AM r -> a_a r/(1+b_a r^2), AM/PM
    phase shift a_p r^2/(1+b_p r^2). Defaults are Saleh's published fit."""
    r2 = (jnp.real(x) ** 2 + jnp.imag(x) ** 2)
    gain = alpha_a / (1.0 + beta_a * r2)
    phi = alpha_p * r2 / (1.0 + beta_p * r2)
    return (x * gain * jnp.exp(1j * phi.astype(jnp.float32))).astype(CF32)


def pa_memory_polynomial(coeffs: jax.Array, order: int, memory: int,
                         x: jax.Array) -> jnp.ndarray:
    """Evaluate a memory-polynomial PA (from rest): basis @ coeffs."""
    b = mp_basis(x, order, memory)
    return jnp.einsum("...nc,c->...n", b, jnp.asarray(coeffs, CF32))


# ---------- predistorter op (T2 streaming contract) ----------

class DpdParams(NamedTuple):
    order: int           # static: max odd order
    memory: int          # static: memory depth (taps)
    coeffs: jax.Array    # [C] complex, C = mp_num_coeffs(order, memory)


class DpdState(NamedTuple):
    history: jax.Array   # [..., memory-1] complex carried input tail


def make_dpd_params(order: int, memory: int,
                    coeffs: jax.Array | None = None) -> DpdParams:
    """Identity predistorter unless coeffs given (c[0] = 1 passes x[n])."""
    c_n = mp_num_coeffs(order, memory)
    if coeffs is None:
        coeffs = jnp.zeros(c_n, CF32).at[0].set(1.0)
    coeffs = jnp.asarray(coeffs, CF32)
    if coeffs.shape != (c_n,):
        raise ValueError(f"coeffs must be [{c_n}], got {coeffs.shape}")
    return DpdParams(order=order, memory=memory, coeffs=coeffs)


def dpd_init(params: DpdParams, channel_shape: tuple = ()) -> DpdState:
    return DpdState(history=jnp.zeros(channel_shape + (params.memory - 1,),
                                      CF32))


def dpd_apply(params: DpdParams, state: DpdState, x: jax.Array
              ) -> tuple[DpdState, jnp.ndarray]:
    """Predistort one block. x: [..., N], N >= memory-1 for the carried
    tail to be well-defined; output matches the one-shot run bit-exactly
    under any block split."""
    x = jnp.asarray(x, CF32)
    b = mp_basis(x, params.order, params.memory, history=state.history)
    y = jnp.einsum("...nc,c->...n", b, params.coeffs)
    m = params.memory - 1
    if m:
        xh = jnp.concatenate([state.history, x], axis=-1)
        hist = jax.lax.slice_in_dim(xh, xh.shape[-1] - m, xh.shape[-1],
                                    axis=-1)
    else:
        hist = state.history
    return DpdState(history=hist), y


def dpd_full(params: DpdParams, x: jax.Array) -> jnp.ndarray:
    """Whole-signal convenience (from rest)."""
    _, y = dpd_apply(params, dpd_init(params, jnp.shape(x)[:-1]), x)
    return y


# ---------- identification (host/standard tier, like MIMO/MVDR solves) ----------

def lin_gain_ls(x: jax.Array, y: jax.Array) -> jnp.ndarray:
    """Complex LS scalar g minimizing ||y - g x||^2 (the PA's linear
    gain when y = PA(x) and the drive is mostly in the linear region)."""
    x = jnp.asarray(x, CF32).reshape(-1)
    y = jnp.asarray(y, CF32).reshape(-1)
    return jnp.vdot(x, y) / jnp.maximum(jnp.real(jnp.vdot(x, x)), 1e-30)


def dpd_identify_ila(pa_in: jax.Array, pa_out: jax.Array, order: int,
                     memory: int, gain: complex | jax.Array,
                     ridge: float = 1e-9) -> jnp.ndarray:
    """One indirect-learning fit: regress the postdistorter
    mp(pa_out/gain) -> pa_in by regularized normal equations. The Gram
    matrix B^H B is one MXU matmul; the [C, C] solve is host-tier.
    Returns [C] coefficients for the predistorter."""
    z = jnp.asarray(pa_in, CF32).reshape(-1)
    b = mp_basis(jnp.asarray(pa_out, CF32).reshape(-1) / gain, order, memory)
    gram = b.conj().T @ b
    rhs = b.conj().T @ z
    eye = jnp.eye(gram.shape[0], dtype=gram.dtype)
    scale = jnp.maximum(jnp.real(jnp.trace(gram)) / gram.shape[0], 1e-30)
    return jnp.linalg.solve(gram + (ridge * scale) * eye, rhs)


def dpd_train_ila(pa_fn: Callable[[jax.Array], jax.Array], x: jax.Array,
                  order: int, memory: int, iters: int = 2,
                  gain: complex | jax.Array | None = None
                  ) -> tuple[DpdParams, jnp.ndarray]:
    """Iterate ILA against a PA (model or measurement callback): start
    from the identity predistorter, alternate {drive PA, refit
    postdistorter, copy in front}. Returns (params, linear gain used).

    gain=None estimates the target linear gain from the first (identity)
    drive by LS — callers with a spec gain should pass it explicitly.
    """
    params = make_dpd_params(order, memory)
    g = None if gain is None else jnp.asarray(gain, CF32)
    for _ in range(max(1, int(iters))):
        z = dpd_full(params, x)
        y = pa_fn(z)
        if g is None:
            g = lin_gain_ls(z, y)
        c = dpd_identify_ila(z, y, order, memory, g)
        params = params._replace(coeffs=jnp.asarray(c, CF32))
    return params, g

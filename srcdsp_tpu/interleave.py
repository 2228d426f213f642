"""Interleavers: block, convolutional (Forney), and fixed-permutation
(beyond-parity component — pairs with the fec.py coding layer).

Interleaving scatters channel burst errors so a convolutional/block
decoder sees them as isolated symbol errors it can correct. Forms:

- **Block interleaver**: write an R x C frame by rows, read by columns —
  one reshape + transpose, zero arithmetic. Frame-oriented (operates on
  whole R*C-symbol frames).
- **Convolutional interleaver** (Forney / Ramsey type II, the
  DVB/CD-player standard): B branches, branch i delaying i*M symbols,
  fed round-robin. TPU-native form: a block of N symbols (N % B == 0)
  reshapes to [N/B, B] branch columns; each branch's delay line is a
  CARRIED i*M-symbol buffer (per-branch static shapes, so the B-way
  Python loop unrolls at trace time into pure concat/slice — no gather,
  no scan). The deinterleaver mirrors with delays (B-1-i)*M and the
  cascade restores the stream after the canonical (B-1)*M*B total delay
  — bit-exact, tested.
- **Fixed permutation** (turbo-style): one `take` per frame with a
  precomputed pseudo-random permutation; inverse by argsort.

All forms are dtype-agnostic (bits, soft LLRs, complex symbols).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "block_interleave", "block_deinterleave",
    "ConvInterleaverState", "conv_interleave_init", "conv_interleave",
    "conv_deinterleave_init", "conv_deinterleave", "conv_total_delay",
    "random_permutation", "permute", "depermute",
]


# ---------- block ----------

def block_interleave(x: jax.Array, rows: int, cols: int) -> jax.Array:
    """[..., K*rows*cols] -> same shape, each frame written by rows and
    read by columns."""
    n = x.shape[-1]
    if n % (rows * cols) != 0:
        raise ValueError(f"length {n} not a multiple of {rows}x{cols}")
    lead = x.shape[:-1]
    f = x.reshape(*lead, n // (rows * cols), rows, cols)
    return jnp.swapaxes(f, -1, -2).reshape(*lead, n)


def block_deinterleave(x: jax.Array, rows: int, cols: int) -> jax.Array:
    return block_interleave(x, cols, rows)


# ---------- convolutional (Forney) ----------

class ConvInterleaverState(NamedTuple):
    """Per-branch delay lines; branch i holds delay_i symbols where
    delay_i = i*M (interleaver) or (B-1-i)*M (deinterleaver). Stored as a
    tuple of [..., delay_i] arrays (static per-branch shapes)."""

    lines: tuple


def _conv_init(delays: Sequence[int], channel_shape: tuple, dtype
               ) -> ConvInterleaverState:
    return ConvInterleaverState(lines=tuple(
        jnp.zeros((*channel_shape, d), dtype) for d in delays))


def conv_interleave_init(branches: int, depth: int,
                         channel_shape: tuple = (),
                         dtype=jnp.float32) -> ConvInterleaverState:
    return _conv_init([i * depth for i in range(branches)],
                      channel_shape, dtype)


def conv_deinterleave_init(branches: int, depth: int,
                           channel_shape: tuple = (),
                           dtype=jnp.float32) -> ConvInterleaverState:
    return _conv_init([(branches - 1 - i) * depth for i in range(branches)],
                      channel_shape, dtype)


def _conv_apply(state: ConvInterleaverState, x: jax.Array, branches: int
                ) -> tuple[ConvInterleaverState, jax.Array]:
    n = x.shape[-1]
    if n % branches != 0:
        raise ValueError(f"block length {n} not divisible by {branches}")
    lead = x.shape[:-1]
    cols = x.reshape(*lead, n // branches, branches)    # round-robin
    outs, new_lines = [], []
    for i, line in enumerate(state.lines):
        full = jnp.concatenate([line, cols[..., i]], axis=-1)
        outs.append(full[..., : n // branches])
        new_lines.append(full[..., n // branches:])
    y = jnp.stack(outs, axis=-1).reshape(*lead, n)
    return ConvInterleaverState(lines=tuple(new_lines)), y


def conv_interleave(state: ConvInterleaverState, x: jax.Array
                    ) -> tuple[ConvInterleaverState, jax.Array]:
    """One block through the interleaver. x: [..., N], N % B == 0."""
    return _conv_apply(state, x, len(state.lines))


def conv_deinterleave(state: ConvInterleaverState, x: jax.Array
                      ) -> tuple[ConvInterleaverState, jax.Array]:
    return _conv_apply(state, x, len(state.lines))


def conv_total_delay(branches: int, depth: int) -> int:
    """End-to-end latency of interleave -> deinterleave, in symbols."""
    return branches * (branches - 1) * depth


# ---------- fixed permutation ----------

def random_permutation(n: int, seed: int = 0) -> np.ndarray:
    """Host-side pseudo-random frame permutation (deterministic)."""
    return np.random.default_rng(seed).permutation(n)


def permute(x: jax.Array, perm: np.ndarray) -> jax.Array:
    """[..., K*len(perm)] frame-wise permutation."""
    n = x.shape[-1]
    p = len(perm)
    if n % p != 0:
        raise ValueError(f"length {n} not a multiple of frame {p}")
    lead = x.shape[:-1]
    f = x.reshape(*lead, n // p, p)
    return jnp.take(f, jnp.asarray(perm), axis=-1).reshape(*lead, n)


def depermute(x: jax.Array, perm: np.ndarray) -> jax.Array:
    inv = np.argsort(np.asarray(perm))
    return permute(x, inv)

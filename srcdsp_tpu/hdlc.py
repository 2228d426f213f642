"""HDLC-style framing: bit stuffing, flag detection (beyond parity —
the packet layer between the demod chains and gf2.py's CRC).

TPU-native forms (no per-bit scans):

- **Run lengths without a scan**: the length of the current run of 1s at
  position i is i - last_zero_index(i), and last_zero_index is a
  `jnp.maximum.accumulate` (cummax) over i * (b == 0) — the same
  cumulative trick as the CIC integrators.
- **Stuff/destuff are ragged**: inserting/deleting bits changes the
  length, so both return the framework's static-capacity ragged pattern
  (values + validity mask, cf. chains/tracking.py's skip/stuff Gardner);
  compact on the host at the sink with `compact_bits`.
- **Flag detection** (01111110) is an exact-match correlation: one
  length-8 FIR over +-1 bits peaking at 8 — positions fall out of a
  compare, no searching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import F32

__all__ = ["FLAG", "stuff_bits", "destuff_bits", "find_flags",
           "compact_bits"]

FLAG = np.asarray([0, 1, 1, 1, 1, 1, 1, 0], np.int32)


def _ones_run(b: jax.Array, run0: int | jax.Array = 0) -> jnp.ndarray:
    """run[i] = number of consecutive 1s ENDING at position i; `run0` is
    the run carried in from the previous block (streaming)."""
    i = jnp.arange(b.shape[-1])
    seed = -(jnp.asarray(run0, i.dtype) + 1)   # virtual last zero index
    last_zero = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(b == 0, i, seed))
    return i - last_zero


def stuff_bits(bits: jax.Array, run0: int | jax.Array = 0
               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Insert a 0 after every run of five 1s. bits: [N] {0,1}.

    Returns (out [ceil(6N/5)] int32, valid [same] bool, run_out): the
    stuffed stream occupies the valid positions in order (static
    capacity — compact with `compact_bits`). For BLOCK STREAMING pass the
    previous call's run_out as `run0` — a run of 1s straddling the block
    boundary is then stuffed correctly (one-shot calls just ignore it).
    NOTE run semantics: a stuffed zero resets the receiver's count, so
    run_out is the run length AFTER the final (possibly stuffed) bit."""
    b = bits.astype(jnp.int32)
    n = b.shape[-1]
    run = _ones_run(b, run0)
    # a stuffed 0 goes AFTER position i whenever run at i hits a multiple
    # of 5 (5, 10, ... — re-stuff after each five, matching the receiver)
    ins = (run > 0) & (jnp.mod(run, 5) == 0)
    # output position of input bit i = i + (# insertions before i)
    ins_before = jnp.cumsum(ins.astype(jnp.int32)) - ins.astype(jnp.int32)
    pos = jnp.arange(n) + ins_before
    cap = n + (n + 4) // 5
    # scatter into cap+1 slots: non-insertions write a dummy tail slot,
    # truncated away (keeps every .at[] index in range and collision-free)
    out = jnp.zeros((cap + 1,), jnp.int32)
    valid = jnp.zeros((cap + 1,), bool)
    out = out.at[pos].set(b)
    valid = valid.at[pos].set(True)
    zidx = jnp.where(ins, pos + 1, cap)    # stuffed zeros after the run
    valid = valid.at[zidx].set(ins)
    # carried run: 0 if the block ended on a 0 or a stuffed 0, else the
    # final run modulo the 5-reset
    run_out = jnp.where(b[n - 1] == 0, 0, jnp.mod(run[n - 1], 5))
    return out[:cap], valid[:cap], run_out


def destuff_bits(bits: jax.Array, run0: int | jax.Array = 0
                 ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Delete every 0 that follows exactly five 1s. bits: [N] {0,1}.
    Returns (out [N] int32, valid [N] bool, run_out) — ragged, compact at
    the sink; thread run_out -> run0 across streamed blocks."""
    b = bits.astype(jnp.int32)
    run = _ones_run(b, run0)
    prev_run = jnp.concatenate(
        [jnp.asarray(run0, run.dtype)[None], run[:-1]])
    stuffed = (b == 0) & (jnp.mod(prev_run, 5) == 0) & (prev_run > 0)
    run_out = jnp.where(b[-1] == 0, 0, run[-1])
    return b, ~stuffed, run_out


def find_flags(bits: jax.Array) -> jnp.ndarray:
    """Boolean mask: True where an HDLC flag 01111110 STARTS. Exact-match
    correlation of +-1 bits against the +-1 flag (peak == 8)."""
    pm = (2.0 * bits.astype(F32) - 1.0)
    fl = jnp.asarray(2.0 * FLAG.astype(np.float32) - 1.0)
    n = bits.shape[-1]
    if n < 8:
        return jnp.zeros((n,), bool)
    windows = jnp.stack([pm[k: n - 7 + k] for k in range(8)], axis=-1)
    score = windows @ fl
    hits = score == 8.0
    return jnp.concatenate([hits, jnp.zeros((7,), bool)])


def compact_bits(vals, valid) -> np.ndarray:
    """Host sink: squeeze the ragged (vals, valid) stream."""
    return np.asarray(vals)[np.asarray(valid)]

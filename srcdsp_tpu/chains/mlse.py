"""MLSE equalizer: Viterbi sequence detection over a known ISI channel
(beyond parity; the optimal-detection counterpart of the linear
equalizers in chains/equalizer.py and chains/scfde.py).

A channel with a deep in-band null destroys linear equalizers (ZF blows
up the noise, MMSE trades it for residual ISI); maximum-likelihood
sequence estimation works the trellis of the channel's memory instead:
state = the last L-1 symbols, branch metric |y_n - sum_l h_l s_{n-l}|^2.

TPU decomposition (the fec.py Viterbi pattern at symbol alphabet M):

- All M^L expected channel outputs are a host-built table; per step the
  branch metrics for EVERY (state, input) edge are one [S*M] broadcast
  |y_n - e|^2 (no MXU needed — the table is the precomputation).
- Add-compare-select over the [S] path-metric vector under `lax.scan`
  (radix-M selects via reshape + min), decisions stored as [N, S] int.
- Traceback is a reverse scan over the stored decisions.

Use `h` from a pilot estimate (metrics.xcorr against a preamble, or the
SC-FDE LS estimate IFFT'd and truncated).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.demap import psk_points
from srcdsp_tpu.types import CF32, F32

__all__ = ["MlseTrellis", "make_mlse", "mlse_equalize"]

I32 = jnp.int32


class MlseTrellis(NamedTuple):
    points: np.ndarray     # [M] constellation
    h: np.ndarray          # [L] channel
    expected: np.ndarray   # [S, M] complex: channel output for (state, m)
    order: int
    mem: int               # L-1 symbols of memory


def make_mlse(h, order: int = 2, points=None) -> MlseTrellis:
    """Build the trellis for channel taps h [L] (h[0] = current symbol)
    and an M-point constellation (default M-PSK with the chains.psk
    convention; pass `points` for QAM etc.)."""
    h = np.asarray(h, np.complex128)
    l = h.size
    if points is not None:
        pts = np.asarray(points, np.complex128)
        m = pts.size                    # the constellation defines M
    else:
        m = int(order)
        pts = np.asarray(psk_points(m), np.complex128)
    mem = l - 1
    s_count = m ** mem
    # state s encodes symbols (s_1..s_mem), newest first, base-M digits
    # (most significant digit = newest symbol)
    expected = np.zeros((s_count, m), np.complex128)
    for s in range(s_count):
        digs = [(s // m ** (mem - 1 - i)) % m for i in range(mem)]
        past = sum(h[1 + i] * pts[digs[i]] for i in range(mem))
        for u in range(m):
            expected[s, u] = h[0] * pts[u] + past
    # next(s, u) = u*M^(mem-1) + s // M (drop the oldest digit); the
    # traceback recomputes predecessors with the same arithmetic, so no
    # table is stored
    return MlseTrellis(points=pts.astype(np.complex64),
                       h=h.astype(np.complex64),
                       expected=expected.astype(np.complex64),
                       order=m, mem=mem)


def mlse_equalize(tr: MlseTrellis, y: jax.Array) -> jnp.ndarray:
    """Detect the ML symbol sequence. y: [N] symbol-rate channel output
    (synchronized). Returns [N] int32 constellation indices (delayed by
    `tr.mem` symbols of decision depth at the tail: the final state is
    read out, so the last `mem` symbols come from the survivor state).
    """
    m, mem = tr.order, tr.mem
    if mem == 0:                         # flat channel: nearest point
        d2 = jnp.abs(y[..., None] - jnp.asarray(tr.points)
                     * jnp.asarray(tr.h[0])) ** 2
        return jnp.argmin(d2, axis=-1).astype(I32)
    s_count = m ** mem
    exp = jnp.asarray(tr.expected).reshape(-1)          # [S*M]
    pm0 = jnp.zeros((s_count,), F32)

    def step(pm, y_n):
        bm = jnp.abs(y_n - exp) ** 2                    # [S*M]
        cand = pm[:, None] + bm.reshape(s_count, m)     # [S, M] from (s, u)
        # edges (s, u) land on s' = u*M^(mem-1) + s//M; group candidates
        # by destination: for fixed u, the M states s with the same s//M
        # compete. Reshape [S, M] with s = d*M + r: s//M = d
        c = cand.reshape(-1, m, m)                      # [d, r, u]
        best_r = jnp.argmin(c, axis=1)                  # [d, u]
        val = jnp.min(c, axis=1)                        # [d, u]
        # destination s' = u*M^(mem-1) + d
        pm2 = val.T.reshape(-1)                         # [u*D + d] = s'
        dec = best_r.T.reshape(-1).astype(I32)          # dropped digit r
        pm2 = pm2 - jnp.max(pm2)
        return pm2, dec

    pm, decs = jax.lax.scan(step, pm0, y.astype(CF32))  # decs: [N, S]

    # traceback from the best final state; state digits give the final
    # mem symbols, decisions give the rest
    s_end = jnp.argmin(pm).astype(I32)

    def back(s, dec_n):
        r = dec_n[s]                                    # dropped digit
        d = jnp.mod(s, m ** max(mem - 1, 0)) if mem > 1 else jnp.int32(0)
        s_prev = (d * m + r).astype(I32)
        # the symbol EMITTED at this step is s' newest digit
        u = (s // (m ** (mem - 1))).astype(I32)
        return s_prev, u

    _, us = jax.lax.scan(back, s_end, decs, reverse=True)
    return us.astype(I32)

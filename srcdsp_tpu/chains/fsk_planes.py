"""On-chip FSK demod pipeline in plane form (BASELINE north-star chain).

The complex-dtype chain (chains.fsk) is the portable API; this module is
the same demodulator expressed in the restricted on-chip op set (2-D/3-D
f32 elementwise, matmul, reduce, atan2 — no complex dtype, gather, or scan)
so the ENTIRE config-4 workload runs on the chip:

    planes -> [Pallas fused mix+FIR+decim] -> discriminator -> O&M timing
           -> nearest-offset symbol pick -> bits

Differences vs chains.fsk, both intentional:
- symbol pick is nearest-integer offset (a one-hot reduce over the sps
  axis) instead of linear interpolation — gather-free, and for FSK's
  rectangular-ish frequency pulses the BER difference is nil;
- the timing tone weights are host-precomputed constants (no traced iota
  at the low rate).

Outputs bits aligned like chains.fsk up to the interpolation delta; the
cross-check test demodulates the same capture both ways.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.mixfir import MixFirKernel, mix_fir_decim_pallas_mc
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.types import F32


def discriminate_planes(yr: jax.Array, yi: jax.Array,
                        pr: jax.Array, pi: jax.Array
                        ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Instantaneous frequency from baseband planes.

    yr/yi: [C, K]; pr/pi: [C, 1] previous block's last sample (zeros at
    start). Returns (d [C, K] cycles/sample, new pr, new pi).
    """
    sr = jnp.concatenate([pr, yr[:, :-1]], axis=1)
    si = jnp.concatenate([pi, yi[:, :-1]], axis=1)
    zr = yr * sr + yi * si          # y[n] * conj(y[n-1])
    zi = yi * sr - yr * si
    d = jnp.arctan2(zi, zr) * F32(1.0 / TWO_PI)
    return d, yr[:, -1:], yi[:, -1:]


def make_timing_tone(k: int, sps: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side O&M tone weights cos/sin(-2*pi*n/sps), shape [1, K]."""
    n = np.arange(k)
    ang = -2.0 * np.pi * (n % sps) / sps
    return (np.cos(ang)[None].astype(np.float32),
            np.sin(ang)[None].astype(np.float32))


def om_timing_planes(metric: jax.Array, tone_cos: jax.Array,
                     tone_sin: jax.Array, acc_r: jax.Array, acc_i: jax.Array,
                     sps: int, forget: float = 0.5
                     ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """O&M estimate on planes. metric [C, K] -> (tau [C,1], acc_r, acc_i)."""
    cr = jnp.sum(metric * tone_cos, axis=-1, keepdims=True)
    ci = jnp.sum(metric * tone_sin, axis=-1, keepdims=True)
    acc_r = F32(forget) * acc_r + cr
    acc_i = F32(forget) * acc_i + ci
    tau = jnp.mod(-F32(sps / TWO_PI) * jnp.arctan2(acc_i, acc_r), F32(sps))
    return tau, acc_r, acc_i


def pick_symbols(d: jax.Array, tau: jax.Array, sps: int) -> jax.Array:
    """Nearest-offset symbol pick: one-hot reduce over the sps axis.

    d: [C, K] with K % sps == 0; tau: [C, 1] in [0, sps).
    Returns soft symbols [C, K/sps].
    """
    c, k = d.shape
    d3 = d.reshape(c, k // sps, sps)
    off = jnp.mod(jnp.round(tau), F32(sps))                    # [C, 1]
    cols = jnp.asarray(np.arange(sps, dtype=np.float32))[None, None, :]
    onehot = (cols == off[:, :, None]).astype(F32)             # [C, 1, sps]
    return jnp.sum(d3 * onehot, axis=-1)


class FskPlanesStream:
    """Streaming driver for the on-chip chain: manages the kernel history
    prefix, per-chunk NCO start words, and the demod accumulators, so
    callers feed raw [C, 2, N] plane chunks (N a multiple of
    kernel.block_in()) and receive bits. Chunked output is bit-identical
    to one-shot (u32 phase carry + exact history splice)."""

    def __init__(self, kernel: MixFirKernel, dwords, sps: int, tone_cos,
                 tone_sin, num_channels: int):
        self.kernel = kernel
        self.dwords = np.asarray(dwords, np.uint64)
        self.sps = sps
        self.tone_cos = tone_cos
        self.tone_sin = tone_sin
        # phase word of the NEXT history prefix's first sample; start so the
        # first real sample carries phase 0 (one-shot convention)
        self.words0 = np.asarray(
            [(-int(kernel.hist) * int(d)) % (1 << 32) for d in self.dwords],
            np.uint64)
        self.hist = jnp.zeros((num_channels, 2, kernel.hist), jnp.float32)
        self.state = None

    def process(self, x_chunk: jax.Array):
        """x_chunk: [C, 2, N] raw planes -> (bits, soft) for this chunk."""
        xin = jnp.concatenate([self.hist, x_chunk], axis=-1)
        w0 = (self.words0 % (1 << 32)).astype(np.uint32)
        dw = (self.dwords % (1 << 32)).astype(np.uint32)
        self.state, out = fsk_demod_planes(
            self.kernel, w0, dw, xin, self.sps, self.tone_cos, self.tone_sin,
            state=self.state)
        n = x_chunk.shape[-1]
        self.words0 = (self.words0 + n * self.dwords) % (1 << 32)
        self.hist = xin[..., xin.shape[-1] - self.kernel.hist:]
        return out


def fsk_demod_planes(kernel: MixFirKernel, words0, dwords, x_planes,
                     sps: int, tone_cos, tone_sin,
                     state=None):
    """Full on-chip FSK demod. x_planes: [C, 2, HK+N] -> bits [C, Nsym].

    state: (pr, pi, acc_r, acc_i) or None for stream start. Returns
    (new_state, (bits int32 [C, Nsym], soft f32 [C, Nsym])).
    """
    cch = x_planes.shape[0]
    if state is None:
        z = jnp.zeros((cch, 1), F32)
        state = (z, z, z, z)
    pr, pi, acc_r, acc_i = state
    yr, yi = mix_fir_decim_pallas_mc(kernel, words0, dwords, x_planes)
    d, pr, pi = discriminate_planes(yr, yi, pr, pi)
    tau, acc_r, acc_i = om_timing_planes(d * d, tone_cos, tone_sin,
                                         acc_r, acc_i, sps)
    soft = pick_symbols(d, tau, sps)
    bits = (soft > 0).astype(jnp.int32)
    return (pr, pi, acc_r, acc_i), (bits, soft)
